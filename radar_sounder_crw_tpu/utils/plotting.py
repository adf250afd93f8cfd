"""Plotting: paper colormaps, prediction maps, xent heatmaps, loss curves.

Colormaps follow the reference's Experiments-section conventions per dataset
(reference: src/utils.py:178-221). All functions are host-side matplotlib
with the Agg backend (no display needed).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import ListedColormap

_COLORS = {
    0: [(0, 0, 0), (0.33, 0.33, 0.33), (1, 0, 0), (1, 1, 1)],
    1: [
        (0, 0, 0, 1),  # black: free space
        (1, 1, 1, 1),  # white: noise
        (1, 0, 0, 1),  # red: bedrock
        (0.33, 0.33, 0.33, 1),  # dark gray: inland ice
        (0.66, 0.66, 0.66, 1),  # light gray: floating ice
        # amber: 'uncertain' (label 5). The reference's 5-color map renders
        # uncertain identically to floating ice (src/utils.py:185-192 with
        # vmax=4 clamping) — intended-behavior fix, deviation documented.
        (1.0, 0.75, 0.0, 1),
    ],
    3: [
        (0, 0, 0, 1),
        (0.33, 0.33, 0.33, 1),
        (1, 0, 0, 1),
        (1, 1, 1, 1),
        (0.66, 0.66, 0.66, 1),
    ],
}


def dataset_cmap(dataset: int) -> ListedColormap:
    return ListedColormap(_COLORS.get(dataset, _COLORS[0]))


def plot_segmentation(
    img, save=None, seg=None, dataset: int = 0, aspect: float = 1.0
):
    """Prediction map, optionally stacked over the ground truth
    (reference: src/utils.py:178-221). vmax tracks the colormap length so
    every label gets its own color (the reference's fixed vmax=4 renders
    MCORDS3's 'uncertain' label 5 identically to floating ice; same pixel
    colors for every in-range label either way)."""
    cmap = dataset_cmap(dataset)
    vmax = cmap.N - 1
    if seg is None:
        plt.imshow(np.asarray(img), interpolation="nearest", cmap=cmap, vmin=0, vmax=vmax)
        plt.gca().set_aspect(aspect)
        plt.tight_layout()
    else:
        plt.figure(figsize=(13, 13))
        fs = 12
        plt.subplot(211)
        plt.imshow(np.asarray(img), interpolation="nearest", cmap=cmap, vmin=0, vmax=vmax)
        plt.xlabel("Trace", fontsize=fs)
        plt.subplot(212)
        plt.imshow(np.asarray(seg), interpolation="nearest", cmap=cmap, vmin=0, vmax=vmax)
        plt.ylabel("Time [μs]", fontsize=fs)
        plt.xlabel("Trace", fontsize=fs)
        plt.tight_layout()
    if save is not None:
        plt.savefig(save)
    plt.close()


def plot_xent_heatmap(xent, save, aspect_scale: float = 0.77, colorbar: bool = False):
    """Horizontality-metric heatmap (reference: scripts/test/test_mc1.py:102-105)."""
    x = np.asarray(xent)
    plt.imshow(x, interpolation="nearest", cmap="gray")
    plt.gca().set_aspect(x.shape[1] / x.shape[0] * aspect_scale)
    if colorbar:
        plt.colorbar()
    plt.savefig(save)
    plt.close()


def plot_loss_curve(losses, save):
    """Training loss curve (reference: scripts/train.py:89-91)."""
    plt.plot(list(losses))
    plt.savefig(save)
    plt.close()

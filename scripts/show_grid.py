"""Visualize one windowed patch grid — the smoke/demo of the data layer
(capability match of the reference dataset module's __main__ block,
reference: src/dataset.py:49-64)."""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import normalize_pair


def main(args):
    from radar_sounder_crw_tpu.data import create_dataset

    ds = create_dataset(
        id=args.dataset, length=args.seq_length,
        dim=normalize_pair(args.patch_size),
        overlap=normalize_pair(args.overlap), full=True,
    )
    images = ds[args.index]
    T, N, h, w = images.shape
    fig, axes = plt.subplots(N, T, figsize=(13, 13), squeeze=False)
    for t in range(T):
        for n in range(N):
            ax = axes[n, t]
            ax.imshow(-images[t, n], cmap="gray", vmin=-1, vmax=1.5)
            ax.axis("off")
    plt.tight_layout()
    out = args.output or "grid.png"
    plt.savefig(out)
    plt.close()
    print(f"Saved patch grid ({T}x{N} patches) to {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser("Patch-grid demo")
    p.add_argument("--dataset", default=0, type=int)
    p.add_argument("--seq_length", default=4, type=int)
    p.add_argument("--patch_size", default=(48, 48), nargs="+", type=int)
    p.add_argument("--overlap", default=(0, 0), nargs="+", type=int)
    p.add_argument("--index", default=0, type=int)
    p.add_argument("--output", default=None)
    main(p.parse_args())

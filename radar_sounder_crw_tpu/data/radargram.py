"""Radargram loading and the window dataset.

`RGWindows` is the capability-equivalent of the reference `RGDataset`
(reference: src/dataset.py:5-47): it holds one full radargram on the host and
serves windows of `length` frames as (T, N, h, w) float32 arrays. Unlike the
reference it is torch-free at runtime — even the reference's `.pt` data
products load through the restricted torch-free reader (torch_pt.py) — keeps
no mutable geometry state, and exposes batch assembly helpers so the device
path always sees fixed static shapes.
"""

from __future__ import annotations

import os

import numpy as np

from .patchify import GridGeometry, extract_window, window_geometry

# Column lengths of the 7 concatenated MCORDS3 ("Miguel") sub-radargrams.
# reference: src/dataset.py:67
_MIGUEL_SPLITS = (9984, 6656, 9984, 20000, 16640, 32864, 8992)


def load_radargram(filepath: str) -> np.ndarray:
    """Load a 2-D radargram from .npy / .npz / torch .pt files.

    .pt files go through the TORCH-FREE restricted reader (data/torch_pt.py),
    so the reference's data products (reference: src/utils.py:28-43) load on
    a torch-less TPU VM; torch, if installed, is only a fallback for exotic
    .pt layouts the restricted reader refuses.
    """
    if filepath.endswith(".npy"):
        return np.asarray(np.load(filepath), dtype=np.float32)
    if filepath.endswith(".npz"):
        with np.load(filepath) as z:
            return np.asarray(z[z.files[0]], dtype=np.float32)
    if filepath.endswith(".pt"):
        from .torch_pt import load_pt, torch_fallback_load

        try:
            t = load_pt(filepath)
        except Exception as e:  # non-tensor layout: try torch if available
            t = torch_fallback_load(filepath, e)
            t = t.float().numpy()
        if not isinstance(t, np.ndarray):
            raise ValueError(
                f"{filepath}: expected a tensor, found {type(t).__name__}"
            )
        return np.asarray(t, dtype=np.float32)
    raise ValueError(f"Unsupported radargram format: {filepath}")


def trim_miguel(rg: np.ndarray, length: int, dim: tuple[int, int]) -> np.ndarray:
    """Trim each concatenated MCORDS3 sub-radargram to a multiple of w*length.

    reference: src/dataset.py:66-80 (same hardcoded split lengths).
    """
    splits = np.asarray(_MIGUEL_SPLITS)
    starts = np.concatenate([[0], np.cumsum(splits)[:-1]])
    pieces = []
    for start, L in zip(starts, splits):
        nrgs = int(L // (dim[1] * length))
        pieces.append(rg[:, start : start + nrgs * (dim[1] * length)])
    return np.concatenate(pieces, axis=1)


class RGWindows:
    """Windowed view over one radargram.

    Args:
      source: path to a radargram file, or an (H, W) array.
      length: frames per window (T).
      dim: patch size (h, w).
      overlap: patch overlap (oh, ow).
      flip: reverse the trace axis before windowing (reference dataset.py:16-17).
      trim_miguel_splits: apply the MCORDS3 concatenation trim
        (the reference keys this on the filename `rg2.pt`, dataset.py:12-14;
        here it is an explicit flag, set by the dataset registry).
    """

    def __init__(
        self,
        source,
        length: int = 10,
        dim: tuple[int, int] = (24, 24),
        overlap: tuple[int, int] = (0, 0),
        flip: bool = False,
        trim_miguel_splits: bool = False,
    ):
        if isinstance(source, (str, os.PathLike)):
            rg = load_radargram(str(source))
        else:
            rg = np.asarray(source, dtype=np.float32)
        if rg.ndim != 2:
            raise ValueError(f"radargram must be 2-D, got shape {rg.shape}")
        if trim_miguel_splits:
            rg = trim_miguel(rg, length, dim)
        if flip:
            rg = rg[:, ::-1]
        self.rg = np.ascontiguousarray(rg, dtype=np.float32)
        self.geo: GridGeometry = window_geometry(self.rg.shape, dim, overlap, length)
        if self.geo.nw <= 0:
            raise ValueError(
                f"radargram of width {self.rg.shape[1]} too narrow for "
                f"length={length}, w={dim[1]}, ow={overlap[1]}"
            )

    # -- reference-parity surface ------------------------------------------
    def __len__(self) -> int:
        return self.geo.nw

    def __getitem__(self, index: int) -> np.ndarray:
        """Window `index` as (T, N, h, w) float32. reference: dataset.py:34-39."""
        return extract_window(self.rg, self.geo, index)

    def get_smaller_item(self, index: int, small_length: int) -> np.ndarray:
        """Shorter window starting at the same trace offset, (T', N, h, w).

        reference: src/dataset.py:41-47. The reference mutates self.pxw as a
        side effect; this implementation is pure.
        """
        return extract_window(self.rg, self.geo, index, length=small_length)

    # -- framework additions -----------------------------------------------
    def non_overlapping_indices(self) -> range:
        """Stride-`length` item subset (reference utils.py:42)."""
        return range(0, len(self), self.geo.length)

    def batch(self, indices, length: int | None = None) -> np.ndarray:
        """Stack windows into a (B, T, N, h, w) batch (static shapes)."""
        return np.stack([extract_window(self.rg, self.geo, i, length) for i in indices])

    @property
    def item_shape(self) -> tuple[int, int, int, int]:
        g = self.geo
        return (g.length, g.nh, g.h, g.w)


class ConcatWindows:
    """Concatenation of several window datasets with identical item shapes —
    batched multi-radargram training (mixing flight lines / products in one
    run; the reference trains on a single concatenated file instead,
    src/dataset.py:12-14)."""

    def __init__(self, datasets: list):
        shapes = {tuple(d.item_shape) for d in datasets}
        if len(shapes) != 1:
            raise ValueError(f"item shapes differ across datasets: {shapes}")
        self.datasets = list(datasets)
        self.geo = datasets[0].geo
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    @property
    def item_shape(self):
        return self.datasets[0].item_shape

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, index: int) -> np.ndarray:
        if index < 0 or index >= len(self):
            raise IndexError(index)
        d = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[d][index - int(self._offsets[d])]

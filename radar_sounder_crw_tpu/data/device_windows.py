"""Device-resident windowing: build training batches ON the device.

The host windowing path (`RGWindows.__getitem__` -> `np.stack` ->
`device_put`) uploads ~B*T*N*h*w floats per step even though every window is
a slice of ONE radargram the device has already seen — on a slow host link
(axon tunnel ~5 MB/s; even PCIe for large batches) that upload dominates the
epoch wall clock by ~8x over the chip compute (BASELINE.md, round 2).

TPU-native fix: upload the radargram ONCE, then materialize each batch inside
the jitted train step as two `take` gathers (columns, then rows) driven by a
tiny (B,) int32 index array — the only per-step host->device traffic. The
gather math is exactly the host geometry (`GridGeometry`, reference:
src/dataset.py:22-39), so resident batches are bit-identical to host-windowed
batches (tested in tests/test_device_windows.py).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

from .patchify import GridGeometry


def window_index_arrays(geo: GridGeometry, length: int | None = None):
    """(row_idx (N*h,), col_rel (T*w,)) gather indices for one window.

    rows: patch n covers rows n*(h-oh) .. +h (vertical patch overlap);
    cols: frame t of a window starting at pixel column c0 covers
    c0 + t*(w-ow) .. +w. reference geometry: src/dataset.py:22-28,34-39.
    """
    T = geo.length if length is None else length
    row_idx = (
        np.arange(geo.nh)[:, None] * (geo.h - geo.oh) + np.arange(geo.h)[None, :]
    ).reshape(-1)
    col_rel = (
        np.arange(T)[:, None] * (geo.w - geo.ow) + np.arange(geo.w)[None, :]
    ).reshape(-1)
    return row_idx.astype(np.int32), col_rel.astype(np.int32)


def gather_windows(rg, indices, geo: GridGeometry, length: int | None = None):
    """Jittable: (H, W) resident radargram + (B,) window indices
    -> (B, T, N, h, w) batch, bit-identical to `extract_window` per item.

    Column gather first (narrows W -> T*w per window), then the shared row
    gather — both are contiguous-axis `take`s, which XLA lowers to efficient
    dynamic-slice/gather HLO on TPU.
    """
    T = geo.length if length is None else length
    if isinstance(indices, (np.ndarray, list, tuple)):
        idx_arr = np.asarray(indices)
        # host path (extract_window) raises for out-of-range windows; a
        # traced `take` would silently clamp to the edge column instead —
        # fail loudly while the indices are still concrete
        if idx_arr.size and (idx_arr.min() < 0 or idx_arr.max() >= geo.nw):
            raise IndexError(
                f"window index out of range [0, {geo.nw}) in {idx_arr!r}"
            )
    row_idx, col_rel = window_index_arrays(geo, T)
    rg_used = rg[: geo.pxh]  # (pxh, W)
    cols = (geo.w - geo.ow) * indices[:, None] + col_rel[None, :]  # (B, T*w)
    x = jnp.take(rg_used, cols, axis=1)  # (pxh, B, T*w)
    x = jnp.take(x, jnp.asarray(row_idx), axis=0)  # (N*h, B, T*w)
    x = x.reshape(geo.nh, geo.h, -1, T, geo.w)
    return jnp.transpose(x, (2, 3, 0, 1, 4))  # (B, T, N, h, w)


def make_window_gather(geo: GridGeometry, length: int | None = None):
    """Close over the geometry: returns jittable (rg, indices) -> batch."""
    return partial(gather_windows, geo=geo, length=length)


def resident_source(dataset):
    """If `dataset` serves windows of a single host radargram, return
    (rg (H, W) np.float32, geo, index_map) where index_map maps dataset
    positions to window indices; else None (caller falls back to the host
    windowing path). Supports RGWindows and SubsetWindows over one."""
    inner = getattr(dataset, "dataset", dataset)  # unwrap SubsetWindows
    rg = getattr(inner, "rg", None)
    geo = getattr(inner, "geo", None)
    if rg is None or geo is None or not isinstance(rg, np.ndarray):
        return None
    if inner is dataset:
        index_map = np.arange(len(dataset), dtype=np.int32)
    else:
        idxs = getattr(dataset, "indices", None)
        if idxs is None:
            return None
        index_map = np.asarray(idxs, dtype=np.int32)
    if index_map.size and (index_map.min() < 0 or index_map.max() >= geo.nw):
        raise ValueError(
            f"dataset index map exceeds the radargram's {geo.nw} windows"
        )
    return rg, geo, index_map

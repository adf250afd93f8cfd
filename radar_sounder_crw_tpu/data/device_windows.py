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

import jax
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
    """Jittable: resident radargram(s) + window indices
    -> (B, T, N, h, w) batch, bit-identical to `extract_window` per item.

    Two resident layouts (selected by rank, static under jit):
      * rg (H, W), indices (B,) int32 — windows of ONE radargram.
      * rg (D, pxh, Wmax), indices (B, 2) int32 rows of (segment, local
        window) — windows across a STACK of radargrams sharing one
        windowing geometry (`ConcatWindows`; segments zero-padded to Wmax
        on the trace axis). Pair validity per segment is the caller's
        contract — `resident_source` builds maps only from in-range pairs;
        a traced gather cannot re-check per-segment `nw`.

    Column gather first (narrows W -> T*w per window), then the shared row
    gather — both are contiguous-axis `take`s, which XLA lowers to efficient
    dynamic-slice/gather HLO on TPU.
    """
    T = geo.length if length is None else length
    row_idx, col_rel = window_index_arrays(geo, T)
    if rg.ndim == 3:  # multi-radargram stack
        if isinstance(indices, (np.ndarray, list, tuple)):
            # concrete pairs: validate what the shared geometry can see —
            # segment range and the WIDEST segment's window bound (a traced
            # `take` would silently clip instead). Windows beyond a NARROWER
            # segment's own nw cannot be detected here (only Wmax is known);
            # that stays the caller's contract (resident_source builds maps
            # only from in-range pairs).
            idx_arr = np.asarray(indices)
            if idx_arr.ndim != 2 or idx_arr.shape[-1] != 2:
                raise ValueError(
                    f"stacked radargrams need (B, 2) (segment, window) "
                    f"index pairs, got shape {idx_arr.shape}"
                )
            # bound for THIS window length: shorter windows (correction
            # tails) have more valid start positions than geo.nw
            nw_max = geo.num_windows(T, W=rg.shape[2])
            if idx_arr.size and (
                idx_arr[:, 0].min() < 0
                or idx_arr[:, 0].max() >= rg.shape[0]
                or idx_arr[:, 1].min() < 0
                or idx_arr[:, 1].max() >= nw_max
            ):
                raise IndexError(
                    f"(segment, window) pair out of range "
                    f"[0, {rg.shape[0]}) x [0, {nw_max}) in {idx_arr!r}"
                )
            indices = idx_arr
        d_idx, w_idx = indices[:, 0], indices[:, 1]
        cols = (geo.w - geo.ow) * w_idx[:, None] + col_rel[None, :]  # (B, T*w)
        rg_used = rg[:, : geo.pxh]  # (D, pxh, Wmax)
        x = jax.vmap(
            lambda d, c: jnp.take(jnp.take(rg_used, d, axis=0), c, axis=1)
        )(d_idx, cols)  # (B, pxh, T*w)
        x = jnp.take(x, jnp.asarray(row_idx), axis=1)  # (B, N*h, T*w)
        x = x.reshape(-1, geo.nh, geo.h, T, geo.w)
        return jnp.transpose(x, (0, 3, 1, 2, 4))  # (B, T, N, h, w)
    if isinstance(indices, (np.ndarray, list, tuple)):
        idx_arr = np.asarray(indices)
        # host path (extract_window) raises for out-of-range windows; a
        # traced `take` would silently clamp to the edge column instead —
        # fail loudly while the indices are still concrete. Bound for THIS
        # length: shorter (correction-tail) windows have more valid starts.
        nw_t = geo.num_windows(T)
        if idx_arr.size and (idx_arr.min() < 0 or idx_arr.max() >= nw_t):
            raise IndexError(
                f"window index out of range [0, {nw_t}) for length={T} "
                f"in {idx_arr!r}"
            )
    cols = (geo.w - geo.ow) * indices[:, None] + col_rel[None, :]  # (B, T*w)
    rg_used = rg[: geo.pxh]  # (pxh, W)
    x = jnp.take(rg_used, cols, axis=1)  # (pxh, B, T*w)
    x = jnp.take(x, jnp.asarray(row_idx), axis=0)  # (N*h, B, T*w)
    x = x.reshape(geo.nh, geo.h, -1, T, geo.w)
    return jnp.transpose(x, (2, 3, 0, 1, 4))  # (B, T, N, h, w)


def make_window_gather(geo: GridGeometry, length: int | None = None):
    """Close over the geometry: returns jittable (rg, indices) -> batch."""
    return partial(gather_windows, geo=geo, length=length)


def _same_windowing(a: GridGeometry, b: GridGeometry) -> bool:
    """Same patch/window parameters and height (trace length W may differ)."""
    return (a.h, a.w, a.oh, a.ow, a.length, a.nh) == (
        b.h, b.w, b.oh, b.ow, b.length, b.nh
    )


def resident_source(dataset):
    """If `dataset` serves windows of host radargram(s), return
    (rg, geo, index_map) for the resident gather path; else None (caller
    falls back to the host windowing path).

    Supported: RGWindows (rg (H, W), index_map (len,) window ids),
    ConcatWindows over RGWindows sharing one windowing geometry (rg
    (D, pxh, Wmax) zero-padded stack, index_map (len, 2) of (segment,
    local window) pairs — the batched multi-radargram training source),
    and SubsetWindows over either."""
    inner = getattr(dataset, "dataset", dataset)  # unwrap SubsetWindows
    if inner is not dataset:
        sub_idx = getattr(dataset, "indices", None)
        if sub_idx is None:
            return None
        sub_idx = np.asarray(sub_idx, dtype=np.int64)
        if sub_idx.size and (sub_idx.min() < 0 or sub_idx.max() >= len(inner)):
            raise ValueError(
                f"dataset index map exceeds the inner dataset's {len(inner)} "
                f"windows"
            )
    else:
        sub_idx = None

    rg = getattr(inner, "rg", None)
    geo = getattr(inner, "geo", None)
    if isinstance(rg, np.ndarray) and geo is not None:
        index_map = (
            np.arange(len(inner), dtype=np.int32)
            if sub_idx is None
            else sub_idx.astype(np.int32)
        )
        if index_map.size and (
            index_map.min() < 0 or index_map.max() >= geo.nw
        ):
            raise ValueError(
                f"dataset index map exceeds the radargram's {geo.nw} windows"
            )
        return rg, geo, index_map

    # ConcatWindows over RGWindows: stack the segments (padded to the widest
    # trace axis; pxh rows suffice — the gather never reads below them) and
    # address windows by (segment, local index) pairs
    segments = getattr(inner, "datasets", None)
    if not segments:
        return None
    geo = getattr(inner, "geo", None)
    if geo is None:
        return None  # concat-like container without a shared geometry
    for d in segments:
        if not isinstance(getattr(d, "rg", None), np.ndarray):
            return None
        if getattr(d, "geo", None) is None or not _same_windowing(d.geo, geo):
            return None  # same item shape but different overlap math
    # memoized on the concat object: callers cache the device upload keyed
    # on the HOST array's identity (train/crw_trainer.py), so the stack must
    # be the same object across fit() calls
    memo = getattr(inner, "_resident_stack", None)
    if memo is None:
        w_max = max(d.rg.shape[1] for d in segments)
        stack = np.zeros((len(segments), geo.pxh, w_max), dtype=np.float32)
        for i, d in enumerate(segments):
            stack[i, :, : d.rg.shape[1]] = d.rg[: geo.pxh]
        pairs = np.concatenate(
            [
                np.stack(
                    [
                        np.full(len(d), i, dtype=np.int32),
                        np.arange(len(d), dtype=np.int32),
                    ],
                    axis=1,
                )
                for i, d in enumerate(segments)
            ]
        )
        memo = (stack, pairs)
        try:
            inner._resident_stack = memo
        except AttributeError:
            pass  # slotted/frozen container: rebuild per call, still correct
    stack, pairs = memo
    index_map = pairs if sub_idx is None else pairs[sub_idx]
    return stack, geo, index_map

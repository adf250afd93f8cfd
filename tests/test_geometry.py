"""Patch-grid geometry tests, cross-checked against torch.Tensor.unfold
(the reference's windowing primitive) as an independent oracle."""

import numpy as np
import pytest

from radar_sounder_crw_tpu.data import (
    RGWindows,
    synthetic_radargram,
    trim_miguel,
    unfold2d,
    window_geometry,
)


def torch_window(rg, geo, index, length=None):
    """Reference-semantics windowing via torch.unfold (oracle)."""
    import torch

    length = geo.length if length is None else length
    pxw = length * geo.w - geo.ow * (length - 1)
    c0 = (geo.w - geo.ow) * index
    item = torch.from_numpy(rg[: geo.pxh, c0 : c0 + pxw].copy())
    item = item.unfold(0, geo.h, geo.h - geo.oh)
    item = item.unfold(1, geo.w, geo.w - geo.ow)
    return item.permute(1, 0, 2, 3).float().numpy()


@pytest.mark.parametrize(
    "H,W,dim,overlap,length",
    [
        (410, 2000, (16, 16), (8, 0), 20),  # train.py defaults
        (410, 4000, (32, 32), (24, 0), 10),  # mc1 geometry
        (410, 4000, (32, 32), (30, 0), 7),  # mc3 geometry
        (128, 1000, (24, 24), (0, 0), 10),  # RGDataset defaults
        (97, 777, (16, 12), (4, 4), 5),  # awkward, with width overlap
    ],
)
def test_window_matches_torch_unfold(H, W, dim, overlap, length):
    rg, _ = synthetic_radargram(H=H, W=W, seed=3)
    ds = RGWindows(rg, length=length, dim=dim, overlap=overlap)
    geo = ds.geo

    # formulas from reference src/dataset.py:22-28
    assert geo.nh == (H - overlap[0]) // (dim[0] - overlap[0])
    assert geo.pxw == length * dim[1] - overlap[1] * (length - 1)
    assert geo.nw == (W - geo.pxw) // (dim[1] - overlap[1]) + 1
    assert geo.pxh == geo.nh * dim[0] - overlap[0] * (geo.nh - 1)
    assert len(ds) == geo.nw

    for index in [0, 1, len(ds) // 2, len(ds) - 1]:
        got = ds[index]
        want = torch_window(ds.rg, geo, index)
        assert got.shape == (length, geo.nh, dim[0], dim[1])
        np.testing.assert_array_equal(got, want)


def test_smaller_item_matches_torch_and_is_pure():
    rg, _ = synthetic_radargram(H=200, W=3000, seed=4)
    ds = RGWindows(rg, length=20, dim=(16, 16), overlap=(8, 0))
    full_before = ds[0].copy()
    small = ds.get_smaller_item(1, 7)
    want = torch_window(ds.rg, ds.geo, 1, length=7)
    np.testing.assert_array_equal(small, want)
    assert small.shape[0] == 7
    # no reference-style self-mutation: full item unchanged afterwards
    np.testing.assert_array_equal(ds[0], full_before)


def test_unfold2d_values():
    x = np.arange(6 * 8, dtype=np.float32).reshape(6, 8)
    g = unfold2d(x, (2, 3), (2, 2))
    assert g.shape == (3, 3, 2, 3)
    np.testing.assert_array_equal(g[0, 0], x[0:2, 0:3])
    np.testing.assert_array_equal(g[2, 1], x[4:6, 2:5])


def test_trim_miguel_geometry():
    splits = [9984, 6656, 9984, 20000, 16640, 32864, 8992]
    W = sum(splits)
    rg = np.arange(2 * W, dtype=np.float32).reshape(2, W)
    length, dim = 10, (16, 16)
    out = trim_miguel(rg, length, dim)
    unit = dim[1] * length
    expect_w = sum((s // unit) * unit for s in splits)
    assert out.shape == (2, expect_w)
    # every trimmed piece must be the HEAD of its split, copied verbatim
    # from its absolute source offset (reference src/dataset.py:66-80)
    src_off = dst_off = 0
    for s in splits:
        w_i = (s // unit) * unit
        np.testing.assert_array_equal(
            out[:, dst_off : dst_off + w_i], rg[:, src_off : src_off + w_i]
        )
        src_off += s
        dst_off += w_i
    assert dst_off == expect_w


def test_flip_reverses_traces():
    rg, _ = synthetic_radargram(H=64, W=640, seed=5)
    a = RGWindows(rg, length=4, dim=(16, 16), overlap=(0, 0))
    b = RGWindows(rg, length=4, dim=(16, 16), overlap=(0, 0), flip=True)
    np.testing.assert_array_equal(b.rg, rg[:, ::-1])
    np.testing.assert_array_equal(
        a[0][:, :, :, :], np.flip(b[len(b) - 1], axis=(0, 3))
    )


def test_rendered_sizes():
    geo = window_geometry((410, 4000), (16, 16), (8, 0), 100)
    # reference: scripts/test/test_all.py:72-73
    assert geo.rg_len() == 100 * 16
    assert geo.rg_h() == geo.nh * 8 + 8

"""resize helpers must bit-match torch interpolate semantics — the
propagation pipeline's seed downsampling and prediction upsampling depend on
it (reference: src/utils.py:139, scripts/test/test_all.py:79)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from radar_sounder_crw_tpu.utils import (
    resize_bilinear_align_corners,
    resize_nearest,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((410, 37), (50, 1)), ((50, 100), (410, 1600)), ((7, 13), (13, 7)), ((4, 4), (8, 8)),
     ((9, 27), (495, 305))],  # float32-rounding boundary case
)
def test_nearest_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(0).standard_normal((1, 1, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(resize_nearest(x, out_hw, axes=(-2, -1)))
    np.testing.assert_array_equal(got, want)


def test_nearest_matches_torch_fuzz():
    """Index rule matches torch bit-for-bit across random size pairs."""
    rng = np.random.default_rng(3)
    for _ in range(150):
        in_s, out_s = int(rng.integers(1, 500)), int(rng.integers(1, 500))
        ident = np.arange(in_s, dtype=np.float32).reshape(1, 1, in_s, 1)
        want = F.interpolate(
            torch.from_numpy(ident), size=(out_s, 1), mode="nearest"
        ).numpy().ravel()
        got = np.asarray(resize_nearest(ident, (out_s, 1), axes=(-2, -1))).ravel()
        np.testing.assert_array_equal(got, want, err_msg=f"{in_s}->{out_s}")


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((7, 9), (14, 18)), ((5, 5), (3, 7))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(1).standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=True
    ).numpy()
    # ours is NHWC
    got = np.asarray(
        resize_bilinear_align_corners(x.transpose(0, 2, 3, 1), out_hw)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

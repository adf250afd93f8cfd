"""Image resizing with PyTorch/torchvision index semantics.

The propagation pipeline resizes seed columns and predictions with
torchvision's NEAREST mode and the UNet upsamples with bilinear
align_corners=True (reference: src/utils.py:139, src/unet.py:50,
scripts/test/test_all.py:79). jax.image.resize uses half-pixel centers, which
does NOT match either; these helpers reproduce the torch semantics exactly so
segmentation maps can bit-match the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _nearest_idx(out_size: int, in_size: int) -> np.ndarray:
    # torch F.interpolate(mode='nearest') computes src = floorf(dst * scale)
    # with scale = (float)in/out in FLOAT32 arithmetic — float rounding of the
    # product is part of the semantics (it can round up to an exact integer),
    # so neither exact-integer nor float64 math reproduces it. Emulate the
    # float32 computation bit-for-bit (fuzz-verified on 400 random size pairs).
    scale = np.float32(in_size) / np.float32(out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1).astype(np.int32)


def resize_nearest(x, out_hw: tuple[int, int], axes: tuple[int, int] = (-2, -1)):
    """Nearest resize along two axes, torch interpolate semantics.

    numpy input stays numpy: this runs on tiny host-side seeds and
    prediction maps, and `jnp.take` on a host array would ship it to the
    default device and back — one ~28 ms relay round-trip per call in this
    deployment (measured as the propagation pipeline's dominant fixed cost
    outside the fused program). Gather indices are identical either way."""
    a0, a1 = axes
    h_in = x.shape[a0]
    w_in = x.shape[a1]
    ih = _nearest_idx(out_hw[0], h_in)
    iw = _nearest_idx(out_hw[1], w_in)
    take = np.take if isinstance(x, np.ndarray) else jnp.take
    x = take(x, ih, axis=a0)
    x = take(x, iw, axis=a1)
    return x


def _align_corners_weights(out_size: int, in_size: int):
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, np.int32)
        return lo, lo, np.zeros(out_size, np.float32)
    pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int32)
    lo = np.minimum(lo, in_size - 2)
    frac = (pos - lo).astype(np.float32)
    return lo, lo + 1, frac


def resize_bilinear_align_corners(x, out_hw: tuple[int, int]):
    """Bilinear resize with align_corners=True on the (1, 2) axes of NHWC."""
    H2, W2 = out_hw
    h_lo, h_hi, h_f = _align_corners_weights(H2, x.shape[1])
    w_lo, w_hi, w_f = _align_corners_weights(W2, x.shape[2])
    h_f = jnp.asarray(h_f)[None, :, None, None]
    w_f = jnp.asarray(w_f)[None, None, :, None]
    top = jnp.take(x, jnp.asarray(h_lo), axis=1)
    bot = jnp.take(x, jnp.asarray(h_hi), axis=1)
    rows = top * (1 - h_f) + bot * h_f
    left = jnp.take(rows, jnp.asarray(w_lo), axis=2)
    right = jnp.take(rows, jnp.asarray(w_hi), axis=2)
    return left * (1 - w_f) + right * w_f

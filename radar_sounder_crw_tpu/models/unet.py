"""Supervised UNet segmentation baseline (flax linen, NHWC).

Capability match for the reference's milesial-style UNet baseline
(reference: src/unet.py:8-104): DoubleConv units (3x3 conv, BN, ReLU twice,
convs bias-free), a 3-level encoder/decoder with bilinear
(align_corners=True) upsampling, skip concatenation with asymmetric padding
for odd sizes, and a 1x1 output head. Used with n_channels=1, n_classes=5 on
SHARAD strips (reference: scripts/test/test_unet.py:27).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..utils.resize import resize_bilinear_align_corners
from .initializers import (
    torch_default_bias_init,
    torch_default_kernel_init,
    torch_transposed_kernel_init,
)


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_channels or self.out_channels
        for i, feats in enumerate((mid, self.out_channels)):
            x = nn.Conv(
                feats,
                (3, 3),
                padding=1,
                use_bias=False,
                kernel_init=torch_default_kernel_init(),
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    n_channels: int = 1
    n_classes: int = 5
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        factor = 2 if self.bilinear else 1
        dc = lambda out, mid, name: DoubleConv(
            out, mid, dtype=self.dtype, name=name
        )
        down = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))

        x1 = dc(64, None, "inc")(x, train)
        x2 = dc(128, None, "down1")(down(x1), train)
        x3 = dc(256, None, "down2")(down(x2), train)
        x4 = dc(512 // factor, None, "down3")(down(x3), train)

        def up(xa, xb, out, mid, name):
            if self.bilinear:
                xa = resize_bilinear_align_corners(
                    xa, (xa.shape[1] * 2, xa.shape[2] * 2)
                )
            else:
                up_ch = xa.shape[-1] // 2
                xa = nn.ConvTranspose(
                    up_ch, (2, 2), strides=(2, 2),
                    kernel_init=torch_transposed_kernel_init(up_ch, 2, 2),
                    bias_init=torch_default_bias_init(up_ch * 2 * 2),
                    dtype=self.dtype,
                    name=name + "_up",
                )(xa)
            dh = xb.shape[1] - xa.shape[1]
            dw = xb.shape[2] - xa.shape[2]
            xa = jnp.pad(
                xa,
                (
                    (0, 0),
                    (dh // 2, dh - dh // 2),
                    (dw // 2, dw - dw // 2),
                    (0, 0),
                ),
            )
            return dc(out, mid, name)(jnp.concatenate([xb, xa], axis=-1), train)

        y = up(x4, x3, 256 // factor, 512 // 2 if self.bilinear else None, "up1")
        y = up(y, x2, 128 // factor, 256 // 2 if self.bilinear else None, "up2")
        y = up(y, x1, 64, 128 // 2 if self.bilinear else None, "up3")
        logits = nn.Conv(
            self.n_classes,
            (1, 1),
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(64),
            dtype=jnp.float32,
            name="outc",
        )(y)
        return logits

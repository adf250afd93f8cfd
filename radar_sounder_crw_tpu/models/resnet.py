"""Generic residual CNN backbone (flax linen, NHWC).

Capability match for the vendored torchvision-style ResNet the reference
embeds (reference: src/encoder.py:92-272): BasicBlock residual units, a
7x7/stride-2 stem, 3x3/stride-2 max-pool, four stages with channel doubling,
global average pool, and a linear head. The reference instantiates it with
stage_sizes=[1,1,1,1] and num_classes=128 (a "ResNet-10";
reference: src/encoder.py:77-81).

TPU notes: NHWC layout (XLA's native conv layout), batch-stat BatchNorm under
jit with a mutable 'batch_stats' collection, and an optional compute dtype so
the conv/matmul path can run in bfloat16 on the MXU with float32 accumulation.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .initializers import (
    kaiming_normal_fan_out,
    torch_default_bias_init,
    torch_default_kernel_init,
)


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual connection (expansion 1)."""

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        identity = x
        y = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes,
            (3, 3),
            padding=1,
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = norm("bn2")(y)
        if self.use_projection:
            identity = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=kaiming_normal_fan_out,
                dtype=self.dtype,
                name="downsample_conv",
            )(identity)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetCore(nn.Module):
    """Stem + four BasicBlock stages + GAP + linear head. Input NHWC."""

    stage_sizes: Sequence[int] = (1, 1, 1, 1)
    num_classes: int = 128
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.width,
            (7, 7),
            strides=(2, 2),
            padding=3,
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        # NOTE: a max-tree-of-strided-slices pool variant was measured at
        # 31.1 ms/step vs 18.4 ms for reduce_window on the bench config —
        # select_and_scatter's 0.78 ms backward is the cheaper option
        # (benchmarks/stem_experiment.py, r2 MFU study); keep nn.max_pool.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = self.width
        for stage, nblocks in enumerate(self.stage_sizes):
            for block in range(nblocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(
                    planes=planes,
                    stride=stride,
                    use_projection=(stage > 0 and block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
            planes *= 2

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        feat_dim = self.width * 2 ** (len(self.stage_sizes) - 1)
        x = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(feat_dim),
            name="fc",
        )(x)
        return x

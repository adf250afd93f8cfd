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

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fused_bn import FusedBatchNorm, LeanBatchNorm
from .initializers import (
    kaiming_normal_fan_out,
    torch_default_bias_init,
    torch_default_kernel_init,
)


def make_norm(fused: bool | str | None, train: bool, dtype, name: str):
    """BatchNorm factory: flax nn.BatchNorm (None/False), the hand-scheduled
    FusedBatchNorm (True/'fused' — MEASURED NEGATIVE RESULT, v5e 2026-08-17,
    interleaved A/B through CRWTrainer, benchmarks/bench_fused_bn.py: 17.7 vs
    16.75 ms/step; the custom_vjp boundary blocks XLA's conv+BN fusions and
    the backward's xhat recompute costs more than the materialized f32
    activation copy it saves), or the pure-jnp LeanBatchNorm ('lean' —
    bf16-read statistics with f32 accumulation, no autodiff boundary; the
    round-3-VERDICT #5 experiment). Parameter/collection layout is identical
    across all three.

    'twopass' is flax nn.BatchNorm with use_fast_variance=False: torch
    computes batch variance as E[(x-mean)^2] (two passes) while flax's
    default one-pass E[x^2]-E[x]^2 loses up to ~1e-2 relative precision to
    float32 cancellation when a channel's |mean| >> std (measured against
    torch.nn.BatchNorm2d: 1.5e-2 one-pass vs 5e-5 two-pass on offset
    inputs). The default stays one-pass — it reads the activations once
    (bandwidth-bound stats on TPU) and the precision loss is float noise,
    not a semantics gap — but training-trajectory parity tests against the
    reference (tests/test_reference_train_trajectory.py) use 'twopass'."""
    if fused in (None, False):
        cls = nn.BatchNorm
    elif fused == "twopass":
        cls = partial(nn.BatchNorm, use_fast_variance=False)
    elif fused in (True, "fused"):
        cls = FusedBatchNorm
    elif fused == "lean":
        cls = LeanBatchNorm
    else:
        raise ValueError(f"unknown BatchNorm implementation {fused!r}")
    return cls(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, param-compatible with nn.Conv(name=...)
    ({scope}/kernel, HWIO (7,7,C,width)), with an optional space-to-depth
    evaluation path for TPU.

    The reference stem feeds only 3 channels into a stride-2 conv; its
    backward-input conv then has 3 output channels — ~2% MXU utilization,
    2.8 ms of the 14.6 ms train step on v5e (BASELINE.md r2 MFU study).
    Space-to-depth rewrites conv7x7/s2 on (H, W, C) as the mathematically
    identical conv4x4/s1 on the (H/2, W/2, 4C) phase-split input: the
    backward-input conv gets 4C output channels and stride-1 geometry.
    The parameter stays the original (7,7,C,width) kernel (checkpoint and
    torch interchange compatible); the 4x4 phase kernel is rebuilt from it
    inside the traced step, so autodiff delivers exact 7x7 gradients.

    Derivation: out[p,q] = sum_{di,dj} x[2p-3+di, 2q-3+dj] W[di,dj]. Rows
    with even di-3 hit even input rows 2(p+u), u=(di-3)/2 in {-1,0,1}; odd
    di-3 hit odd rows 2(p+u)+1, u=(di-4)/2 in {-2..1}. Unifying taps to
    u in {-2..1} gives a 4-tap kernel per phase (one zero tap for the even
    phase) and asymmetric padding (2,1) reproduces the original pad-3 zeros.
    """

    width: int
    dtype: jnp.dtype = jnp.float32
    s2d: bool | None = None  # None = auto: space-to-depth on TPU, TRAIN only

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal_fan_out, (7, 7, in_ch, self.width)
        )
        s2d = self.s2d
        if s2d is None:
            # auto: space-to-depth pays off in TRAINING (it fixes the
            # 3-output-channel backward-input conv, -1 ms/step on v5e) but
            # is an HBM disaster at INFERENCE — measured 368 MB vs 23 MB
            # bytes-accessed for plain conv7x7/s2 on a 400-patch eval batch
            # (benchmarks/encoder_bytes.py; the phase-split slices and the
            # 16-tap conv4x4 lowering materialize the stage output ~15x).
            # Eval has no backward, so the plain conv wins there.
            s2d = jax.default_backend() == "tpu" and train
        B, H, W, _ = x.shape
        if not s2d or H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # phase-split the kernel rows/cols: even phase taps at di=1,3,5
        # (zero tap first), odd phase at di=0,2,4,6
        def phase_split(w, axis):
            zero = jnp.zeros_like(jax.lax.slice_in_dim(w, 0, 1, axis=axis))
            even = jnp.concatenate(
                [zero, jax.lax.slice_in_dim(w, 1, 7, stride=2, axis=axis)],
                axis=axis,
            )
            odd = jax.lax.slice_in_dim(w, 0, 7, stride=2, axis=axis)
            return even, odd

        r0, r1 = phase_split(kernel, 0)  # (4,7,C,O) each
        parts = []
        for r in (r0, r1):
            c0, c1 = phase_split(r, 1)  # (4,4,C,O)
            parts += [c0, c1]
        w4 = jnp.concatenate(parts, axis=2)  # (4,4,4C,O), blocks (i,j) order

        x4 = jnp.concatenate(
            [
                x[:, 0::2, 0::2, :],
                x[:, 0::2, 1::2, :],
                x[:, 1::2, 0::2, :],
                x[:, 1::2, 1::2, :],
            ],
            axis=-1,
        )  # (B, H/2, W/2, 4C)
        return jax.lax.conv_general_dilated(
            x4.astype(self.dtype),
            w4.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual connection (expansion 1)."""

    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool | str | None = None  # see make_norm

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: make_norm(self.fused_bn, train, self.dtype, name)
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
    s2d_stem: bool | None = None  # None = auto (space-to-depth on TPU)
    fused_bn: bool | str | None = None  # see make_norm

    @nn.compact
    def __call__(self, x, train: bool):
        x = StemConv(
            width=self.width,
            dtype=self.dtype,
            s2d=self.s2d_stem,
            name="conv1",
        )(x, train=train)
        x = make_norm(self.fused_bn, train, self.dtype, "bn1")(x)
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
                    fused_bn=self.fused_bn,
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

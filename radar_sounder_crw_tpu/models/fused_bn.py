"""Hand-scheduled training-mode BatchNorm (drop-in for flax nn.BatchNorm).

Motivation (round-2 MFU study, BASELINE.md): BatchNorm statistic work is
~2.5-3 ms of the 14.6 ms ResNet-10 train step on v5e — the profile shows
f32 converts of the bf16 activations materialized as separate fusions.
flax's BatchNorm promotes x to float32 once and feeds that converted copy
to BOTH the statistics reductions and the normalize; with two consumers
XLA materializes the f32 copy to HBM (2x the bf16 activation's bytes,
written then read back twice) instead of fusing the convert into each
consumer.

MEASURED NEGATIVE RESULT (v5e, 2026-08-17): 17.7 ms/step vs 16.75 for flax
nn.BatchNorm on the bench train step (interleaved A/B through CRWTrainer,
benchmarks/bench_fused_bn.py). The custom_vjp boundary prevents XLA from
fusing BN into the adjacent conv epilogues, and the backward's on-the-fly
xhat recompute adds more work than the saved f32 materialization. Kept as
the recorded record (correct, tested, selectable via fused_bn=True), never
routed by default.

This module routes the same math through a `jax.custom_vjp` so each pass
re-reads the original bf16 activation and converts inside its own fusion:

  forward: one multi-output reduction pass (sum, sum-of-squares; f32
    accumulation over the bf16 input) + one elementwise normalize pass;
  backward: one reduction pass (sum(dy), sum(dy*xhat), xhat recomputed
    on the fly) + one elementwise pass for dx.

Math is identical to flax nn.BatchNorm / torch BatchNorm2d training mode
(biased variance E[x^2]-E[x]^2 for normalization; the flax running-stat
update convention is preserved), so checkpoints and torch interchange are
unchanged: the parameter/collection layout ('scale', 'bias',
batch_stats/{mean,var}) matches nn.BatchNorm exactly.

Reference behavior being reproduced: BatchNorm2d inside the vendored
ResNet (reference src/encoder.py:92-272) and the encoder stems
(src/encoder.py:68-74).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x, scale, bias, eps: float):
    """Training BatchNorm. Returns (y, mean, var); mean/var are
    stop-gradient side outputs for the running-statistics update (their
    incoming cotangents are ignored in the custom backward — gradients
    never flow through running statistics)."""
    y, mean, var, _ = _bn_train_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_train_impl(x, scale, bias, eps: float):
    n = x.size // x.shape[-1]
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)  # fused into the reductions, not materialized
    s1 = jnp.sum(xf, axes)
    s2 = jnp.sum(jnp.square(xf), axes)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x.astype(jnp.float32) - mean) * inv * scale + bias).astype(x.dtype)
    return y, mean, var, inv


def _bn_train_fwd(x, scale, bias, eps: float):
    y, mean, var, inv = _bn_train_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_train_bwd(eps: float, res, cotangents):
    g, _, _ = cotangents  # mean/var cotangents intentionally dropped
    x, scale, mean, inv = res
    n = x.size // x.shape[-1]
    axes = tuple(range(x.ndim - 1))
    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv  # recomputed, fused per pass
    dbias = jnp.sum(gf, axes)
    dscale = jnp.sum(gf * xhat, axes)
    dx = (scale * inv) * (gf - dbias / n - xhat * (dscale / n))
    return dx.astype(x.dtype), dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class LeanBatchNorm(nn.Module):
    """nn.BatchNorm drop-in whose training STATISTICS read the (bf16)
    activation directly with float32 accumulation — no pre-materialized
    float32 copy of the activation (flax's `_compute_stats` does
    `x = x.astype(float32)` up front and feeds that converted tensor to both
    reductions; when XLA materializes it, the BN-stat passes move 3x f32
    bytes instead of 2x bf16).

    The round-3-VERDICT #5 experiment: unlike FusedBatchNorm above (the
    custom_vjp loser), this variant stays PURE jnp — no autodiff boundary,
    so XLA keeps its conv+BN fusions and derives the backward itself. The
    per-element math is identical to flax (convert->accumulate-f32 for the
    mean, convert->square->accumulate-f32 for E[x^2], normalize computed in
    the f32-promoted precision and cast to dtype at the end), so losses
    match flax BN bit-for-bit barring reduction-order reassociation; the
    only intended difference is which buffers XLA materializes. Selected via
    fused_bn="lean"; measured on hardware before any default routing."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        dtype = self.dtype or x.dtype
        axes = tuple(range(x.ndim - 1))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # reductions read x in its stored dtype; the f32 convert fuses
            # into each reduce instead of materializing an f32 activation
            mean = jnp.mean(x, axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axes)
            var = jnp.maximum(0.0, mean2 - jnp.square(mean))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        # normalize exactly like flax _normalize: promoted (f32) arithmetic,
        # one cast to the compute dtype at the end
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean) * mul + bias
        return y.astype(dtype)


class FusedBatchNorm(nn.Module):
    """nn.BatchNorm-compatible module using the hand-scheduled training
    kernel above. Same attribute subset the models use; same param and
    batch_stats layout, so `nn.BatchNorm <-> FusedBatchNorm` is checkpoint
    and torch-interchange transparent.

    Training normalize runs in float32 and casts to the input dtype (flax
    with dtype=bfloat16 normalizes in bfloat16 — a strictly less precise
    variant); eval mode matches flax's running-average path.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        dtype = self.dtype or x.dtype
        if self.use_running_average:
            # eval path: identical math to flax (promoted compute, cast out)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * inv * scale + bias
            return y.astype(dtype)

        y, mean, var = _bn_train(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y.astype(dtype)

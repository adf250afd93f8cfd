"""Batch-minor (HWCN) evaluation forward for the ResNet patch encoder.

Why this exists (TPU memory layout, not math): the inference encoder runs
hundreds of thousands of 16x16 patches through `ResNetEncoder`
(reference: src/encoder.py:63-89) per survey call. In the stock NHWC
forward every activation keeps (spatial, channel) as its two minor dims,
and the TPU tiles those to (sublane, lane) = (8/16, 128). The early
stages have 1-3 channels, so each tensor pads its lane dim 3 -> 128: the
18x18x3 stem output occupies 34.8 GB of HBM footprint for 612 MB of
payload (measured via an XLA allocation report at B=315,000 — the Miguel
full-survey batch), and the 7x7 stem conv reads it back at that
amplification. The fix is a layout, not an algorithm: carry activations
as (H, W, C, B) with the PATCH axis on lanes — B is huge and dense — and
channels on sublanes, where C in {64, 128, 256, 512} tiles exactly.
`lax.conv_general_dilated` supports this natively via
dimension_numbers ("HWCN", "HWIO", "HWCN"); no data munging is needed
beyond one input transpose.

Measured (v5e, B=315,000, chained-dispatch slope): 51.9 ms (stock NHWC)
-> 45.0 ms full forward; per-stage deltas in benchmarks/encoder_stage_slopes.py.

Semantics: bit-compatible math with `model.apply(variables, x,
train=False)` — same conv geometry, same flax BatchNorm eval arithmetic
(subtract-mean, multiply by rsqrt(var+eps)*scale, add bias, all in the
module compute dtype), same bf16 rounding points, same f32 head. Only
float accumulation order inside the convolutions differs (XLA picks a
different contraction schedule per layout), which is float noise, not a
semantics gap; tests/test_batch_minor.py pins the agreement against the
stock forward.

This is an inference path only (no custom VJP needed): training keeps the
stock NHWC forward, whose backward relies on XLA's conv fusions and the
space-to-depth stem (models/resnet.py StemConv).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["resnet_eval_batch_minor", "use_batch_minor"]

_DN = ("HWCN", "HWIO", "HWCN")

# Below this many patches the lane axis is underfilled either way and the
# stock path's compile cache is already warm for the small shapes the
# scripts use; keep dispatch stable there.
_MIN_BATCH = 2048


def use_batch_minor(model, n_patches: int, bn_train_mode: bool) -> bool:
    """Trace-time dispatch predicate for `encode_sequence`.

    True when the batch-minor eval forward should replace
    `model.apply(train=False)`: ResNetEncoder with the stock BatchNorm and
    stem (this module mirrors flax nn.BatchNorm eval arithmetic and the
    plain 7x7 eval stem — the 'lean'/'fused' BN variants and an explicit
    s2d_stem=True keep the flax forward so their own eval semantics stay
    authoritative), eval-mode BN, a TPU backend (the layout argument above
    is about TPU tiling; on CPU both layouts are plain row-major), and a
    lane-filling batch. `RSCRW_ENCODER_IMPL` overrides: 'stock' forces the
    flax forward, 'batch_minor' forces this one where supported (any
    backend — tests use it on CPU), 'auto' (default) applies the
    predicate; any other value raises. Read at trace time: a cached jit
    executable keeps the impl it traced with.
    """
    from .encoders import ResNetEncoder

    impl = os.environ.get("RSCRW_ENCODER_IMPL", "auto")
    if impl not in ("auto", "stock", "batch_minor"):
        raise ValueError(
            f"RSCRW_ENCODER_IMPL={impl!r} — expected 'auto', 'stock' or "
            f"'batch_minor'"
        )
    if impl == "stock":
        return False
    if not isinstance(model, ResNetEncoder) or bn_train_mode:
        return False
    # configs whose eval arithmetic this module does not reproduce
    if model.fused_bn not in (None, False) or model.s2d_stem is True:
        return False
    if impl == "batch_minor":
        return True
    return jax.default_backend() == "tpu" and n_patches >= _MIN_BATCH


def _bn_eval(y, params, stats, dtype):
    """flax nn.BatchNorm eval arithmetic on a (H, W, C, B) activation:
    (y - mean) * (rsqrt(var + eps) * scale) + bias, computed in `dtype`
    (flax promotes all operands to the module dtype first — mirrored here
    so the bf16 rounding points match the stock forward)."""
    mean = stats["mean"].astype(dtype)[:, None]
    var = stats["var"].astype(dtype)[:, None]
    scale = params["scale"].astype(dtype)[:, None]
    bias = params["bias"].astype(dtype)[:, None]
    mul = jax.lax.rsqrt(var + jnp.asarray(1e-5, dtype)) * scale
    return (y.astype(dtype) - mean) * mul + bias


def _conv(y, kernel, stride, pad, dtype):
    return jax.lax.conv_general_dilated(
        y.astype(dtype),
        jnp.asarray(kernel).astype(dtype),
        (stride, stride),
        ((pad, pad), (pad, pad)) if isinstance(pad, int) else pad,
        dimension_numbers=_DN,
    )


def _basic_block(y, params, stats, stride, dtype):
    """BasicBlock eval (models/resnet.py BasicBlock) in HWCN layout."""
    identity = y
    z = _conv(y, params["conv1"]["kernel"], stride, 1, dtype)
    z = jax.nn.relu(_bn_eval(z, params["bn1"], stats["bn1"], dtype))
    z = _conv(z, params["conv2"]["kernel"], 1, 1, dtype)
    z = _bn_eval(z, params["bn2"], stats["bn2"], dtype)
    if "downsample_conv" in params:
        identity = _conv(
            identity, params["downsample_conv"]["kernel"], stride, 0, dtype
        )
        identity = _bn_eval(
            identity, params["downsample_bn"], stats["downsample_bn"], dtype
        )
    return jax.nn.relu(z + identity)


def resnet_eval_batch_minor(model, variables, x):
    """(B, H, W, Cin) patches -> (B, embed_dim) float32, equal to
    `model.apply(variables, x, train=False)` for a ResNetEncoder up to
    conv accumulation order. `x` includes the pos-embed channel when the
    caller uses it (Cin in {1, 2})."""
    dtype = model.dtype
    params = variables["params"]
    stats = variables["batch_stats"]

    # (B, H, W, C) -> (H, W, C, B): the only layout change; everything
    # below stays batch-minor until the final head transpose.
    y = jnp.transpose(x, (1, 2, 3, 0)).astype(dtype)

    # fc0: the reference's 1x1-conv-with-spatial-padding stem quirk
    # (reference: src/encoder.py:68) + bn0 + relu
    y = _conv(y, params["fc0"]["kernel"], 1, 1, dtype)
    y = y + jnp.asarray(params["fc0"]["bias"]).astype(dtype)[:, None]
    y = jax.nn.relu(_bn_eval(y, params["bn0"], stats["bn0"], dtype))

    core_p, core_s = params["model"], stats["model"]

    # ResNet stem: 7x7/s2 conv (eval path — no space-to-depth at
    # inference, matching StemConv's train-only auto gate), bn, relu,
    # 3x3/s2 max-pool
    y = _conv(y, core_p["conv1"]["kernel"], 2, 3, dtype)
    y = jax.nn.relu(_bn_eval(y, core_p["bn1"], core_s["bn1"], dtype))
    y = jax.lax.reduce_window(
        y,
        jnp.asarray(-jnp.inf, y.dtype),
        jax.lax.max,
        (3, 3, 1, 1),
        (2, 2, 1, 1),
        ((1, 1), (1, 1), (0, 0), (0, 0)),
    )

    for stage in range(len(model.stage_sizes)):
        for block in range(model.stage_sizes[stage]):
            stride = 2 if (stage > 0 and block == 0) else 1
            name = f"layer{stage + 1}_{block}"
            y = _basic_block(y, core_p[name], core_s[name], stride, dtype)

    # GAP over spatial (same jnp.mean reduction as the stock head), then
    # the f32 Dense head
    y = jnp.mean(y, axis=(0, 1))  # (C, B)
    fc = core_p["fc"]
    out = (
        jnp.asarray(fc["kernel"]).astype(jnp.float32).T
        @ y.astype(jnp.float32)
        + jnp.asarray(fc["bias"]).astype(jnp.float32)[:, None]
    )
    return out.T

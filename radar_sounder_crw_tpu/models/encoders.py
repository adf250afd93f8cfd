"""Patch encoders producing one 128-d embedding per radargram patch.

Two families, mirroring the reference's capability surface
(reference: src/encoder.py):
  * CNNEncoder  — 5-layer plain CNN + GAP + FC      (model id 0)
  * ResNetEncoder — 1x1 stem to 3 channels + ResNet-10 (model id 1)

Inputs are NHWC float patches, (B, h, w, C) with C=1 or 2 (2 when the
positional-embedding channel is prepended; reference: src/utils.py:76-90).
Outputs are (B, embed_dim) float32.

Architecture quirks preserved from the reference (they change output shapes
and therefore trained-weight compatibility):
  * CNN: padding=1 on the two 5x5 convs (shrinks maps by 2 each),
    max-pools with stride 1 (reference: src/encoder.py:15-24).
  * ResNet stem: Conv2d(., 3, kernel_size=1, padding=1) — a 1x1 conv with
    spatial padding, which grows the map by 2 px per side
    (reference: src/encoder.py:68-70).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .initializers import torch_default_bias_init, torch_default_kernel_init
from .resnet import ResNetCore, make_norm


def _conv(features, kernel, in_ch, padding, dtype, name):
    k = kernel[0] * kernel[1]
    return nn.Conv(
        features,
        kernel,
        padding=padding,
        kernel_init=torch_default_kernel_init(),
        bias_init=torch_default_bias_init(in_ch * k),
        dtype=dtype,
        name=name,
    )


class CNNEncoder(nn.Module):
    """5 convs (5,5,3,3,3) -> GAP -> FC(128). reference: src/encoder.py:9-57."""

    pos_embed: bool = False
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = 2 if self.pos_embed else 1
        x = _conv(8, (5, 5), in_ch, 1, self.dtype, "conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = _conv(32, (5, 5), 8, 1, self.dtype, "conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = _conv(64, (3, 3), 32, 1, self.dtype, "conv3")(x)
        x = nn.relu(x)
        x = _conv(128, (3, 3), 64, 1, self.dtype, "conv4")(x)
        x = nn.relu(x)
        x = _conv(128, (3, 3), 128, 1, self.dtype, "conv5")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = nn.Dense(
            self.embed_dim,
            dtype=jnp.float32,
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(128),
            name="fc",
        )(x)
        return x


class ResNetEncoder(nn.Module):
    """1x1(+pad) stem to 3ch + BN + ReLU, then ResNet-10 head to 128.

    reference: src/encoder.py:63-89 (stage_sizes [1,1,1,1], num_classes 128).
    """

    pos_embed: bool = False
    embed_dim: int = 128
    stage_sizes: tuple = (1, 1, 1, 1)
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool | None = None  # None = auto (space-to-depth conv1 on TPU)
    fused_bn: bool | str | None = None  # None = flax; True/'fused' = custom_vjp (negative result); 'lean' = bf16-read stats

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = 2 if self.pos_embed else 1
        x = nn.Conv(
            3,
            (1, 1),
            padding=1,  # quirk: spatial padding on a 1x1 conv (encoder.py:68)
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(in_ch),
            dtype=self.dtype,
            name="fc0",
        )(x)
        x = make_norm(self.fused_bn, train, self.dtype, "bn0")(x)
        x = nn.relu(x)
        x = ResNetCore(
            stage_sizes=self.stage_sizes,
            num_classes=self.embed_dim,
            dtype=self.dtype,
            s2d_stem=self.s2d_stem,
            fused_bn=self.fused_bn,
            name="model",
        )(x, train=train)
        return x


def create_model(model_id: int, pos_embed: bool, dtype=jnp.float32, **kwargs):
    """Integer model registry. reference: src/utils.py:15-22 (0=CNN, 1=ResNet).

    kwargs pass through to the encoder (e.g. s2d_stem for the ResNet)."""
    if model_id == 0:
        return CNNEncoder(pos_embed=pos_embed, dtype=dtype)
    if model_id == 1:
        return ResNetEncoder(pos_embed=pos_embed, dtype=dtype, **kwargs)
    raise ValueError(f"unknown model id {model_id} (0=CNN, 1=ResNet)")


def param_count(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))

"""Weight initializers matching PyTorch's defaults.

The reference trains from torch-default inits (uniform ±1/sqrt(fan_in) for
conv/linear weight+bias; reference: torch defaults used by src/encoder.py CNN
and src/unet.py) and torchvision's Kaiming-normal fan_out for the ResNet core
(reference: src/encoder.py:198-203). Reproducing the init families keeps
training dynamics comparable; bit-level weight parity comes from torch_import.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from flax import linen as nn

# Kaiming normal, fan_out, ReLU gain — torchvision ResNet convs.
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


def torch_default_kernel_init():
    """kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    """torch Conv2d/Linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_transposed_kernel_init(out_ch: int, kh: int, kw: int):
    """torch ConvTranspose2d weight default: kaiming_uniform(a=sqrt(5)),
    whose fan_in on the torch weight layout (in, out, kH, kW) is
    out*kH*kW — NOT flax's (kH, kW, in, out) fan_in of in*kH*kW, so the
    generic fan_in variance_scaling initializer would be off by the in/out
    channel ratio."""
    return torch_default_bias_init(out_ch * kh * kw)

"""Vertical positional-embedding channel for patch inputs.

Prepends a channel holding the normalized fast-time (depth) coordinate
`arange(H)/H - 0.5`, constant along the trace axis — making encoders
depth-aware. Channel order is [pe, data], matching the reference so imported
2-channel conv weights line up (reference: src/utils.py:76-90; the reference
hardcodes a CUDA transfer there, here it is a pure traced op).
"""

from __future__ import annotations

import jax.numpy as jnp


def pos_embed(x):
    """x: (..., h, w, 1) NHWC patches -> (..., h, w, 2) with pe prepended."""
    h = x.shape[-3]
    w = x.shape[-2]
    pe = jnp.arange(h, dtype=x.dtype) / h - 0.5
    pe = jnp.broadcast_to(pe[:, None, None], (*x.shape[:-3], h, w, 1))
    return jnp.concatenate([pe, x], axis=-1)


def maybe_pos_embed(x, enabled: bool):
    return pos_embed(x) if enabled else x

"""Bidirectional integration: merge forward and reverse propagation passes.

The reverse pass propagates from the LAST frame (`use_last`), and its
prediction is flipped back and merged into the forward map with
dataset-specific class priority masks
(reference: scripts/test/test_all.py:132-159, test_mc1.py:110-135,
test_mc3.py:136-160):

  * MCORDS1-style (test_mc1.py:129-134): reverse bedrock (2) overrides; then
    reverse noise (1) overrides where forward isn't bedrock.
  * MCORDS3-style (test_mc3.py:155-159): reverse bedrock (2) / inland ice (3)
    override only in columns with no floating ice (4) anywhere in the
    forward map.
  * test_all-style flat merges on the flattened map (per dataset id).
"""

from __future__ import annotations

import numpy as np


def reverse_unfold_flip(pred: np.ndarray, rg_len: int) -> np.ndarray:
    """Flip each rg_len-wide block of a concatenated prediction map back to
    forward orientation (reference: scripts/test/test_all.py:147-148)."""
    H, W = pred.shape
    nblocks = W // rg_len
    blocks = pred[:, : nblocks * rg_len].reshape(H, nblocks, rg_len)
    return blocks[:, :, ::-1].reshape(H, nblocks * rg_len)


def integrate_bidirectional(
    forward: np.ndarray,
    reverse: np.ndarray,
    style: str,
    bedrock: int = 2,
    noise: int = 1,
    inland_ice: int = 3,
    floating_ice: int = 4,
) -> np.ndarray:
    """Merge a reverse-pass map into the forward map. `reverse` must already
    be flipped back to forward orientation."""
    out = np.asarray(forward).copy()
    rev = np.asarray(reverse)
    if style == "mcords1":  # reference: test_mc1.py:129-134
        out[rev == bedrock] = bedrock
        mask2 = (rev == noise) & (forward != bedrock)
        out[mask2] = noise
    elif style == "mcords3":  # reference: test_mc3.py:155-159
        no_shelf = ~np.any(forward == floating_ice, axis=0, keepdims=True)
        no_shelf = np.broadcast_to(no_shelf, forward.shape)
        out[(rev == bedrock) & no_shelf] = bedrock
        out[(rev == inland_ice) & no_shelf] = inland_ice
    elif style == "bedrock_only":  # reference: test_all.py:150-151,156-158
        out[rev == bedrock] = bedrock
    else:
        raise ValueError(f"unknown integration style {style!r}")
    return out


def integrate_flat_mcords3(
    forward_flat: np.ndarray, reverse_map: np.ndarray, bedrock: int = 2,
    inland_ice_fwd_guard: int = 3, floating_ice: int = 4,
) -> np.ndarray:
    """test_all.py's Miguel merge on flattened maps: reverse bedrock wins
    where forward isn't inland ice AND the reverse column holds no floating
    ice (reference: scripts/test/test_all.py:152-155)."""
    out = np.asarray(forward_flat).copy()
    rev_flat = reverse_map.ravel()
    mask = (rev_flat == bedrock) & (out != inland_ice_fwd_guard)
    col_clear = np.all(reverse_map != floating_ice, axis=0)
    mask &= np.broadcast_to(col_clear[None, :], reverse_map.shape).ravel()
    out[mask] = bedrock
    return out

"""Horizontality cross-entropy metric + change-point signal.

The metric asks: does node n of frame t+1 attend (under temperature-softmax
affinity) back to node n of frame t? Low CE = horizontal layering; a rise
marks a change in the radargram's character. Feeds the xent heatmaps and the
PELT change-point detector (reference: src/utils.py:118-132,
scripts/test/heatmap.py:50-55).

Reference quirk: the reference computes the affinity with
`einsum('tnc,tmc->tnm', emb[:,:,:-1], emb[:,:,1:])` on a (T, N, C) tensor
(src/utils.py:118) — slicing the CHANNEL axis, not time, i.e. a within-frame
product between channel-shifted embeddings. The analogous training-loss code
slices time on a permuted layout (src/model.py:23-26), so this is almost
certainly an unported permute; the intended consecutive-frame metric is the
default here, and `quirk_channel_shift=True` reproduces the reference's
literal computation for output parity.

CE direction detail: the reference's propagate() transposes A before
cross_entropy with an identity target (src/utils.py:123), so the softmax
runs over the *source* axis for each target node — the default here
(`row_softmax=False`). The reference heatmap script instead feeds the
UNtransposed matrix (scripts/test/heatmap.py:55), a row-softmax CE;
`row_softmax=True` reproduces it (scripts/heatmap.py uses it by default).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("quirk_channel_shift", "row_softmax"))
def horizontality_xent(
    emb,
    tau: float = 0.1,
    quirk_channel_shift: bool = False,
    row_softmax: bool = False,
):
    """emb: (T, N, C) L2-normalized. Returns xent (N, T-1)."""
    T, N, C = emb.shape
    if quirk_channel_shift:
        A = (
            jnp.einsum(
                "tnc,tmc->tnm",
                emb[:, :, :-1],
                emb[:, :, 1:],
                preferred_element_type=jnp.float32,
            )
            / tau
        )[: T - 1]
    else:
        A = (
            jnp.einsum(
                "tnc,tmc->tnm",
                emb[:-1],
                emb[1:],
                preferred_element_type=jnp.float32,
            )
            / tau
        )
    # CE of column (default) or row of A[t] against target n:
    lse = jax.nn.logsumexp(A, axis=2 if row_softmax else 1)  # (T-1, N)
    diag = jnp.diagonal(A, axis1=1, axis2=2)  # (T-1, N)
    return (lse - diag).T  # (N, T-1)


@jax.jit
def column_diffs(xent):
    """Σ_n |xent[:, i] - xent[:, i+1]| — the 1-D change-point signal
    (reference: src/utils.py:125). xent: (N, T-1) -> (T-2,)."""
    return jnp.sum(jnp.abs(xent[:, :-1] - xent[:, 1:]), axis=0)

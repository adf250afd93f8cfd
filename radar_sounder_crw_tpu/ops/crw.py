"""Contrastive Random Walk objective — the training loss of the framework.

Semantics (capability match of reference src/model.py:15-46):

Given per-frame, per-patch embeddings E[b, t, n, :] (L2-normalized over the
channel axis), adjacent-frame affinities are

    A[b, t] = E[b, t] @ E[b, t+1]^T / tau            (N x N, t = 0..T-2)

For every palindrome depth k = 1..T-2 the walker takes the transition chain

    P_k = sm(A_0^T) sm(A_1^T) ... sm(A_{k-1}^T) sm(A_{k-1}) ... sm(A_1)

(`sm` = row-softmax) and pays a cycle-consistency cross-entropy against the
identity: loss_k = -mean_{b,i} log_softmax(P_k[b, i, :])[i]. The total loss
is (sum_k loss_k) / N.

Two reference quirks are intentionally preserved because they change the
optimum: (1) the *forward* transition of the first step, sm(A_0), is skipped
(the reference's inner loop starts at t=1, src/model.py:42), so each chain
has 2k-1 factors; (2) P_k — already a row-stochastic matrix — is passed to a
cross-entropy that applies *another* row-softmax (probabilities treated as
logits, src/model.py:45).

TPU-first design: the reference rebuilds every chain from scratch — an
O(T^2) serial bmm chain (src/model.py:35-44). Here chain k+1 reuses chain k's
prefix products:

    Bwd_{k+1} = Bwd_k @ sm(A_k^T),   Fwd_{k+1} = sm(A_k) @ Fwd_k,
    P_k = Bwd_k @ Fwd_k

giving 3 batched (N x N) matmuls per step of a single `lax.scan` — O(T)
MXU-friendly work with static shapes, no data-dependent control flow. The
products are associated differently than the reference's left fold, so
values agree to float tolerance, not bitwise; `palindrome_walk_loss_unrolled`
reproduces the reference association exactly for parity testing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_softmax(x):
    return jax.nn.softmax(x, axis=-1)


def _cycle_xent(P):
    """Per-item CE of each row of P against the identity, rows treated as
    logits (reference quirk, src/model.py:45). Returns (B,) — mean over rows;
    the batch mean equals the reference's mean over B*N."""
    lse = jax.nn.logsumexp(P, axis=-1)  # (B, N)
    diag = jnp.diagonal(P, axis1=-2, axis2=-1)  # (B, N)
    return jnp.mean(lse - diag, axis=-1)


def crw_affinity(emb, tau):
    """Adjacent-frame affinities. emb: (B, T, N, C) L2-normalized.

    Returns A: (B, T-1, N, N), A[b,t,n,m] = <emb[b,t,n], emb[b,t+1,m]>/tau.
    reference: src/model.py:26.
    """
    return (
        jnp.einsum(
            "btnc,btmc->btnm",
            emb[:, :-1],
            emb[:, 1:],
            preferred_element_type=jnp.float32,
        )
        / tau
    )


def palindrome_walk_loss(A, per_item: bool = False):
    """Palindrome cycle-consistency loss from affinities A (B, T-1, N, N).

    O(T) prefix-product scan. Returns the scalar loss (already divided by N,
    reference: src/model.py:46), or per-item (B,) losses with per_item=True
    (their mean equals the scalar — used for padded-batch weighting).
    T == 2 yields 0 (no palindrome depths).
    """
    B, Tm1, N, _ = A.shape
    if Tm1 < 2:  # T <= 2: reference loop body never runs
        zero = jnp.sum(A, axis=(1, 2, 3)) * 0.0  # keep grad defined
        return zero if per_item else jnp.sum(zero)

    S_f = _row_softmax(A)  # sm(A_t)
    S_b = _row_softmax(jnp.swapaxes(A, -1, -2))  # sm(A_t^T)

    # depth k=1: P_1 = sm(A_0^T)
    bwd0 = S_b[:, 0]
    fwd0 = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), (B, N, N))
    loss0 = _cycle_xent(bwd0)

    def step(carry, x):
        bwd, fwd = carry
        sf_j, sb_j = x
        bwd = jnp.einsum("bij,bjk->bik", bwd, sb_j, preferred_element_type=jnp.float32)
        fwd = jnp.einsum("bij,bjk->bik", sf_j, fwd, preferred_element_type=jnp.float32)
        P = jnp.einsum("bij,bjk->bik", bwd, fwd, preferred_element_type=jnp.float32)
        return (bwd, fwd), _cycle_xent(P)

    # depths k=2..T-2 consume transitions j=1..T-3
    xs = (
        jnp.swapaxes(S_f[:, 1 : Tm1 - 1], 0, 1),  # (T-3, B, N, N)
        jnp.swapaxes(S_b[:, 1 : Tm1 - 1], 0, 1),
    )
    (_, _), losses = jax.lax.scan(step, (bwd0, fwd0), xs)  # (T-3, B)
    per = (loss0 + jnp.sum(losses, axis=0)) / N  # (B,)
    return per if per_item else jnp.mean(per)


def palindrome_walk_loss_unrolled(A):
    """Reference-association variant: rebuilds each depth-k chain as a strict
    left fold sm(AA_k[2k-1]) @ ... @ sm(AA_k[1]) @ I, exactly like the
    reference's nested loops (src/model.py:35-45). O(T^2); used for parity
    tests and as a drop-in when bit-level agreement with the reference's
    association order matters more than speed.
    """
    B, Tm1, N, _ = A.shape
    T = Tm1 + 1
    S_f = _row_softmax(A)
    S_b = _row_softmax(jnp.swapaxes(A, -1, -2))
    eye = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), (B, N, N))

    loss = jnp.zeros((), dtype=A.dtype)
    for k in range(1, T - 1):
        # chain factors, applied left-multiplicatively in this order:
        # forward A_1..A_{k-1}, then backward A_{k-1}^T..A_0^T
        P = eye
        for j in range(1, k):
            P = jnp.einsum("bij,bjk->bik", S_f[:, j], P)
        for j in range(k - 1, -1, -1):
            P = jnp.einsum("bij,bjk->bik", S_b[:, j], P)
        loss = loss + jnp.mean(_cycle_xent(P))
    return loss / N


def crw_loss(
    emb, tau, only_a: bool = False, unrolled: bool = False, per_item: bool = False
):
    """Full CRW objective from raw (un-normalized) embeddings.

    emb: (B, T, N, C). Returns (loss, A) — A being the pre-softmax affinities
    the analysis pipeline reuses (reference: src/model.py:26-46). per_item
    returns (B,) losses whose mean is the scalar loss (padded-batch support).
    With only_a=True, returns A ALONE (no tuple — mirrors the reference's
    only_a branch, src/model.py:27-28).
    """
    # x * rsqrt(max(sumsq, eps)) instead of x / ||x||.clip(eps): the norm's
    # vjp at an exactly-zero row is 0/0 = NaN, which 0-cotangents still
    # propagate — zero-padded placeholder rows must not poison the batch grad
    sumsq = jnp.sum(jnp.square(emb), axis=-1, keepdims=True)
    emb = emb * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-24))
    A = crw_affinity(emb, tau)
    if only_a:
        return A
    if unrolled:
        return palindrome_walk_loss_unrolled(A), A
    return palindrome_walk_loss(A, per_item=per_item), A

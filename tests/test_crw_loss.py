"""CRW palindrome-walk loss: golden tests against an independent torch
implementation of the documented objective (values and gradients), plus
internal consistency of the O(T) prefix-product form vs the literal O(T^2)
left-fold association."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from radar_sounder_crw_tpu.ops import (
    crw_loss,
    palindrome_walk_loss,
    palindrome_walk_loss_unrolled,
)


def torch_crw_loss(emb_np, tau):
    """Independent oracle written from the objective's math spec:
    chains sm(A_0^T)..sm(A_{k-1}^T) sm(A_{k-1})..sm(A_1), CE of each row of
    the product (as logits) against the identity, summed over k, / N."""
    emb = torch.tensor(emb_np, dtype=torch.float64, requires_grad=True)
    e = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    B, T, N, C = e.shape
    A = torch.einsum("btnc,btmc->btnm", e[:, :-1], e[:, 1:]) / tau
    total = torch.zeros((), dtype=torch.float64)
    for k in range(1, T - 1):
        factors = []  # applied right-to-left; build the explicit list
        for j in range(1, k):
            factors.append(A[:, j])  # forward transitions (skip j=0)
        for j in range(k - 1, -1, -1):
            factors.append(A[:, j].transpose(-1, -2))  # backward
        P = torch.eye(N, dtype=torch.float64).expand(B, N, N)
        for F_ in factors:
            P = torch.bmm(torch.softmax(F_, dim=-1), P)
        logp = torch.log_softmax(P, dim=-1)
        total = total - logp.diagonal(dim1=-2, dim2=-1).mean()
    loss = total / N
    loss.backward()
    return loss.item(), emb.grad.numpy(), A.detach().numpy()


@pytest.mark.parametrize("B,T,N,C", [(2, 8, 12, 16), (1, 3, 5, 8), (3, 4, 7, 4)])
def test_loss_and_grad_match_torch(B, T, N, C):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((B, T, N, C)).astype(np.float32)
    tau = 0.07

    want_loss, want_grad, want_A = torch_crw_loss(emb, tau)

    def jax_loss(e):
        loss, _ = crw_loss(e, tau)
        return loss

    got_loss, got_grad = jax.value_and_grad(jax_loss)(jnp.asarray(emb))
    np.testing.assert_allclose(float(got_loss), want_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_grad), want_grad, rtol=2e-3, atol=1e-5)

    _, got_A = crw_loss(jnp.asarray(emb), tau)
    np.testing.assert_allclose(np.asarray(got_A), want_A, rtol=1e-4, atol=1e-5)


def test_prefix_scan_equals_unrolled():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((2, 19, 16, 16)).astype(np.float32))
    a = palindrome_walk_loss(A)
    b = palindrome_walk_loss_unrolled(A)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)

    ga = jax.grad(lambda x: palindrome_walk_loss(x))(A)
    gb = jax.grad(lambda x: palindrome_walk_loss_unrolled(x))(A)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=1e-6)


def test_t2_gives_zero():
    A = jnp.ones((2, 1, 4, 4))
    assert float(palindrome_walk_loss(A)) == 0.0


def test_identity_affinity_beats_uniform():
    N = 8
    eye = jnp.broadcast_to(jnp.eye(N) * 10.0, (1, 9, N, N))
    uniform = jnp.zeros((1, 9, N, N))
    assert float(palindrome_walk_loss(eye)) < float(palindrome_walk_loss(uniform))


def test_only_a_mode():
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((1, 4, 6, 8)).astype(np.float32))
    A = crw_loss(emb, 0.1, only_a=True)
    assert A.shape == (1, 3, 6, 6)
    # only_a must return the SAME affinities the tupled path computes
    # (reference: model.py:27-28 returns A from the identical einsum/tau)
    _, A_full = crw_loss(emb, 0.1)
    np.testing.assert_array_equal(np.asarray(A), np.asarray(A_full))


def test_zero_embedding_row_keeps_gradients_finite():
    """An exactly-zero embedding row (e.g. zero-padded placeholder items)
    must not poison the whole batch's gradient: x/||x||.clip(eps) has a NaN
    vjp at 0 (0/0 through the norm), which the rsqrt(max(sumsq, eps)) form
    avoids."""
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    emb[0, 1, 2, :] = 0.0
    g = jax.grad(lambda e: crw_loss(e, 0.07)[0])(jnp.asarray(emb))
    assert np.isfinite(np.asarray(g)).all()


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(3)
    embs = jnp.asarray(rng.standard_normal((3, 2, 6, 10, 8)).astype(np.float32))
    f = jax.jit(lambda e: crw_loss(e, 0.05)[0])
    # vmap over an outer group axis must equal the per-group loop
    vmapped = jax.jit(jax.vmap(lambda e: crw_loss(e, 0.05)[0]))(embs)
    looped = np.asarray([float(f(e)) for e in embs])
    np.testing.assert_allclose(np.asarray(vmapped), looped, rtol=1e-5)

"""Cross-implementation equivalence of the CRW objective against the
UPSTREAM training-loss code itself (reference src/model.py, imported
read-only with its unavailable deps stubbed and 'cuda' neutralized).

Both sides get the same tiny linear 'encoder' with identical weights; loss
values, affinities, and encoder-weight gradients must agree to float
tolerance. This pins the palindrome-walk semantics (skip-first-forward-step,
CE-on-probability-products, /N) to the reference beyond the independently
written torch oracle in test_crw_loss.py.

Skipped when the reference tree is absent.
"""

import numpy as np
import pytest

from _reference_runtime import (
    cuda_neutralized,
    import_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)


def run_reference_crw(seq_np, weight, tau):
    """Drive the upstream CRW loss on CPU torch (shared harness:
    _reference_runtime installs the dep stubs and neutralizes 'cuda' —
    model.py's `from torch import zeros` binding is captured at import)."""
    import torch

    ref_model = import_reference("model")
    with cuda_neutralized():

        class LinearEncoder(torch.nn.Module):
            def __init__(self, w):
                super().__init__()
                self.w = torch.nn.Parameter(torch.tensor(w))

            def forward(self, x):  # x: (BTN, 1, H, W)
                return x.flatten(1) @ self.w

        enc = LinearEncoder(weight)
        crw = ref_model.CRW(enc, tau, pos_embed=False)
        seq = torch.tensor(seq_np)
        loss, A = crw(seq)
        loss.backward()
        return (
            float(loss.detach()),
            A.detach().numpy(),
            enc.w.grad.numpy(),
        )


@pytest.mark.parametrize("B,T,N,H,W,tau", [(2, 6, 8, 5, 4, 0.05), (1, 4, 6, 4, 4, 0.2)])
def test_crw_loss_matches_upstream(B, T, N, H, W, tau):
    import jax
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.ops import crw_loss

    rng = np.random.default_rng(7)
    seq = rng.standard_normal((B, T, N, H, W)).astype(np.float32)
    weight = (0.1 * rng.standard_normal((H * W, 12))).astype(np.float32)

    want_loss, want_A, want_grad = run_reference_crw(seq, weight, tau)

    def ours(w):
        emb = seq.reshape(B * T * N, H * W) @ w
        loss, A = crw_loss(emb.reshape(B, T, N, -1), tau)
        return loss, A

    (got_loss, got_A), got_grad = jax.value_and_grad(ours, has_aux=True)(
        jnp.asarray(weight)
    )
    np.testing.assert_allclose(float(got_loss), want_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_A), want_A, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_grad), want_grad, rtol=2e-3, atol=1e-5)

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

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _stub_modules():
    """Stub deps of reference utils.py that this image doesn't ship."""
    rpt = types.ModuleType("ruptures")
    rpt.Pelt = None
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = None
    tvt.InterpolationMode = types.SimpleNamespace(NEAREST=None)
    tv.transforms = tvt
    sys.modules.setdefault("ruptures", rpt)
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)


def run_reference_crw(seq_np, weight, tau):
    import torch

    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    orig_zeros = torch.zeros

    def patched_zeros(*args, **kwargs):
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_zeros(*args, **kwargs)

    torch.zeros = patched_zeros
    try:
        for mod in ("model", "utils", "dataset", "encoder"):
            sys.modules.pop(mod, None)
        import model as ref_model  # noqa: E402

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
    finally:
        torch.zeros = orig_zeros


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

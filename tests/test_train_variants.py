"""Trainer variants: bfloat16 encoder compute, activation rematerialization,
and pos-embed training must all converge like the float32 baseline."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer


def tiny_dataset():
    rg, _ = synthetic_radargram(H=88, W=560, seed=8)
    return RGWindows(rg, length=5, dim=(16, 16), overlap=(8, 0))


@pytest.mark.parametrize(
    "kw",
    [
        {"dtype": jnp.bfloat16},
        {"remat": True},
        {"pos_embed": True},
    ],
    ids=["bf16", "remat", "pos_embed"],
)
def test_variant_trains(kw):
    ds = tiny_dataset()
    cfg = CRWTrainConfig(
        model=0, batch_size=8, epochs=2, lr=2e-3, tau=0.05, **kw
    )
    trainer = CRWTrainer(cfg)
    hist = trainer.fit(ds, log=lambda s: None)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_remat_matches_no_remat():
    """Rematerialization must not change the computed loss/gradients."""
    ds = tiny_dataset()
    batch = np.stack([ds[i] for i in range(4)])
    a = CRWTrainer(CRWTrainConfig(model=0, batch_size=4, lr=1e-3, tau=0.05, remat=False))
    b = CRWTrainer(CRWTrainConfig(model=0, batch_size=4, lr=1e-3, tau=0.05, remat=True))
    a.init_state(ds[0].shape)
    b.init_state(ds[0].shape)
    la = float(a.train_step(batch))
    lb = float(b.train_step(batch))
    np.testing.assert_allclose(la, lb, rtol=1e-6)

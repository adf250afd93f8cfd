"""ASHA tuner behavior + UNet trainer end-to-end on tiny synthetic strips."""

import numpy as np

from radar_sounder_crw_tpu.train.tune import run_asha, sample_configs
from radar_sounder_crw_tpu.train.unet_trainer import (
    UNetTrainConfig,
    UNetTrainer,
    train_test_split,
    unfold_strips,
)
from radar_sounder_crw_tpu.data import synthetic_radargram


def test_sample_configs_deterministic():
    space = {"lr": [1e-2, 1e-3], "tau": [0.1, 0.01, 0.001]}
    a = sample_configs(space, 5, seed=3)
    b = sample_configs(space, 5, seed=3)
    assert a == b
    assert all(c["lr"] in space["lr"] and c["tau"] in space["tau"] for c in a)


def test_asha_promotes_better_configs():
    """Trials whose 'loss' is their config value: ASHA must pick the min and
    early-stop the rest."""
    space = {"quality": [1.0, 2.0, 3.0, 4.0]}
    trainers = []

    class FakeTrainer:
        def __init__(self, q):
            self.q = q
            self.epochs = 0

    def make_trainer(config):
        t = FakeTrainer(config["quality"])
        trainers.append(t)
        return t

    def train_epoch(trainer):
        trainer.epochs += 1
        return trainer.q

    best = run_asha(
        make_trainer, train_epoch, space,
        num_samples=8, max_t=4, grace_period=1, reduction_factor=2,
        seed=0, log=lambda s: None,
    )
    assert best.config["quality"] == min(t.q for t in trainers)
    # survivors must train all the way to max_t; losers are stopped early
    assert best.epochs_done == 4
    assert max(t.epochs for t in trainers) == 4
    assert min(t.epochs for t in trainers) < 4


def test_unet_trains_and_predicts():
    rg, seg = synthetic_radargram(H=64, W=512, nclasses=5, seed=5)
    x, y = unfold_strips(rg, seg, strip_w=32, n_classes=5)
    assert x.shape == (16, 64, 32, 1) and y.shape == (16, 64, 32, 5)

    tr, te = train_test_split(len(x), 0.75, seed=11)
    assert len(tr) == 12 and len(te) == 4 and not set(tr) & set(te)

    # standard CE (quirk off) for the learning assertion — the reference's
    # double-softmax quirk needs many more epochs to move
    cfg = UNetTrainConfig(
        batch_size=8, epochs=5, lr=3e-3, n_classes=5, quirk_double_softmax=False
    )
    trainer = UNetTrainer(cfg)
    hist = trainer.fit(x[tr], y[tr], log=lambda s: None)
    assert hist[-1] < hist[0]
    pred = trainer.predict(x[te])
    assert pred.shape == (4, 64, 32)
    acc = (pred == y[te].argmax(-1)).mean()
    assert acc > 0.4, f"unet accuracy {acc} too low"


def test_unet_quirk_flag_changes_loss():
    rg, seg = synthetic_radargram(H=32, W=128, nclasses=5, seed=6)
    x, y = unfold_strips(rg, seg, strip_w=32, n_classes=5)
    a = UNetTrainer(UNetTrainConfig(batch_size=4, epochs=1, quirk_double_softmax=True))
    b = UNetTrainer(UNetTrainConfig(batch_size=4, epochs=1, quirk_double_softmax=False))
    la = a.fit(x, y, log=lambda s: None)[-1]
    lb = b.fit(x, y, log=lambda s: None)[-1]
    assert la != lb  # the quirk measurably changes the objective

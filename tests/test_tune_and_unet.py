"""ASHA tuner behavior + UNet trainer end-to-end on tiny synthetic strips."""

import numpy as np
import pytest

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


def test_asha_parallel_trials_on_mesh():
    """One trial per device on the 8-virtual-device mesh: >=2 trials advance
    concurrently on distinct devices, and the best-trial selection is
    unchanged vs the sequential schedule (VERDICT r1 #6)."""
    import time

    import jax

    space = {"quality": [1.0, 2.0, 3.0, 4.0, 5.0]}

    class SleepTrainer:
        def __init__(self, q, mesh):
            self.q = q
            self.mesh = mesh

    def make_trainer(config, mesh=None):
        return SleepTrainer(config["quality"], mesh)

    def train_epoch(trainer):
        time.sleep(0.05)  # releases the GIL like XLA execution does
        return trainer.q

    kw = dict(
        space=space, num_samples=8, max_t=4, grace_period=1,
        reduction_factor=2, seed=0, log=lambda s: None,
    )
    best_seq = run_asha(make_trainer, train_epoch, **kw)
    best_par = run_asha_recorded(
        make_trainer, train_epoch, devices=jax.devices(), **kw
    )
    assert best_par.config == best_seq.config
    assert best_par.losses == best_seq.losses

    # trainers were pinned to >= 2 distinct single-device meshes
    assert jax.device_count() >= 2
    assert best_par.trainer.mesh is not None
    # concurrency: some pair of rung executions on different devices overlap
    windows = []
    for t in _all_trials_of_last_run:
        windows += [(a, b, d) for (a, b, d) in t.rung_windows]
    overlap = any(
        d1 != d2 and a1 < b2 and a2 < b1
        for i, (a1, b1, d1) in enumerate(windows)
        for (a2, b2, d2) in windows[i + 1 :]
    )
    devs_used = {d for (_, _, d) in windows}
    assert len(devs_used) >= 2, f"devices used: {devs_used}"
    assert overlap, "no two trials overlapped in time"


# captures the trial list of its run_asha call (for the concurrency and
# promotion-resume assertions) — used EXPLICITLY by the tests that inspect
# trials, so plain run_asha calls stay uninstrumented
_all_trials_of_last_run: list = []


def run_asha_recorded(*a, **kw):
    import radar_sounder_crw_tpu.train.tune as tune_mod

    orig_trial = tune_mod.Trial
    created: list = []

    class RecordingTrial(orig_trial):
        def __init__(self, *ta, **tkw):
            super().__init__(*ta, **tkw)
            created.append(self)

    tune_mod.Trial = RecordingTrial
    try:
        best = run_asha(*a, **kw)
    finally:
        tune_mod.Trial = orig_trial
    _all_trials_of_last_run[:] = created
    return best


def test_asha_checkpoint_and_resume_after_kill(tmp_path):
    """A killed sweep resumes from per-trial orbax checkpoints: completed
    rungs are not retrained and trainer state round-trips (VERDICT r1 #6)."""
    import numpy as np
    import pytest

    space = {"quality": [1.0, 2.0, 3.0, 4.0]}
    epoch_calls = {"n": 0}

    class StatefulTrainer:
        def __init__(self, q, mesh=None):
            self.q = q
            # orbax-checkpointable state; epochs counted INSIDE state so a
            # successful restore is observable
            self.state = {
                "epochs": np.zeros((), np.int32),
                "q": np.asarray(q, np.float32),
            }

    def make_trainer(config, mesh=None):
        return StatefulTrainer(config["quality"], mesh)

    def train_epoch(trainer):
        epoch_calls["n"] += 1
        trainer.state = dict(trainer.state, epochs=trainer.state["epochs"] + 1)
        return float(trainer.state["q"]) + 1.0 / float(trainer.state["epochs"] + 1)

    def crashing_epoch(trainer):
        if epoch_calls["n"] >= 5:
            raise RuntimeError("simulated kill")
        return train_epoch(trainer)

    ckpt = str(tmp_path / "sweep")
    kw = dict(
        space=space, num_samples=6, max_t=4, grace_period=1,
        reduction_factor=2, seed=1, log=lambda s: None, checkpoint_dir=ckpt,
    )
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_asha(make_trainer, crashing_epoch, **kw)
    calls_before = epoch_calls["n"]
    assert calls_before == 5

    # resume: finishes the sweep; the 5 completed-and-checkpointed epochs of
    # rung 1 are NOT retrained (only the 6th trial's rung-1 epoch reruns,
    # then later rungs train normally)
    best = run_asha(make_trainer, train_epoch, **kw)
    resumed_calls = epoch_calls["n"] - calls_before
    assert best.config["quality"] == 1.0
    assert best.epochs_done == 4
    # epochs trained after resume: 1 (redo crashed trial's rung 1; the 5
    # checkpointed ones are restored) + survivors' later rungs
    control = {"n": 0}

    def fresh_epoch(trainer):
        control["n"] += 1
        return train_epoch(trainer)

    # a from-scratch control sweep trains 6 rung-1 epochs + the later rungs;
    # the resumed sweep must have saved the 5 checkpointed epochs
    best_c = run_asha(
        make_trainer, fresh_epoch, space=space, num_samples=6, max_t=4,
        grace_period=1, reduction_factor=2, seed=1, log=lambda s: None,
        checkpoint_dir=str(tmp_path / "control"),
    )
    assert best_c.config == best.config and best_c.losses == best.losses
    assert resumed_calls == control["n"] - 5

    # a second resume of a COMPLETED sweep retrains nothing
    calls2 = epoch_calls["n"]
    best2 = run_asha(make_trainer, train_epoch, **kw)
    assert epoch_calls["n"] == calls2
    assert best2.config == best.config and best2.losses == best.losses


def test_asha_resume_with_lazy_state_trainer(tmp_path):
    """Real trainers (CRWTrainer/UNetTrainer) create their TrainState lazily
    on the first fit() — a resumed sweep restores into freshly-built
    trainers whose state is still None, so the restore must rebuild the
    template via init_state from the recorded init shape instead of failing
    on healthy checkpoints."""
    space = {"quality": [1.0, 2.0, 3.0]}
    calls = {"n": 0}

    class LazyTrainer:
        def __init__(self, q):
            self.q = q
            self.state = None

        def init_state(self, shape):
            self._init_shape = tuple(shape)  # same contract as the trainers
            self.state = {
                "epochs": np.zeros((), np.int32),
                "q": np.asarray(self.q, np.float32),
            }
            return self.state

    def make_trainer(config):
        return LazyTrainer(config["quality"])

    def train_epoch(trainer):
        if trainer.state is None:  # like fit(dataset[0].shape)
            trainer.init_state((4, 5))
        calls["n"] += 1
        trainer.state = dict(trainer.state, epochs=trainer.state["epochs"] + 1)
        return float(trainer.state["q"])

    def crashing_epoch(trainer):
        if calls["n"] >= 4:
            raise RuntimeError("simulated kill")
        return train_epoch(trainer)

    kw = dict(
        space=space, num_samples=4, max_t=3, grace_period=1,
        reduction_factor=2, seed=2, log=lambda s: None,
        checkpoint_dir=str(tmp_path / "sweep"),
    )
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_asha(make_trainer, crashing_epoch, **kw)
    best = run_asha(make_trainer, train_epoch, **kw)  # must not raise
    assert best.epochs_done == 3
    # the survivor's state came through restore + continued training
    assert int(best.trainer.state["epochs"]) == 3


def test_asha_validates_schedule_params():
    """reduction_factor <= 1 made _rung_ladder loop forever; the parameters
    are now validated up front."""
    noop = lambda *a, **k: None  # noqa: E731
    with pytest.raises(ValueError, match="reduction_factor"):
        run_asha(noop, noop, {"a": [1]}, reduction_factor=1)
    with pytest.raises(ValueError, match="grace_period"):
        run_asha(noop, noop, {"a": [1]}, grace_period=0)
    with pytest.raises(ValueError, match="grace_period"):
        run_asha(noop, noop, {"a": [1]}, grace_period=5, max_t=3)


def test_asha_resume_after_promotion_does_not_reprune(tmp_path):
    """A sweep killed AFTER a promotion was applied and saved must resume
    into the NEXT rung — not replay the rung loop from the top and re-apply
    promotion pruning to the already-promoted survivor set (which would
    kill trials the fresh schedule trains to max_t)."""
    import pytest

    space = {"quality": [1.0, 2.0, 3.0, 4.0]}
    epoch_calls = {"n": 0}

    class StatefulTrainer:
        def __init__(self, q, mesh=None):
            import numpy as np

            self.q = q
            self.state = {"epochs": np.zeros((), np.int32), "q": np.asarray(q, np.float32)}

    def make_trainer(config, mesh=None):
        return StatefulTrainer(config["quality"], mesh)

    def train_epoch(trainer):
        epoch_calls["n"] += 1
        trainer.state = dict(trainer.state, epochs=trainer.state["epochs"] + 1)
        return float(trainer.state["q"])

    def crashing_epoch(trainer):
        # rungs [1,2,4] with 4 trials: rung 1 = 4 epochs, promotion 4->2,
        # crash on the 5th call = during rung 2, AFTER the rung-1 promotion
        # was applied and written to sweep.json
        if epoch_calls["n"] >= 5:
            raise RuntimeError("simulated kill")
        return train_epoch(trainer)

    kw = dict(
        space=space, num_samples=4, max_t=4, grace_period=1,
        reduction_factor=2, seed=3, log=lambda s: None,
        checkpoint_dir=str(tmp_path / "sweep"),
    )
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_asha(make_trainer, crashing_epoch, **kw)

    best = run_asha_recorded(make_trainer, train_epoch, **kw)
    trials = list(_all_trials_of_last_run)
    # both rung-1 survivors must have trained past the rung-1 budget; a
    # replayed promotion would have pruned one of them at epochs_done == 1
    past_rung1 = [t for t in trials if t.epochs_done >= 2]
    assert len(past_rung1) == 2, (
        f"expected both promoted trials to keep training, got "
        f"{[(t.config, t.epochs_done, t.alive) for t in trials]}"
    )
    assert best.epochs_done == 4
    assert best.config["quality"] == min(t.config["quality"] for t in trials)


def test_tune_config_json_roundtrip_preserves_types():
    """Tuples and lists in trial configs survive the sweep-ledger JSON
    round-trip with their types intact (a plain list must NOT come back as
    a tuple)."""
    from radar_sounder_crw_tpu.train.tune import _listify, _tuplify

    cfg = {
        "patch": (16, 16),
        "dims": [16, 32],
        "nested": ([1, 2], (3, 4)),
        "lr": 1e-3,
        "name": "x",
    }
    import json

    back = {k: _tuplify(v) for k, v in json.loads(
        json.dumps({k: _listify(v) for k, v in cfg.items()})
    ).items()}
    assert back == cfg
    assert isinstance(back["patch"], tuple)
    assert isinstance(back["dims"], list)
    assert isinstance(back["nested"][0], list) and isinstance(back["nested"][1], tuple)


def test_trial_checkpoint_bundles_loss_history(tmp_path):
    """The per-trial orbax payload carries the loss history atomically with
    the TrainState: restoring after a crash that left the global ledger
    stale recovers BOTH the epoch count and the matching losses (no
    skipped-epoch misalignment)."""
    import numpy as np

    from radar_sounder_crw_tpu.train.tune import (
        Trial,
        _restore_trial_state,
        _save_trial_state,
    )

    class Tr:
        state = {"w": np.ones((2,), np.float32) * 7}

    t = Trial(config={"q": 1}, trainer=Tr())
    t.losses = [0.5, 0.25]
    t.epoch_times = [1.0, 2.0]
    t.epochs_done = 2
    _save_trial_state(str(tmp_path), 0, t, max_t=4)

    # stale ledger: pretend sweep.json only recorded epoch 1
    t2 = Trial(config={"q": 1}, trainer=Tr())
    t2.losses = [0.5]
    t2.epoch_times = [1.0]
    t2.epochs_done = 1
    assert _restore_trial_state(str(tmp_path), 0, t2, max_t=4)
    assert t2.epochs_done == 2
    assert t2.losses == [0.5, 0.25]
    assert t2.epoch_times == [1.0, 2.0]
    np.testing.assert_array_equal(t2.trainer.state["w"], np.ones((2,)) * 7)


@pytest.mark.parametrize("bilinear", [True, False])
def test_unet_weight_import_matches_reference(bilinear):
    """Weights saved by the reference UNet (torch nn.Sequential naming:
    'inc.double_conv.0', 'down1.maxpool_conv.1.double_conv.3',
    'up1.conv.double_conv.1', 'up1.up' (ConvTranspose branch), 'outc.conv'
    — reference src/unet.py) import into this package's flax UNet and
    produce the same logits; the export direction emits a state_dict the
    reference model accepts with no unexpected keys. bilinear=False pins
    the ConvTranspose layout AND the spatial kernel flip flax's
    cross-correlation transpose needs vs torch's convolution transpose."""
    import jax
    import jax.numpy as jnp
    import pytest
    import torch

    from _reference_runtime import import_reference, reference_available

    if not reference_available():
        pytest.skip("reference repo not present")

    from radar_sounder_crw_tpu.models.torch_import import (
        export_state_dict,
        import_state_dict,
    )
    from radar_sounder_crw_tpu.models.unet import UNet

    ref_unet = import_reference("unet")
    tnet = ref_unet.UNet(1, 5, bilinear=bilinear)
    tnet.eval()
    with torch.no_grad():  # non-trivial running stats so eval BN matters
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    variables = import_state_dict(tnet.state_dict())
    fnet = UNet(n_channels=1, n_classes=5, bilinear=bilinear)
    x = np.random.default_rng(0).standard_normal((2, 64, 32, 1)).astype(np.float32)
    ours = np.asarray(
        fnet.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    )
    with torch.no_grad():
        theirs = (
            tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)

    # export round-trip: the reference must accept every exported key
    sd = {
        k: torch.from_numpy(v.copy()) for k, v in export_state_dict(variables).items()
    }
    missing, unexpected = tnet.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing)


def test_unet_partial_batch_batchnorm_exact():
    """UNet partial batches run replicated instead of padded with
    duplicated rows, so train-mode BatchNorm statistics match the
    single-device unpadded run exactly — same policy as CRWTrainer."""
    import jax

    from radar_sounder_crw_tpu.parallel import make_mesh
    from radar_sounder_crw_tpu.train.unet_trainer import (
        UNetTrainConfig,
        UNetTrainer,
        unfold_strips,
    )

    rg, seg = synthetic_radargram(H=32, W=160, nclasses=4, seed=9)
    x, y = unfold_strips(rg, seg, strip_w=16, n_classes=4)  # 10 strips
    cfg = UNetTrainConfig(
        batch_size=6, epochs=1, lr=1e-3, n_classes=4, seed=11
    )
    t1 = UNetTrainer(cfg, mesh=make_mesh(jax.devices()[:1]))
    t8 = UNetTrainer(cfg, mesh=make_mesh(jax.devices()))
    # 10 strips, batch 6 -> batches of 6 and 4; 4 % 8 != 0 exercises the
    # replicated partial path on the 8-device mesh
    h1 = t1.fit(x, y, log=lambda s: None)
    h8 = t8.fit(x, y, log=lambda s: None)
    np.testing.assert_allclose(h1, h8, rtol=1e-5)
    s1 = jax.device_get(t1.state.batch_stats)
    s8 = jax.device_get(t8.state.batch_stats)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_unet_trains_and_predicts():
    rg, seg = synthetic_radargram(H=64, W=512, nclasses=5, seed=5)
    x, y = unfold_strips(rg, seg, strip_w=32, n_classes=5)
    assert x.shape == (16, 64, 32, 1) and y.shape == (16, 64, 32, 5)

    tr, te = train_test_split(len(x), 0.75, seed=11)
    assert len(tr) == 12 and len(te) == 4 and not set(tr) & set(te)

    # standard CE (quirk off) for the learning assertion — the reference's
    # double-softmax quirk needs many more epochs to move. 10 epochs (20
    # steps): eval runs on BN RUNNING stats (momentum 0.9), which need ~20
    # steps to converge; the old 5-epoch threshold only passed because the
    # padded partial batch duplicated rows into the BN statistics
    cfg = UNetTrainConfig(
        batch_size=8, epochs=10, lr=3e-3, n_classes=5, quirk_double_softmax=False
    )
    trainer = UNetTrainer(cfg)
    hist = trainer.fit(x[tr], y[tr], log=lambda s: None)
    assert hist[-1] < hist[0]
    pred = trainer.predict(x[te])
    assert pred.shape == (4, 64, 32)
    acc = (pred == y[te].argmax(-1)).mean()
    assert acc > 0.4, f"unet accuracy {acc} too low"


def test_unet_resident_matches_host_path():
    """Device-resident strip training (batch gathered on-device from the
    once-uploaded stack, one-hot rebuilt in-step) must match the host
    per-batch-upload path; soft labels fall back to the host path in auto
    mode and are rejected under device_resident=True."""
    rg, seg = synthetic_radargram(H=32, W=160, nclasses=4, seed=9)
    x, y = unfold_strips(rg, seg, strip_w=16, n_classes=4)
    base = dict(batch_size=6, epochs=2, lr=1e-3, n_classes=4, seed=11)
    losses = {}
    for mode in (False, True):
        t = UNetTrainer(UNetTrainConfig(**base, device_resident=mode))
        losses[mode] = t.fit(x, y, log=lambda s: None)
        # second fit on the same arrays reuses the cached upload
        if mode:
            assert t._resident_data[0] is x
            t.fit(x, y, log=lambda s: None)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6, atol=1e-7)

    y_soft = (y * 0.9 + 0.025).astype(np.float32)  # not exactly one-hot
    auto = UNetTrainer(UNetTrainConfig(**base))
    h = auto.fit(x, y_soft, log=lambda s: None)  # auto mode: host fallback
    assert len(h) == 2 and not hasattr(auto, "_resident_data")
    strict = UNetTrainer(UNetTrainConfig(**base, device_resident=True))
    with pytest.raises(ValueError, match="one-hot"):
        strict.fit(x, y_soft, log=lambda s: None)


def test_unet_quirk_flag_changes_loss():
    rg, seg = synthetic_radargram(H=32, W=128, nclasses=5, seed=6)
    x, y = unfold_strips(rg, seg, strip_w=32, n_classes=5)
    a = UNetTrainer(UNetTrainConfig(batch_size=4, epochs=1, quirk_double_softmax=True))
    b = UNetTrainer(UNetTrainConfig(batch_size=4, epochs=1, quirk_double_softmax=False))
    la = a.fit(x, y, log=lambda s: None)[-1]
    lb = b.fit(x, y, log=lambda s: None)[-1]
    assert la != lb  # the quirk measurably changes the objective

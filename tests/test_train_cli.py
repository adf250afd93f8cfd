"""CLI wiring tests for scripts/train.py: the ASHA tune path end-to-end on a
tiny injected search space + synthetic dataset."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest


def load_train_script():
    scripts = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(scripts, "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tune_path_runs(monkeypatch):
    import radar_sounder_crw_tpu.data as data_mod
    from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram

    rg, _ = synthetic_radargram(H=80, W=400, seed=12)

    def tiny_dataset(id, length, dim, overlap, full=False, flip=False):
        return RGWindows(rg, length=length, dim=dim, overlap=overlap)

    monkeypatch.setattr(data_mod, "create_dataset", tiny_dataset)

    train_cli = load_train_script()
    args = types.SimpleNamespace(
        tune=True, tune_samples=3, tune_dataset=0, tune_model=0,
        tune_seq_length=4, seed=11, tune_sequential=False, tune_ckpt_dir=None,
    )
    space = {
        "batch_size": [4],
        "lr": [1e-2, 1e-3],
        "tau": [0.1, 0.05],
        "patch_size": [(16, 16)],
        "overlap": [(8, 0)],
        "pos_embed": [False],
    }
    best = train_cli.tune_main(args, space=space)
    assert best.losses and np.isfinite(best.last_loss)
    assert best.config["lr"] in space["lr"]

"""Data IO round-trips (.pt/.npy ingestion) and multi-radargram concatenation."""

import numpy as np
import pytest
import torch

from radar_sounder_crw_tpu.data import (
    ConcatWindows,
    RGWindows,
    load_radargram,
    synthetic_radargram,
)
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer


def test_pt_and_npy_roundtrip(tmp_path):
    rg, _ = synthetic_radargram(H=64, W=400, seed=9)
    pt = tmp_path / "rg.pt"
    npy = tmp_path / "rg.npy"
    torch.save(torch.from_numpy(rg), str(pt))
    np.save(str(npy), rg)
    np.testing.assert_array_equal(load_radargram(str(pt)), rg)
    np.testing.assert_array_equal(load_radargram(str(npy)), rg)
    ds = RGWindows(str(pt), length=4, dim=(16, 16), overlap=(0, 0))
    np.testing.assert_array_equal(ds.rg, rg)
    with pytest.raises(ValueError):
        load_radargram(str(tmp_path / "rg.txt"))


def test_concat_windows_and_training():
    parts = [synthetic_radargram(H=88, W=480, seed=s)[0] for s in (1, 2, 3)]
    sets = [RGWindows(p, length=5, dim=(16, 16), overlap=(8, 0)) for p in parts]
    cat = ConcatWindows(sets)
    assert len(cat) == sum(len(s) for s in sets)
    np.testing.assert_array_equal(cat[0], sets[0][0])
    np.testing.assert_array_equal(cat[len(sets[0])], sets[1][0])
    np.testing.assert_array_equal(cat[len(cat) - 1], sets[2][len(sets[2]) - 1])
    with pytest.raises(IndexError):
        cat[len(cat)]

    # shapes must match
    odd = RGWindows(parts[0], length=6, dim=(16, 16), overlap=(8, 0))
    with pytest.raises(ValueError):
        ConcatWindows([sets[0], odd])

    # multi-radargram batched training runs end-to-end
    cfg = CRWTrainConfig(model=0, batch_size=8, epochs=1, lr=1e-3, tau=0.05)
    trainer = CRWTrainer(cfg)
    hist = trainer.fit(cat, log=lambda s: None)
    assert np.isfinite(hist).all()

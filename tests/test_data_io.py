"""Data IO round-trips (.pt/.npy ingestion) and multi-radargram concatenation."""

import os

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


FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "data_root"
)


def test_committed_fixture_loads_without_synthetic(monkeypatch, capsys):
    """The committed real-format .pt fixture satisfies the MCoRDS1 registry
    entries end-to-end — no synthetic fallback notice is printed."""
    from radar_sounder_crw_tpu.data import create_dataset, get_reference

    monkeypatch.setenv("RSCRW_DATA_ROOT", FIXTURE_ROOT)
    ds = create_dataset(id=0, length=6, dim=(16, 16), overlap=(8, 0), full=True)
    assert ds.rg.shape == (64, 1024)
    n4, seg = get_reference(id=0, h=64, w=0)
    assert n4 == 4 and seg.shape == (64, 1024)
    assert set(np.unique(seg)) <= set(range(4))
    _, sg3 = get_reference(id=2, h=64, w=0)
    assert 4 in np.unique(sg3)  # the uncertain label
    out = capsys.readouterr().out
    assert "using synthetic" not in out

    # .npy twin of the same crop decodes to identical data
    npy = np.load(os.path.join(os.path.dirname(FIXTURE_ROOT), "rg_crop.npy"))
    np.testing.assert_array_equal(ds.rg, npy)


def test_fixture_regeneration_is_deterministic(tmp_path):
    """tests/fixtures/make_fixtures.py reproduces the committed arrays."""
    from radar_sounder_crw_tpu.data.registry import _with_uncertain_band
    from radar_sounder_crw_tpu.data.synthetic import synthetic_radargram

    rg, seg = synthetic_radargram(H=64, W=1024, nclasses=4, seed=21)
    want_rg = load_radargram(
        os.path.join(FIXTURE_ROOT, "MCoRDS1_2010_DC8", "RG2_MCoRDS1_2010_DC8.pt")
    )
    np.testing.assert_array_equal(want_rg, rg.astype(np.float32))
    # SG2 is the ground truth every MCoRDS1 metric is scored against —
    # a drifted/corrupted committed copy must not pass silently
    want_sg2 = load_radargram(
        os.path.join(FIXTURE_ROOT, "MCoRDS1_2010_DC8", "SG2_MCoRDS1_2010_DC8.pt")
    )
    np.testing.assert_array_equal(want_sg2.astype(np.uint8), seg.astype(np.uint8))
    want_sg3 = load_radargram(
        os.path.join(FIXTURE_ROOT, "MCoRDS1_2010_DC8", "SG3_MCoRDS1_2010_DC8.pt")
    )
    np.testing.assert_array_equal(
        want_sg3.astype(np.uint8),
        _with_uncertain_band(seg.astype(np.uint8), uncertain_label=4),
    )


def test_test_all_cli_on_real_fixture_no_synthetic(tmp_path):
    """Full scripts/test_all.py CLI against the committed .pt fixture:
    the registry must never fall back to synthetic data (VERDICT r1 #8)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        RSCRW_DATA_ROOT=FIXTURE_ROOT,
        RSCRW_FORCE_CPU="1",
        JAX_PLATFORMS="",
    )
    # tmp_path, NOT a persistent repo dir: stale artifacts from an earlier
    # run must never satisfy the existence asserts below
    out_dir = str(tmp_path / "fixture_cli_out")
    proc = subprocess.run(
        [
            _sys.executable, "scripts/test_all.py",
            "--model", "0", "--dataset", "0",
            "--patch_size", "16", "16", "--overlap", "8", "0",
            "--seq_length", "6", "-c", "8", "-r", "6", "-t", "0.05", "-k", "5",
            "--allow_untrained", "--no_plots",
            "--output_folder", out_dir,
        ],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "using synthetic" not in proc.stdout
    assert "mIoU:" in proc.stdout
    assert os.path.exists(os.path.join(out_dir, "predicted_map.pt"))


def test_miguel_trim_geometry_on_real_shaped_mock(monkeypatch, capsys, tmp_path):
    """trim_miguel via the registry on a full-width (105120-column) Miguel
    mock saved as real rg2.pt/seg3.pt files — the absolute split offsets of
    the reference (src/dataset.py:67) exercised on real-shaped inputs."""
    from radar_sounder_crw_tpu.data import create_dataset, get_reference
    from radar_sounder_crw_tpu.data.radargram import _MIGUEL_SPLITS

    H, Wm = 32, sum(_MIGUEL_SPLITS)
    col = (np.arange(Wm, dtype=np.float32) % 997)[None, :]
    rg = np.repeat(col, H, axis=0) / 997.0
    seg = (np.arange(Wm)[None, :] * 6 // Wm * np.ones((H, 1))).astype(np.uint8)
    d = tmp_path / "MCORDS1_Miguel"
    d.mkdir()
    torch.save(torch.from_numpy(rg), str(d / "rg2.pt"))
    torch.save(torch.from_numpy(seg), str(d / "seg3.pt"))
    monkeypatch.setenv("RSCRW_DATA_ROOT", str(tmp_path))

    length, dim = 4, (16, 16)
    ds = create_dataset(id=1, length=length, dim=dim, overlap=(0, 0), full=True)
    unit = dim[1] * length
    want_w = sum((s // unit) * unit for s in _MIGUEL_SPLITS)
    assert ds.rg.shape == (H, want_w)
    n6, seg_t = get_reference(id=1, h=H, w=0, length=length, dim=dim)
    assert n6 == 6 and seg_t.shape == (H, want_w)
    # trimmed pieces are taken from each split's HEAD: first column of piece
    # k equals the original column at the split start offset
    starts = np.concatenate([[0], np.cumsum(_MIGUEL_SPLITS)[:-1]])
    pos = 0
    for start, s in zip(starts, _MIGUEL_SPLITS):
        keep = (s // unit) * unit
        np.testing.assert_array_equal(
            ds.rg[:, pos : pos + keep], rg[:, start : start + keep]
        )
        pos += keep
    assert "using synthetic" not in capsys.readouterr().out


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


def test_half_populated_data_root_is_refused(monkeypatch, tmp_path):
    """A data root with the real SHARAD radargram but no segmentation (or
    vice versa) must raise from get_reference instead of silently scoring
    real data against a synthetic stand-in; a root with neither falls back
    to synthetic with a printed notice."""
    import pytest

    from radar_sounder_crw_tpu.data import get_reference

    d = tmp_path / "SHARAD"
    d.mkdir()
    torch.save(torch.zeros(8, 16), str(d / "sharad_north_rg.pt"))
    monkeypatch.setenv("RSCRW_DATA_ROOT", str(tmp_path))
    with pytest.raises(ValueError, match="segmentation"):
        get_reference(id=3, h=8, w=0)

    # the opposite half: seg present, rg missing
    (d / "sharad_north_rg.pt").unlink()
    torch.save(torch.zeros(8, 16, dtype=torch.uint8), str(d / "sharad_north_sg5.pt"))
    with pytest.raises(ValueError, match="radargram"):
        get_reference(id=3, h=8, w=0)

    # both present: loads the real files
    torch.save(torch.zeros(8, 16), str(d / "sharad_north_rg.pt"))
    n, seg = get_reference(id=3, h=8, w=0)
    assert n == 5 and seg.shape == (8, 16)

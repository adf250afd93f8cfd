"""Subprocess smoke tests for every CLI entry point.

Each reference script (scripts/test/test*.py, heatmap.py, the dataset
__main__ demo, scripts/train.py) has a same-named CLI here; these tests run
each one end-to-end as a real subprocess on tiny configs — synthetic
stand-ins where the proprietary radar products are absent, the committed
MCoRDS1 fixture where a real-data path exists — and assert the script exits
cleanly and writes its product artifacts. scripts/test_all.py has its own
fixture-driven smoke in test_data_io.py; scripts/annotate.py a protocol
drive in test_annotate_server.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_ROOT = os.path.join(REPO, "tests", "fixtures", "data_root")


def run_script(script, args, tmp_path, data_root=None, timeout=560,
               env_extra=None):
    env = dict(os.environ)
    env.update(RSCRW_FORCE_CPU="1", JAX_PLATFORMS="")
    if env_extra:
        env.update(env_extra)
    if data_root is not None:
        env["RSCRW_DATA_ROOT"] = data_root
    else:
        # never let a developer's real data root slow the smoke down
        env.pop("RSCRW_DATA_ROOT", None)
    proc = subprocess.run(
        [sys.executable, os.path.join("scripts", script), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    return proc


@pytest.mark.parametrize("kernel", ["auto", "xla"])
def test_test_cli_smoke(tmp_path, kernel):
    # --kernel is the CLIs' propagation-kernel knob (framework extension);
    # 'auto' covers the default resolution, 'xla' the explicit selection
    # (the pallas choices are TPU-only and covered by the kernel suites)
    out = str(tmp_path / "out")
    proc = run_script(
        "test.py",
        ["--model", "0", "--dataset", "3", "--patch_size", "16", "16",
         "--overlap", "0", "0", "--seq_length", "6", "-c", "6", "-r", "8",
         "-t", "0.05", "-k", "5", "--allow_untrained", "--kernel", kernel,
         "--output_folder", out],
        tmp_path,
    )
    assert "Correcting at" in proc.stdout and "Test done." in proc.stdout
    for f in ("_reco.png", "_corr.png"):
        assert os.path.exists(os.path.join(out, f)), f


@pytest.mark.parametrize("mode", ["sequential", "batched"])
def test_mc1_cli_smoke(tmp_path, mode):
    # both modes: mc1's sequential branch has mc1-only code (per-radargram
    # xent handling, the sgrs reversed-reference pass) no other script runs,
    # and --batched covers the sharded fwd/rev path
    out = str(tmp_path / "out")
    proc = run_script(
        "test_mc1.py",
        ["--patch_size", "32", "32", "--overlap", "0", "0",
         "--seq_length", "4", "-c", "4", "-r", "10", "-t", "0.1", "-k", "5",
         "--allow_untrained",
         *(["--batched"] if mode == "batched" else []),
         "--input_folder", str(tmp_path / "in"), "--output_folder", out],
        tmp_path,
    )
    assert "MC1 test done." in proc.stdout
    for f in ("im0.png", "im0xent.png", "im2r.png", "im2f.png", "mc1_res.npy"):
        assert os.path.exists(os.path.join(out, f)), f


def test_mc3_cli_smoke(tmp_path):
    out = str(tmp_path / "out")
    proc = run_script(
        "test_mc3.py",
        ["--patch_size", "32", "32", "--overlap", "0", "0",
         "--seq_length", "6", "-c", "6", "-r", "10", "-t", "0.01", "-k", "5",
         "--change_points", "2", "2", "2", "--allow_untrained",
         "--input_folder", str(tmp_path / "in"), "--output_folder", out],
        tmp_path,
    )
    assert "MC3 test done." in proc.stdout
    for f in ("jim0.png", "jim0c.png", "jim2x.png", "mc3_res.npy",
              "mc3_resy.npy", "mc3_xenty.npy"):
        assert os.path.exists(os.path.join(out, f)), f


def test_sharad_cli_smoke(tmp_path):
    out = str(tmp_path / "out")
    proc = run_script(
        "test_sharad.py",
        ["--patch_size", "16", "16", "--overlap", "0", "0",
         "--seq_length", "6", "-c", "6", "-r", "8", "-t", "0.1", "-k", "5",
         "--change_points", "3", "3", "3", "--allow_untrained",
         "--input_folder", str(tmp_path / "in"), "--output_folder", out],
        tmp_path,
    )
    assert "SHARAD test done." in proc.stdout
    for f in ("sharad_xent0.png", "sharad_res2.png", "s_res.npy",
              "s_xent.npy"):
        assert os.path.exists(os.path.join(out, f)), f


def test_mc3_cli_batched_matches_sequential(tmp_path):
    """--batched (forward + bucketed corrections + reverse as sharded device
    programs) must produce bit-identical .npy products to the sequential
    per-radargram loop."""
    import numpy as np

    outs = {}
    for mode, extra in (("seq", []), ("bat", ["--batched"])):
        out = str(tmp_path / mode)
        run_script(
            "test_mc3.py",
            ["--patch_size", "32", "32", "--overlap", "0", "0",
             "--seq_length", "6", "-c", "6", "-r", "10", "-t", "0.01",
             "-k", "5", "--change_points", "2", "3", "2",
             "--allow_untrained", "--input_folder", str(tmp_path / "in"),
             "--output_folder", out, *extra],
            tmp_path,
        )
        outs[mode] = out
    for f in ("mc3_res.npy", "mc3_resy.npy", "mc3_xenty.npy"):
        a = np.load(os.path.join(outs["seq"], f))
        b = np.load(os.path.join(outs["bat"], f))
        if f == "mc3_xenty.npy":
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5, err_msg=f)
        else:
            np.testing.assert_array_equal(b, a, err_msg=f)


def test_unet_cli_smoke(tmp_path):
    """scripts/test_unet.py end-to-end on scaled synthetic SHARAD (the
    device-resident strip path): train 1 epoch, eval, report + mIoU."""
    proc = run_script(
        "test_unet.py",
        ["--patch_size", "912", "64", "--batch_size", "8", "--epochs", "1",
         "--lr", "1e-3"],
        tmp_path,
        env_extra={"RSCRW_SYNTH_SCALE": "8"},
    )
    assert "mIoU:" in proc.stdout
    assert "accuracy" in proc.stdout  # classification report rendered


def test_heatmap_cli_smoke(tmp_path):
    out = str(tmp_path / "out")
    proc = run_script(
        "heatmap.py",
        ["--model", "0", "--dataset", "1", "--patch_size", "64", "64",
         "--overlap", "0", "0", "--allow_untrained",
         "--input_folder", str(tmp_path / "in"), "--output_folder", out],
        tmp_path,
    )
    assert "PELT breakpoints" in proc.stdout and "Heatmap done." in proc.stdout
    for f in ("_heatmap.png", "_heatmap.pdf"):
        assert os.path.exists(os.path.join(out, f)), f


def test_show_grid_cli_smoke(tmp_path):
    out_png = str(tmp_path / "grid.png")
    proc = run_script(
        "show_grid.py",
        ["--dataset", "0", "--seq_length", "3", "--patch_size", "16", "16",
         "--output", out_png],
        tmp_path,
        data_root=FIXTURE_ROOT,
    )
    assert "Saved patch grid" in proc.stdout
    assert os.path.exists(out_png)


def test_train_cli_smoke(tmp_path):
    out = str(tmp_path / "res")
    proc = run_script(
        "train.py",
        ["--model", "0", "--dataset", "0", "--patch_size", "16", "16",
         "--overlap", "0", "0", "--seq_length", "4", "--batch_size", "4",
         "--epochs", "1", "--output_folder", out, "--output_name", "smoke"],
        tmp_path,
        data_root=FIXTURE_ROOT,
    )
    assert "Finished training." in proc.stdout
    assert os.path.exists(os.path.join(out, "models", "smoke.pt"))
    assert os.path.exists(os.path.join(out, "output", "_loss.png"))

"""The interactive annotation server (scripts/annotate.py): protocol loop,
seed -> reseed -> metrics -> save, error recovery, reseed(0) == fresh seed."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")

ARGS = [
    "--model", "0", "--dataset", "3", "--seq_length", "8",
    "--patch_size", "16", "16", "--overlap", "8", "0",
    "--cxt_size", "8", "--radius", "6", "--temp", "0.1", "--knn", "5",
    "--allow_untrained",
]


def _session_args():
    import argparse
    sys.path.insert(0, SCRIPTS)
    import annotate

    return annotate, annotate.get_args_parser().parse_args(ARGS)


def test_annotate_protocol_subprocess(tmp_path):
    """Full protocol drive through the real CLI loop over pipes."""
    npy = str(tmp_path / "map.npy")
    png = str(tmp_path / "map.png")
    cmds = [
        {"cmd": "info"},
        {"cmd": "seed"},  # error: no window staged yet
        {"cmd": "load", "window": 1},
        {"cmd": "seed", "seg": "gt"},
        {"cmd": "reseed", "frame": 3, "seg": "gt"},
        {"cmd": "metrics"},
        {"cmd": "save", "path": npy, "plot": png},
        {"cmd": "nope"},  # unknown command -> error reply, session survives
        {"cmd": "info"},
        {"cmd": "quit"},
    ]
    # JAX_PLATFORMS is baked into jax.config at interpreter start by the
    # host's sitecustomize, so the env var cannot force CPU in a subprocess;
    # RSCRW_FORCE_CPU is the scripts' config-level escape hatch (otherwise
    # this test silently depends on a reachable TPU and hangs without one)
    env = dict(os.environ, RSCRW_FORCE_CPU="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "annotate.py"), *ARGS],
        input="\n".join(json.dumps(c) for c in cmds) + "\n",
        capture_output=True, text=True, timeout=900, env=env, cwd=SCRIPTS,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    replies = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    ready, *rest = replies
    assert ready["ok"] and ready["ready"]
    assert len(rest) == len(cmds), rest
    r_info0, r_seed_err, r_load, r_seed, r_reseed, r_metrics, r_save, \
        r_nope, r_info1, r_quit = rest
    assert r_info0["ok"] and r_info0["windows"] >= 2
    assert not r_seed_err["ok"] and "load" in r_seed_err["error"]
    assert r_load["ok"] and r_load["T"] == 8
    assert r_seed["ok"] and "change_idx" in r_seed
    assert sum(r_seed["class_counts"].values()) > 0
    assert r_reseed["ok"] and r_reseed["frame"] == 3 and r_reseed["ms"] >= 0
    assert r_metrics["ok"] and 0.0 <= r_metrics["pixel_accuracy"] <= 1.0
    assert r_save["ok"]
    assert not r_nope["ok"]
    assert r_info1["ok"] and r_info1["seeded"]
    assert r_quit["ok"] and r_quit["bye"]
    assert os.path.exists(npy) and os.path.exists(png)
    saved = np.load(npy)
    assert saved.ndim == 2 and saved.shape[1] == 8  # (N, T)


def test_reseed_zero_matches_fresh_seed():
    """In-process: reseed(frame=0) with the same seed returns the seed call's
    map exactly (the pipeline equality test at server altitude)."""
    annotate, args = _session_args()
    s = annotate.AnnotationSession(args)
    r = s.handle(json.dumps({"cmd": "load", "window": 0}))
    assert r["ok"], r
    r = s.handle(json.dumps({"cmd": "seed", "seg": "gt"}))
    assert r["ok"], r
    first = s.pred.copy()
    r = s.handle(json.dumps({"cmd": "reseed", "frame": 0, "seg": "gt"}))
    assert r["ok"], r
    np.testing.assert_array_equal(s.pred, first)


def test_seed_rejects_bad_shapes():
    annotate, args = _session_args()
    s = annotate.AnnotationSession(args)
    assert s.handle(json.dumps({"cmd": "load"}))["ok"]
    bad = s.handle(json.dumps({"cmd": "seed", "seg": [1, 2, 3]}))
    assert not bad["ok"] and "2-D" in bad["error"]
    bad = s.handle(json.dumps({"cmd": "seed", "seg": "nope"}))
    assert not bad["ok"]
    bad = s.handle("not json at all")
    assert not bad["ok"]
    # session still usable after the errors
    assert s.handle(json.dumps({"cmd": "seed", "seg": "gt"}))["ok"]


@pytest.mark.parametrize("use_last", [False, True])
def test_seed_orientation(use_last):
    """use_last seeds the last frame and returns the map in ORIGINAL frame
    order (the server flips the pipeline's reversed output back). Pinned by
    value: the seeded ORIGINAL frame's map column must equal the seed's own
    argmax labels — a dropped flip-back would place them at the other end."""
    from radar_sounder_crw_tpu.infer.propagate import (
        seed_onehot_from_segmentation,
    )

    annotate, args = _session_args()
    s = annotate.AnnotationSession(args)
    assert s.handle(json.dumps({"cmd": "load"}))["ok"]
    r = s.handle(json.dumps({"cmd": "seed", "seg": "gt", "use_last": use_last}))
    assert r["ok"], r
    T = 8
    assert s.pred.shape[1] == T
    N = s.pred.shape[0]
    seeded_orig = T - 1 if use_last else 0
    _, want = seed_onehot_from_segmentation(
        s._gt_patch(seeded_orig), N, s.nclasses
    )
    np.testing.assert_array_equal(s.pred[:, seeded_orig], want)
    m = s.handle(json.dumps({"cmd": "metrics"}))
    assert m["ok"] and 0.0 <= m["miou"] <= 1.0


@pytest.mark.parametrize("use_last", [False, True])
def test_reseed_frame_is_original_order(use_last):
    """The protocol's reseed 'frame' is ORIGINAL frame order in both session
    orientations: the seeded frame itself becomes the explicit seed's argmax,
    and the frames on the propagation's upstream side (after `frame` for
    use_last, before it for forward) keep the previous map. Guards the
    use_last coordinate bug where an explicit seed landed on flipped frame
    `frame` (original T-1-frame) instead."""
    annotate, args = _session_args()
    s = annotate.AnnotationSession(args)
    assert s.handle(json.dumps({"cmd": "load"}))["ok"]
    r = s.handle(json.dumps({"cmd": "seed", "seg": "gt", "use_last": use_last}))
    assert r["ok"], r
    before = s.pred.copy()
    f = 5
    seg = (np.ones((s.geo.rg_h(), s.geo.w), np.int32) * 2).tolist()
    r = s.handle(json.dumps({"cmd": "reseed", "frame": f, "seg": seg}))
    assert r["ok"], r
    after = s.pred
    assert (after[:, f] == 2).all(), "seed must land on ORIGINAL frame f"
    if use_last:
        np.testing.assert_array_equal(after[:, f + 1 :], before[:, f + 1 :])
    else:
        np.testing.assert_array_equal(after[:, :f], before[:, :f])

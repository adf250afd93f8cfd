"""scripts/test_all.py --batched must produce the SAME final map as the
sequential path for every phase — forward, correction (bucketed by
small_length into sharded device programs), and reverse (VERDICT r2 #6).

Change-point detection is mocked to a deterministic per-radargram schedule so
the correction phase actually triggers with several distinct correction
lengths (exercising the compile-shape bucketing)."""

import importlib.util
import itertools
import os
import sys

import numpy as np
import pytest


def _load_test_all():
    scripts = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    )
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    spec = importlib.util.spec_from_file_location(
        "test_all_cli", os.path.join(scripts, "test_all.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_batched_phases_match_sequential(tmp_path, monkeypatch):
    monkeypatch.setenv("RSCRW_SYNTH_SCALE", "8")  # narrow synthetic SHARAD
    mod = _load_test_all()

    import radar_sounder_crw_tpu.infer.propagate as prop_mod

    # deterministic change points (frame index or None), per radargram in
    # call order — both paths consult them in radargram order, so the two
    # runs see identical schedules; several values -> several buckets
    schedule = [3, None, 5, 3, 6, None, 3, 5]

    def run(batched: bool):
        cycler = itertools.cycle(schedule)
        monkeypatch.setattr(
            prop_mod, "detect_change_point", lambda sig, pen=5.0: next(cycler)
        )
        argv = [
            "--dataset", "3", "--model", "0", "--seq_length", "8",
            "--cxt_size", "8", "--radius", "5", "--knn", "4",
            "--use_last", "--correction", "--no_plots", "--allow_untrained",
            "--output_folder", str(tmp_path / ("b" if batched else "s")),
        ] + (["--batched"] if batched else [])
        args = mod.get_args_parser().parse_args(argv)
        return mod.main(args)

    seq_map = run(batched=False)
    bat_map = run(batched=True)
    np.testing.assert_array_equal(bat_map, seq_map)

"""Shared helpers for the file-driven qualitative test scripts
(test_mc1 / test_mc3 / test_sharad)."""

from __future__ import annotations

import os

import numpy as np

from radar_sounder_crw_tpu.data import load_radargram, synthetic_radargram
from radar_sounder_crw_tpu.data.patchify import unfold2d


def window_radargram(rg: np.ndarray, patch, overlap) -> np.ndarray:
    """(H, W) -> (T, N, h, w), the manual unfold the qualitative scripts use
    (reference: scripts/test/test_mc1.py:67-72)."""
    h, w = patch
    oh, ow = overlap
    grid = unfold2d(np.asarray(rg, np.float32), (h, w), (h - oh, w - ow))
    return np.ascontiguousarray(np.transpose(grid, (1, 0, 2, 3)))


def load_files_or_synth(
    input_folder: str,
    rg_names: list[str],
    sg_names: list[str],
    nclasses: int,
    synth_hw: tuple[int, int],
    seed0: int = 100,
    flip_first: bool = False,
):
    """Load (radargram, segmentation) file pairs; synthesize deterministic
    stand-ins when the proprietary products are absent."""
    rgs, sgs = [], []
    for i, (rn, sn) in enumerate(zip(rg_names, sg_names)):
        rp, sp = os.path.join(input_folder, rn), os.path.join(input_folder, sn)
        if os.path.exists(rp) and os.path.exists(sp):
            rg, sg = load_radargram(rp), load_radargram(sp).astype(np.int32)
        else:
            print(f"[qualitative] {rn}/{sn} not found; using synthetic stand-in")
            rg, sg = synthetic_radargram(
                H=synth_hw[0], W=synth_hw[1], nclasses=nclasses, seed=seed0 + i
            )
        if flip_first and i == 0:  # reference: test_sharad.py:54,58
            rg, sg = rg[:, ::-1].copy(), sg[:, ::-1].copy()
        rgs.append(np.asarray(rg, np.float32))
        sgs.append(np.asarray(sg, np.int32))
    return rgs, sgs


def load_refs_or_fallback(
    input_folder: str, names: list[str], fallback_sgs: list[np.ndarray]
):
    """Load auxiliary seed segmentations (e.g. the reverse-pass references,
    reference test_mc1.py:60-62); when a file is absent, fall back to the
    caller's forward reference for that radargram — NEVER to a synthetic
    segmentation, which would be unrelated to the (possibly real) radargram
    it seeds."""
    out = []
    for i, n in enumerate(names):
        p = os.path.join(input_folder, n)
        if os.path.exists(p):
            out.append(np.asarray(load_radargram(p), np.int32))
        else:
            print(
                f"[qualitative] {n} not found; seeding from the forward "
                f"reference instead"
            )
            out.append(np.asarray(fallback_sgs[i], np.int32))
    return out

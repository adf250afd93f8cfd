"""Measure the REFERENCE implementation's throughput on CPU torch.

The reference cannot run at its native configuration here (no CUDA GPU;
ruptures/ray absent), but its actual code CAN run on CPU via the same harness
the equivalence tests use — giving a measured, clearly-labeled anchor for
BASELINE.md instead of a fake vs_baseline=1.0 (round-1 VERDICT weak #3).

Anchors produced (both at the reference defaults):
  * reference_cpu_torch_train_steps_per_sec  — full CRW train step (ResNet-10,
    B=8, T=20, N=113, 16x16 patches, Adam), reference scripts/train.py:62-75.
  * reference_cpu_torch_propagation_ms — seed -> full-radargram propagate()
    (T=100, N=113, cxt 100, radius 10, temp 0.1, knn 20),
    reference src/utils.py:93-161 / scripts/test/test_all.py:182.

Writes/updates 'anchor lines' in BASELINE.md-compatible syntax on stdout.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from _reference_runtime import cuda_neutralized, import_reference  # noqa: E402


def train_anchor(iters=3):
    import torch

    torch.manual_seed(11)
    utils, model_mod = import_reference("utils", "model")
    enc = utils.create_model(1, False)  # ResNet-10
    crw = model_mod.CRW(enc, tau=0.01, pos_embed=False)
    opt = torch.optim.Adam(crw.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    seq = torch.tensor(
        rng.standard_normal((8, 20, 113, 16, 16)).astype(np.float32)
    )
    with cuda_neutralized():
        # warmup
        loss, _ = crw(seq)
        opt.zero_grad(); loss.backward(); opt.step()
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, _ = crw(seq)
            opt.zero_grad(); loss.backward(); opt.step()
        dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, dt


def unet_train_anchor(iters=2, B=64, H=912, W=64, C=5, lr=1e-4):
    """The reference's supervised UNet train step (scripts/test/test_unet.py
    :55-70 — Adam 1e-4, softmax-then-CE quirk, B=64 strips of 912x64) on CPU
    torch; one full optimizer step per iteration."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(11)
    ref_unet = import_reference("unet")
    net = ref_unet.UNet(1, C, bilinear=True)
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    net.train(True)
    rng = np.random.default_rng(0)
    x = torch.tensor(rng.standard_normal((B, 1, H, W)).astype(np.float32))
    y = torch.tensor(
        np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, H, W))]
        .transpose(0, 3, 1, 2)
        .copy()
    )

    def step():
        pred = F.softmax(net(x), dim=1)
        loss = F.cross_entropy(input=pred, target=y)
        opt.zero_grad()
        loss.backward()
        opt.step()

    with cuda_neutralized():
        step()  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            step()
        dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, dt


def prop_anchor(
    iters=2, T=100, N=113, hw=(16, 16), M=5, ctx=100, radius=10,
    temp=0.1, knn=20,
):
    """Seed->map propagate() at a given config. Defaults = the reference
    test_all SHARAD geometry; MC3 flagship and Miguel full-survey geometries
    are measured by the main block below."""
    import torch

    torch.manual_seed(11)
    utils = import_reference("utils")
    lp_mod = import_reference("imported.labelprop")
    enc = utils.create_model(1, False)
    enc.train(False)
    lp = lp_mod.LabelPropVOS_CRW(
        {"CXT_SIZE": ctx, "RADIUS": radius, "TEMP": temp, "KNN": knn}
    )
    rng = np.random.default_rng(1)
    seq = torch.tensor(rng.standard_normal((T, N, *hw)).astype(np.float32))
    seg = torch.tensor(
        (np.arange(N * hw[0])[:, None] * M // (N * hw[0]))
        * np.ones((1, hw[1]), np.int64)
    )
    with cuda_neutralized(), torch.no_grad():
        utils.propagate(seq, seg, enc, lp, M, False, False)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            utils.propagate(seq, seg, enc, lp, M, False, False)
        dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


if __name__ == "__main__":
    import torch

    print(f"torch {torch.__version__}, threads {torch.get_num_threads()}")
    sps, dt = train_anchor()
    print(f"train step: {dt * 1e3:.1f} ms")
    print(f"reference_cpu_torch_train_steps_per_sec: {sps:.4f}")
    sps_u, dtu = unet_train_anchor(iters=1)
    print(f"unet train step: {dtu * 1e3:.1f} ms")
    print(f"reference_cpu_torch_unet_train_steps_per_sec: {sps_u:.4f}")
    ms = prop_anchor()
    print(f"reference_cpu_torch_propagation_ms: {ms:.1f}")
    # MC3 flagship geometry (reference scripts/test/test_mc3.py:20-33)
    ms = prop_anchor(iters=1, T=100, N=190, hw=(32, 32), M=6, radius=60, temp=0.01)
    print(f"reference_cpu_torch_propagation_ms_mc3: {ms:.1f}")
    # Miguel/MCORDS3 full-survey per-radargram geometry (H=410, 16x16, oh=8
    # -> N=50; reference scripts/test/test_all.py defaults on dataset 1)
    ms = prop_anchor(iters=1, T=100, N=50, hw=(16, 16), M=6, radius=10, temp=0.1)
    print(f"reference_cpu_torch_propagation_ms_miguel: {ms:.1f}")

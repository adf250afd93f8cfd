"""TPU check + timing of the tiled fused propagation kernel at the MC3 and
SHARAD configs (correctness vs the XLA path, then per-sequence latency).

Timing protocol per BASELINE.md: the timed region ends with a host fetch of a
scalar that depends on the whole computation (block_until_ready acknowledges
early through the axon relay).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radar_sounder_crw_tpu.ops.labelprop import LabelPropConfig, propagate_labels
from radar_sounder_crw_tpu.ops.labelprop_pallas import (
    plan_blocks,
    plan_resident,
    plan_seq,
)


def run(name, T, N, C, M, ctx, radius, temp, knn, iters=5):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seed = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]
    cfg = LabelPropConfig(cxt_size=ctx, radius=radius, temperature=temp, knn=knn)
    kb = plan_blocks(ctx + 1, N, C, M, min(knn, (ctx + 1) * N))
    resident = plan_resident(ctx + 1, N, C, M, min(knn, (ctx + 1) * N))
    print(
        f"[{name}] plan: kb={kb}, nblocks={-(-(ctx + 1) // kb)}, "
        f"resident={resident}", flush=True,
    )
    emb_d, seed_d = jnp.asarray(emb), jnp.asarray(seed)

    # 'pallas_resident' (opt-in via RSCRW_BENCH_RESIDENT=1; ~10 min Mosaic
    # compile at MC3) is the recorded negative result: measured 554.4 ms MC3
    # / 118.6 ms SHARAD vs the tiled kernel's 83.7 / 42.6 (v5e, 2026-08-17) —
    # the knn extraction passes over the full un-tiled affinity cost far more
    # than the per-frame dispatch overhead the single launch eliminates.
    kernels = ["xla", "pallas"]
    # whole-sequence resident v2 (r4): per-frame single-block pipeline body,
    # ring in VMEM scratch, one launch per radargram
    if plan_seq(ctx + 1, N, C, M, min(knn, (ctx + 1) * N)) is not None:
        kernels.append("pallas_seq")
    if resident and os.environ.get("RSCRW_BENCH_RESIDENT"):
        kernels.append("pallas_resident")
    # MEASUREMENT ORDER MATTERS through the remote-execution relay: one
    # full-array jax.device_get before a timed loop degrades EVERY
    # subsequent call in the process ~2-4.5x (measured: MC3 XLA 543 ms with
    # a prior (T,N,M) soft fetch vs 128.7 ms with scalar-only fetches —
    # deterministic, not noise). So: time ALL kernels with scalar fetches
    # first, then fetch full outputs for the correctness checks at the end.
    out = {}
    for kernel in kernels:
        t0 = time.perf_counter()
        soft, pred = propagate_labels(emb_d, seed_d, cfg, None, kernel)
        _ = float(jax.device_get(soft[-1, 0, 0]))
        print(f"[{name}] {kernel} compile+run {time.perf_counter() - t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            soft, pred = propagate_labels(emb_d, seed_d, cfg, None, kernel)
            _ = float(jax.device_get(soft[-1, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"[{name}] {kernel}: {dt * 1e3:.1f} ms / {T}-frame propagation", flush=True)
        out[kernel] = [soft, pred, dt]

    if os.environ.get("RSCRW_BENCH_SLOPE"):
        _slope(name, T, N, emb, seed_d, cfg, out["pallas"][2], iters, "pallas")
        if "pallas_seq" in kernels:
            _slope(
                name, T, N, emb, seed_d, cfg, out["pallas_seq"][2], iters,
                "pallas_seq",
            )

    return name, kernels, out


def validate(name, kernels, out):
    """Full-array fetches + equality checks, run AFTER every timed loop in
    the process (see the measurement-order note in run())."""
    for kernel in kernels:
        soft, pred, dt = out[kernel]
        out[kernel] = (
            np.asarray(jax.device_get(soft)),
            np.asarray(jax.device_get(pred)), dt,
        )
    for kernel in kernels[1:]:
        np.testing.assert_allclose(
            out[kernel][0], out["xla"][0], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_array_equal(out[kernel][1], out["xla"][1])
        print(
            f"[{name}] {kernel} == xla OK; speedup "
            f"{out['xla'][2] / out[kernel][2]:.2f}x", flush=True,
        )
    return out


def _slope(name, T, N, emb, seed_d, cfg, t_base, iters, kernel="pallas"):
    # per-frame DEVICE slope: time the fused kernel at 2T frames too and
    # difference out every fixed per-call cost (the ~23-28 ms tunnel
    # round-trip of the scalar fetch dominates the wall numbers above at
    # the SHARAD scale; production serving amortizes it by pipelining)
    emb2 = np.concatenate([emb, emb], axis=0)
    emb2 /= np.linalg.norm(emb2, axis=-1, keepdims=True)
    emb2_d = jnp.asarray(emb2)
    soft, _ = propagate_labels(emb2_d, seed_d, cfg, None, kernel)
    float(jax.device_get(soft[-1, 0, 0]))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        soft, _ = propagate_labels(emb2_d, seed_d, cfg, None, kernel)
        _ = float(jax.device_get(soft[-1, 0, 0]))
    dt2 = (time.perf_counter() - t0) / iters
    slope = (dt2 - t_base) / T
    print(
        f"[{name}] {kernel} device slope: {slope * 1e6:.0f} us/frame "
        f"({slope * T * 1e3:.1f} ms / {T} frames device; "
        f"fixed per-call {max(t_base - slope * T, 0) * 1e3:.1f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # MC3 flagship: patch 32x32, overlap (30,0) -> N=190; cxt 100, knn 20
    results = [
        run("MC3", T=100, N=190, C=128, M=6, ctx=100, radius=60,
            temp=0.01, knn=20),
        # SHARAD (round-1 regime, for continuity with BASELINE.md numbers)
        run("SHARAD", T=100, N=113, C=128, M=5, ctx=100, radius=10,
            temp=0.1, knn=20),
    ]
    for r in results:
        validate(*r)

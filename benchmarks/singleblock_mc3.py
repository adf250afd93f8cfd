"""Experiment: MC3 propagation with a FORCED single-block plan (grid (1,1),
affinity live through extraction + weight reconstruction) vs the default
2-block two-phase plan.

The round-2 budget sweep picked multi-block because single-block lost the
block-transfer/compute overlap — but that was the old kernel (affinity
scratch write + rw extraction + scatter). The v2 single-block path removes
the scratch write, the merge, and the whole second phase, so re-test.

Protocol: slope timing (T and 2T, difference out the fixed per-call tunnel
round-trip), correctness vs the XLA path at T.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.ops.labelprop import LabelPropConfig, propagate_labels
from radar_sounder_crw_tpu.ops.labelprop_pallas import plan_blocks
from radar_sounder_crw_tpu.utils.compile_cache import enable_persistent_cache

BIG = 90 * 2**20  # forces the single-block fast path at MC3


def time_call(fn, iters=5):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def run(name, T, N, C, M, ctx, radius, temp, knn):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((2 * T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seed = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]
    cfg = LabelPropConfig(cxt_size=ctx, radius=radius, temperature=temp, knn=knn)
    emb1, emb2 = jnp.asarray(emb[:T]), jnp.asarray(emb)
    seed_d = jnp.asarray(seed)

    K = ctx + 1
    for label, budget in [("default", None), ("single", BIG)]:
        kb = plan_blocks(K, N, C, M, knn, budget)
        nb = -(-K // kb)
        try:
            s, p = propagate_labels(emb1, seed_d, cfg, None, "pallas", None, budget)
            s = np.asarray(jax.device_get(s))
            p = np.asarray(jax.device_get(p))
        except Exception as e:
            print(f"[{name}] {label} (kb={kb}, nblocks={nb}): FAILED {type(e).__name__}: {e}", flush=True)
            continue
        if label == "default":
            s_ref, p_ref = s, p
        else:
            np.testing.assert_allclose(s, s_ref, rtol=1e-4, atol=1e-6)
            np.testing.assert_array_equal(p, p_ref)
        t1 = time_call(lambda: float(jax.device_get(
            propagate_labels(emb1, seed_d, cfg, None, "pallas", None, budget)[0][-1, 0, 0])))
        t2 = time_call(lambda: float(jax.device_get(
            propagate_labels(emb2, seed_d, cfg, None, "pallas", None, budget)[0][-1, 0, 0])))
        slope = (t2 - t1) / T
        print(
            f"[{name}] {label} (kb={kb}, nblocks={nb}): wall {t1 * 1e3:.1f} ms/{T}f, "
            f"device slope {slope * 1e6:.0f} us/frame ({slope * T * 1e3:.1f} ms/{T}f)",
            flush=True,
        )


if __name__ == "__main__":
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    run("MC3", T=100, N=190, C=128, M=6, ctx=100, radius=60, temp=0.01, knn=20)
    run("SHARAD", T=100, N=113, C=128, M=5, ctx=100, radius=10, temp=0.1, knn=20)

"""Propagation latency benchmark: seed -> full-radargram, XLA vs fused
Pallas step, single and mesh-batched.

Prints one JSON line per measurement (not part of the driver contract —
bench.py at the repo root is; this is the engineering harness behind the
BASELINE.md table). Timing protocol: host fetch of the prediction (tiny
int32 array) ends each timed region; see BASELINE.md for why
block_until_ready is not used.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.ops.labelprop import LabelPropConfig, propagate_labels
from radar_sounder_crw_tpu.ops.labelprop_pallas import plan_blocks


def timed(fn, warmup=1, iters=5):
    for _ in range(warmup):
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    T, N, C, M = 100, 113, 128, 5
    cfg = LabelPropConfig(cxt_size=100, radius=10, temperature=0.1, knn=20)

    def emb():
        e = rng.standard_normal((T, N, C)).astype(np.float32)
        return jnp.asarray(e / np.linalg.norm(e, axis=-1, keepdims=True))

    seed = jnp.asarray(np.eye(M, dtype=np.float32)[rng.integers(0, M, N)])
    e0 = emb()

    kernels = ["xla"]
    if (
        jax.default_backend() == "tpu"
        and plan_blocks(cfg.cxt_size + 1, N, C, M, cfg.knn) is not None
    ):
        kernels.append("pallas")
    for kernel in kernels:
        dt = timed(lambda: propagate_labels(e0, seed, cfg, None, kernel)[1])
        print(
            json.dumps(
                {
                    "metric": f"propagation_latency_{kernel}",
                    "value": round(dt * 1e3, 3),
                    "unit": f"ms per {T}-frame radargram (N={N}, cxt={cfg.cxt_size}, knn={cfg.knn})",
                }
            )
        )


if __name__ == "__main__":
    main()

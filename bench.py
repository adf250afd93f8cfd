"""Benchmark: CRW training throughput on the available accelerator.

Measures full optimizer steps/sec (encoder fwd+bwd + palindrome walk + Adam)
at the reference trainer's default configuration (ResNet-10, batch 8, T=20,
16x16 patches — reference scripts/train.py:17-37) on synthetic SHARAD-shaped
windows. Encoder compute runs in bfloat16 (MXU path); loss math in float32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by the reference GPU throughput recorded in BASELINE.md
(line 'reference_train_steps_per_sec: <float>'); the reference repo ships no
numbers (BASELINE.md), so until one is measured the ratio is vs 1.0.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def read_baseline() -> float | None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        text = open(path).read()
    except OSError:
        return None
    m = re.search(r"reference_train_steps_per_sec:\s*([0-9.eE+-]+)", text)
    return float(m.group(1)) if m else None


def main():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    print(f"devices: {jax.devices()}", file=sys.stderr)

    B, T, patch, overlap = 8, 20, (16, 16), (8, 0)
    rg, _ = synthetic_radargram(H=912, W=4096, nclasses=5, seed=13)
    ds = RGWindows(rg, length=T, dim=patch, overlap=overlap)
    cfg = CRWTrainConfig(
        model=1, patch_size=patch, seq_length=T, overlap=overlap,
        batch_size=B, lr=1e-3, tau=0.01, dtype=jnp.bfloat16,
    )
    trainer = CRWTrainer(cfg)
    trainer.init_state(ds[0].shape)
    batch = np.stack([ds[i] for i in range(B)])

    # Pre-stage the batch on device once: the metric is step compute
    # throughput, not host->device link bandwidth (a production input
    # pipeline overlaps transfers with compute).
    from radar_sounder_crw_tpu.parallel.mesh import batch_sharding

    bsh = batch_sharding(trainer.mesh)
    seq_dev = jax.device_put(jnp.asarray(batch), bsh)
    w_dev = jax.device_put(jnp.ones((B,), jnp.float32), bsh)

    # warmup (compile) + timed steps. The timed region ends with a host
    # fetch of the final loss: step k+1 consumes step k's (donated) state, so
    # fetching the last loss transitively waits for every step — unlike
    # block_until_ready, which under-reports through remote-execution relays.
    state = trainer.state
    tc = time.perf_counter()
    state, loss = trainer._step(state, seq_dev, w_dev)
    _ = float(jax.device_get(loss))
    print(f"compile+first step: {time.perf_counter() - tc:.1f} s", file=sys.stderr)
    for _ in range(2):
        state, loss = trainer._step(state, seq_dev, w_dev)
    _ = float(jax.device_get(loss))
    iters = int(os.environ.get("RSCRW_BENCH_ITERS", "8"))
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = trainer._step(state, seq_dev, w_dev)
        print(f"step {i}", file=sys.stderr)
    loss_val = float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / iters
    steps_per_sec = 1.0 / dt

    print(
        f"step time {dt * 1e3:.2f} ms, loss {loss_val:.4f}, "
        f"item shape {ds[0].shape}", file=sys.stderr,
    )
    baseline = read_baseline()
    vs = steps_per_sec / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "crw_train_steps_per_sec",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s (ResNet-10, B=8, T=20, 16x16, bf16)",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

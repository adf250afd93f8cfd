"""A/B BatchNorm implementations (models/fused_bn.py) against flax
nn.BatchNorm on the benched train step (round-3 VERDICT #3: the BN statistic
reductions are ~2.5-3 ms of the 14.6 ms step).

Protocol (see BASELINE.md): both variants built in ONE process, warmed, then
timed in interleaved blocks (A,B,A,B,...) so tunnel drift hits both equally;
every timed block ends with a host fetch of the loss scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.parallel.mesh import batch_sharding
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

B = 8
ITERS = 10
BLOCKS = 6


def build(fused_bn):
    rg, _ = synthetic_radargram(H=912, W=6000, nclasses=5, seed=13)
    ds = RGWindows(rg, length=20, dim=(16, 16), overlap=(8, 0))
    cfg = CRWTrainConfig(
        model=1, patch_size=(16, 16), seq_length=20, overlap=(8, 0),
        batch_size=B, lr=1e-3, tau=0.01, dtype=jnp.bfloat16,
        fused_bn=fused_bn,
    )
    tr = CRWTrainer(cfg)
    tr.init_state(ds[0].shape)
    batch = np.stack([ds[i % len(ds)] for i in range(B)])
    bsh = batch_sharding(tr.mesh)
    seq = jax.device_put(jnp.asarray(batch), bsh)
    w = jax.device_put(jnp.ones((B,), jnp.float32), bsh)
    return tr, seq, w


def main():
    print("devices:", jax.devices(), flush=True)
    variants = {}
    cases = [("flax_bn", False), ("lean_bn", "lean")]
    if os.environ.get("RSCRW_BENCH_FUSED_BN"):
        cases.append(("fused_bn", True))  # the recorded custom_vjp negative
    for name, flag in cases:
        t0 = time.perf_counter()
        tr, seq, w = build(flag)
        state, loss = tr._step(tr.state, seq, w)
        print(f"[{name}] compile {time.perf_counter() - t0:.0f}s "
              f"loss {float(jax.device_get(loss)):.4f}", flush=True)
        for _ in range(3):  # warm
            state, loss = tr._step(state, seq, w)
        _ = float(jax.device_get(loss))
        variants[name] = {"tr": tr, "state": state, "seq": seq, "w": w,
                          "times": []}

    for blk in range(BLOCKS):
        for name, v in variants.items():
            t0 = time.perf_counter()
            state = v["state"]
            for _ in range(ITERS):
                state, loss = v["tr"]._step(state, v["seq"], v["w"])
            _ = float(jax.device_get(loss))
            v["state"] = state
            v["times"].append((time.perf_counter() - t0) / ITERS)

    for name, v in variants.items():
        ms = np.array(v["times"]) * 1e3
        print(f"[{name}] min {ms.min():.2f} median {np.median(ms):.2f} "
              f"ms/step over {BLOCKS} blocks: "
              + " ".join(f"{t:.2f}" for t in ms), flush=True)
    a = np.median(np.array(variants["flax_bn"]["times"]))
    for other in variants:
        if other == "flax_bn":
            continue
        b = np.median(np.array(variants[other]["times"]))
        print(f"speedup {other} vs flax: {a / b:.3f}x", flush=True)


if __name__ == "__main__":
    main()

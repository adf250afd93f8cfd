"""One-off TPU performance study: step ablations, batch scaling, long-walk
config, and vmap-of-pallas propagation. Results feed BASELINE.md and guide
kernel work. Honest-timing protocol throughout (scalar host fetch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.ops import crw_loss
from radar_sounder_crw_tpu.ops.labelprop import LabelPropConfig, propagate_labels_batched
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer
from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram


def timed(fn, iters=8):
    out = fn()
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def log(msg):
    print(msg, flush=True)


def ablation(B, T, patch, overlap, dtype, tag):
    rg, _ = synthetic_radargram(H=912, W=6000, nclasses=5, seed=13)
    ds = RGWindows(rg, length=T, dim=patch, overlap=overlap)
    cfg = CRWTrainConfig(
        model=1, patch_size=patch, seq_length=T, overlap=overlap,
        batch_size=B, lr=1e-3, tau=0.01, dtype=dtype,
    )
    tr = CRWTrainer(cfg)
    tr.init_state(ds[0].shape)
    batch = np.stack([ds[i % len(ds)] for i in range(B)])
    seq, w, step = tr._stage(batch)
    T_, N = ds[0].shape[0], ds[0].shape[1]

    # full step
    state = tr.state

    def full():
        nonlocal state
        state, loss = step(state, seq, w)
        return loss

    dt_full = timed(full)

    # forward-only loss (encoder + walk, no grads)
    model = tr.model

    def fwd_loss():
        b, t, n, hh, ww = seq.shape
        x = seq.reshape(b * t * n, hh, ww, 1)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        emb = out.reshape(b, t, n, -1)
        loss, _ = crw_loss(emb, 0.01)
        return loss

    jfwd = jax.jit(fwd_loss)
    dt_fwd = timed(jfwd)

    # encoder-only forward
    def enc_only():
        b, t, n, hh, ww = seq.shape
        x = seq.reshape(b * t * n, hh, ww, 1)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        return jnp.sum(out)

    jenc = jax.jit(enc_only)
    dt_enc = timed(jenc)

    items_per_s = B / dt_full
    log(
        f"[{tag}] B={B} T={T_} N={N} patch={patch} {dtype.__name__}: "
        f"full step {dt_full*1e3:.1f} ms ({items_per_s:.1f} items/s) | "
        f"fwd loss {dt_fwd*1e3:.1f} ms | encoder fwd {dt_enc*1e3:.1f} ms | "
        f"walk+affinity fwd ≈ {(dt_fwd-dt_enc)*1e3:.1f} ms"
    )


def vmap_pallas_prop():
    rng = np.random.default_rng(0)
    R, T, N, C, M = 8, 100, 113, 128, 5
    emb = rng.standard_normal((R, T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seeds = np.stack([np.eye(M, dtype=np.float32)[rng.integers(0, M, N)] for _ in range(R)])
    cfg = LabelPropConfig(cxt_size=100, radius=10, temperature=0.1, knn=20)
    e, s = jnp.asarray(emb), jnp.asarray(seeds)
    for kernel in ("xla", "pallas"):
        try:
            dt = timed(lambda: propagate_labels_batched(e, s, cfg, None, kernel)[1], iters=3)
            log(f"[batched-prop R={R}] kernel={kernel}: {dt*1e3:.1f} ms "
                f"({dt*1e3/R:.1f} ms/radargram)")
        except Exception as ex:
            log(f"[batched-prop R={R}] kernel={kernel} FAILED: {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    ablation(8, 20, (16, 16), (8, 0), jnp.bfloat16, "default-bf16")
    ablation(8, 20, (16, 16), (8, 0), jnp.float32, "default-f32")
    ablation(32, 20, (16, 16), (8, 0), jnp.bfloat16, "B32-bf16")
    ablation(8, 40, (32, 32), (24, 0), jnp.bfloat16, "longwalk-bf16")
    vmap_pallas_prop()
    log("perf study done")

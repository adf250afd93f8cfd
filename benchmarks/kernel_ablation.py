"""Ablate the fused propagation kernel's phases to localize the per-frame
floor (round-3: whole-pipeline MC3 is ~0.84 ms/frame and nearly
knn-independent — so what costs 0.85 ms?).

HISTORICAL: these variants and numbers ablate the EARLY-round-3 two-phase
kernel (read-write extraction + per-winner scatter). They motivated the
final round-3 scheme in ops/labelprop_pallas.py — read-only extraction,
one-pass weight reconstruction, single-block in-place plans — which
brought MC3 from ~0.50 to ~0.42 ms/frame device (see BASELINE.md). Kept
as the measurement record; the phase split no longer matches the live
kernel's structure.

Each variant runs inside a 100-iteration lax.scan (carry = ring buffer,
same DUS updates as the real pipeline) so per-dispatch overhead is
excluded; timed warm, interleaved repeats, host-fetch of a dependent
scalar at the end (BASELINE.md protocol).

MEASURED (v5e via axon, MC3 geometry K=101 N=190 C=128 knn=20, kb=53,
2026-08-17), ms per frame INCLUDING the ~0.23 ms/frame amortized tunnel
fetch constant (23 ms per timed call / 100 frames — a tiny 1-grid-step
pallas kernel and a plain-XLA scan step both measure 0.23, pinning the
constant):
    full        0.727   -> ~0.50 device
    no_scatter  0.630   -> ~0.40 device (phase-1 knn scatter loop ~0.10)
    no_merge    0.727   -> merge loop is free (small 2*knn x n arrays)
    matmul_only 0.461   -> ~0.23 device (affinity matmul at HIGHEST +
                           mask/bias/temp pass + aff VMEM write)
So the knn-serial extraction costs ~0.17, the scatter ~0.10, and the
affinity+mask baseline ~0.23 of the ~0.50 ms/frame device time.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_sounder_crw_tpu.ops.labelprop_pallas import (
    NEG_PAD,
    NEG_SELECTED,
    _round_up,
    plan_blocks,
)

KNN = 20


def make_kernel(mode, knn, n_pad, kb, nblocks):
    def kernel(temp_ref, feats_ref, query_ref, mask_ref, bias_ref,
               labels_ref, pred_ref, aff, bvals, bidx, gvals, gidx, wvals):
        phase = pl.program_id(0)
        blk = pl.program_id(1)
        kbn = kb * n_pad
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (kbn, n_pad), 0)

        @pl.when(phase == 0)
        def _find():
            a = jnp.dot(
                feats_ref[:], query_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            temp = temp_ref[0, 0]
            a = a.reshape(kb, n_pad, n_pad) + mask_ref[:][None, :, :]
            aff[:] = (a.reshape(kbn, n_pad) + bias_ref[:]) / temp
            if mode == "matmul_only":
                gvals[:] = aff[0:gvals.shape[0], :]
                gidx[:] = jnp.zeros_like(gidx)
                return

            prev_first = jnp.full((1, n_pad), -1, jnp.int32)
            for k in range(knn):
                a2 = jnp.where(row_ids == prev_first, NEG_SELECTED, aff[:])
                if k < knn - 1:
                    aff[:] = a2
                m = jnp.max(a2, axis=0, keepdims=True)
                prev_first = jnp.min(
                    jnp.where(a2 == m, row_ids, kbn), axis=0, keepdims=True
                )
                bvals[k, :] = m[0]
                bidx[k, :] = prev_first[0] + blk * kbn

            if mode == "no_merge" or nblocks == 1:
                gvals[:] = bvals[:]
                gidx[:] = bidx[:]
            else:
                @pl.when(blk == 0)
                def _first():
                    gvals[:] = bvals[:]
                    gidx[:] = bidx[:]

                @pl.when(blk > 0)
                def _merge():
                    cat_v = jnp.concatenate(
                        [gvals[0:knn, :], bvals[0:knn, :]], axis=0
                    )
                    cat_i = jnp.concatenate(
                        [gidx[0:knn, :], bidx[0:knn, :]], axis=0
                    )
                    cat_pos = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * knn, n_pad), 0
                    )
                    first = jnp.full((1, n_pad), -1, jnp.int32)
                    for j in range(knn):
                        cat_v = jnp.where(cat_pos == first, NEG_SELECTED, cat_v)
                        m = jnp.max(cat_v, axis=0, keepdims=True)
                        first = jnp.min(
                            jnp.where(cat_v == m, cat_pos, 2 * knn),
                            axis=0, keepdims=True,
                        )
                        gvals[j, :] = m[0]
                        gidx[j, :] = jnp.sum(
                            jnp.where(cat_pos == first, cat_i, 0), axis=0
                        )

        @pl.when(phase == 1)
        def _apply():
            @pl.when(blk == 0)
            def _softmax():
                v = gvals[0:knn, :]
                v = v - jnp.max(v, axis=0, keepdims=True)
                e = jnp.exp(v)
                wvals[0:knn, :] = e / jnp.sum(e, axis=0, keepdims=True)

            if mode == "no_scatter":
                aff[:] = jnp.zeros((kbn, n_pad), jnp.float32)
            else:
                w_acc = jnp.zeros((kbn, n_pad), jnp.float32)
                for k in range(knn):
                    local = gidx[k : k + 1, :] - blk * kbn
                    w_k = wvals[k : k + 1, :]
                    w_acc = w_acc + jnp.where(row_ids == local, w_k, 0.0)
                aff[:] = w_acc

            contrib = jax.lax.dot_general(
                labels_ref[:], aff[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            @pl.when(blk == 0)
            def _set():
                pred_ref[:] = contrib

            @pl.when(blk > 0)
            def _acc():
                pred_ref[:] = pred_ref[:] + contrib

    return kernel


def build_step(mode, K, N, C, M, knn, vmem_budget=None):
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(knn, 8)
    kb = plan_blocks(K, N, C, M, knn, vmem_budget)
    nblocks = -(-K // kb)
    k_pad = nblocks * kb

    kern = make_kernel(mode, knn, n_pad, kb, nblocks)
    call = pl.pallas_call(
        kern,
        grid=(2, nblocks),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((kb * n_pad, c_pad),
                         lambda p, b: ((1 - p) * b + p * (nblocks - 1), 0)),
            pl.BlockSpec((c_pad, n_pad), lambda p, b: (0, 0)),
            pl.BlockSpec((n_pad, n_pad), lambda p, b: (0, 0)),
            pl.BlockSpec((kb * n_pad, 1),
                         lambda p, b: ((1 - p) * b + p * (nblocks - 1), 0)),
            pl.BlockSpec((m_pad, kb * n_pad), lambda p, b: (0, p * b)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_pad), lambda p, b: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kb * n_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.int32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.int32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )

    mask_pad = jnp.zeros((n_pad, n_pad), jnp.float32)
    temp_arr = jnp.full((1, 1), 0.07, jnp.float32)
    bias = jnp.zeros((k_pad * n_pad, 1), jnp.float32)

    def step(carry, q_pad):
        f2d, labT = carry
        qT = q_pad.T
        pred = call(temp_arr, f2d, qT, mask_pad, bias, labT)
        f2d = jax.lax.dynamic_update_slice(f2d, q_pad, (0, 0))
        labT = jax.lax.dynamic_update_slice(labT, pred, (0, 0))
        return (f2d, labT), pred[0, 0]

    rng = np.random.default_rng(0)
    f2d = jnp.asarray(rng.standard_normal((k_pad * n_pad, c_pad)).astype(np.float32))
    labT = jnp.asarray(rng.random((m_pad, k_pad * n_pad)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((100, n_pad, c_pad)).astype(np.float32))

    @jax.jit
    def run():
        _, preds = jax.lax.scan(step, (f2d, labT), xs)
        return jnp.sum(preds)

    return run


def main():
    K, N, C, M = 101, 190, 128, 6
    print(f"plan kb={plan_blocks(K, N, C, M, KNN)}", flush=True)
    modes = ["full", "no_scatter", "no_merge", "matmul_only"]
    runs = {}
    for m in modes:
        r = build_step(m, K, N, C, M, KNN)
        t0 = time.perf_counter()
        float(r())
        print(f"[{m}] compile+first {time.perf_counter() - t0:.1f}s", flush=True)
        runs[m] = r
    results = {m: [] for m in modes}
    for rep in range(4):
        for m in modes:
            t0 = time.perf_counter()
            float(runs[m]())
            # seconds * 1000 / 100 frames = ms per frame
            results[m].append((time.perf_counter() - t0) * 10)
    for m in modes:
        ms = np.array(results[m])
        print(f"[{m}] per-frame ms: min {ms.min():.3f} median {np.median(ms):.3f} "
              + " ".join(f"{v:.3f}" for v in ms), flush=True)


if __name__ == "__main__":
    main()

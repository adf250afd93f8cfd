"""Pallas TPU kernel: one fused label-propagation step, tiled over context.

Fuses the whole per-frame propagation step of ops/labelprop.py —
  affinity matmul (MXU)  ->  radius/validity mask add  ->  temperature
  ->  iterative top-k selection  ->  softmax over the k scores
  ->  weighted soft-label gather (MXU)
— into a single kernel, eliminating the HBM round-trips of the (K*N, N)
affinity matrix and XLA's general sort-based top_k. Inference-only (label
propagation takes no gradients), so no custom VJP is needed.

Tiling (replaces the round-1 all-resident kernel, whose VMEM ceiling
excluded the MC3 config N=190, cxt=100 — reference scripts/test/test_mc3.py:20-33):
the context-slot axis is split into blocks of `kb` slots; the grid runs the
blocks sequentially on the core, each step computing its block's affinity,
extracting the block's top-k by iterative max-extraction, then merging into
a running global top-k kept in scratch (scratch persists across grid steps).
The final step softmaxes the k global scores and emits the weighted label
sum. Per-step VMEM is O(kb·N_pad·(C_pad+N_pad)) — `plan_blocks` picks the
largest `kb` that fits the budget, so any (K, N) the XLA path serves now
runs fused too.

Ordering/parity contract (bit-equal with jax.lax.top_k + softmax):
  * within a block, extraction picks the lowest candidate index on ties;
  * the merge concatenates [running, block] in that order, so earlier blocks
    (lower global indices) win ties — global index order is preserved;
  * padded slot rows carry NEG_PAD bias and padded grid rows NEG_PAD mask,
    ranking strictly below every real (even radius-masked, -1e10) candidate,
    so they are only selected when knn exceeds the real candidate count —
    exactly like the XLA path's masked fills.

Layout: context slots are padded to N_pad rows each, so the flat candidate
axis is K_pad*N_pad — every per-slot slice is sublane-aligned, and the
radius mask + per-slot validity bias are applied in-kernel from an
(N_pad, N_pad) mask and a (K_pad, 1) slot-bias vector. Labels ride
transposed as (M_pad, K_pad*N_pad) so the class axis sits on sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_PAD = -1e30  # padding rows/slots: below every real candidate, no fp32 overflow
NEG_SELECTED = -jnp.inf  # already-extracted winners: below everything
DEFAULT_VMEM_BUDGET = 14 * 2**20  # conservative floor (~16 MB/core chips)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_vmem_budget() -> int:
    """Planning budget for the kernel's VMEM working set, by device
    generation. Measured on v5e (MC3 config, N=190, cxt=100, warm): a
    28 MB budget gives a 2-block plan at ~89 ms/100 frames vs ~106 ms for
    the 14 MB 5-block plan — and beats the 45 MB single-block plan
    (~95 ms), which loses the block-transfer/compute pipelining. v5e+
    VMEM holds the larger working set comfortably (validated up to a
    60 MB budget on hardware); unknown or older chips keep the
    conservative 14 MB floor."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return DEFAULT_VMEM_BUDGET
    if any(g in kind for g in ("v5", "v6", "v7")):
        return 28 * 2**20
    return DEFAULT_VMEM_BUDGET


def plan_blocks(
    K: int, N: int, C: int, M: int, knn: int,
    budget_bytes: int | None = None,
) -> int | None:
    """Largest per-grid-step slot-block size `kb` whose working set fits the
    VMEM budget (default: `default_vmem_budget()` for the local device);
    None if even kb=1 does not fit (fall back to XLA)."""
    if budget_bytes is None:
        budget_bytes = default_vmem_budget()
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(max(knn, 1), 8)
    # fixed tensors: query, mask, running/block top-k state, merge transients
    fixed = 4 * (
        c_pad * n_pad
        + n_pad * n_pad
        + 2 * knn_pad * n_pad
        + 2 * knn_pad * m_pad * n_pad
        + 2 * knn_pad * (1 + m_pad) * n_pad  # concat values in the merge
    )
    # single-block fast path: with one grid step there is no block pipeline,
    # so feats/labels are charged once (the round-1 all-resident regime)
    per_slot_single = 4 * n_pad * (c_pad + m_pad + n_pad)
    if fixed + K * per_slot_single <= budget_bytes:
        return K
    # per-slot: feats + labels blocks (double-buffered by the pipeline) + aff
    per_slot = 4 * n_pad * (2 * c_pad + 2 * m_pad + n_pad)
    if fixed + per_slot > budget_bytes:
        return None
    return max(1, min(K, (budget_bytes - fixed) // per_slot))


def _prop_step_kernel(
    slot_bias_ref,  # (K_pad, 1) SMEM: per-slot validity bias (scalar prefetch)
    temp_ref,  # (1, 1) SMEM: temperature
    feats_ref,  # (kb*N_pad, C_pad) this block's slot-padded context features
    query_ref,  # (C_pad, N_pad) current frame features, transposed
    mask_ref,  # (N_pad, N_pad) radius mask (+NEG_PAD on padding rows)
    labels_ref,  # (M_pad, kb*N_pad) this block's transposed context soft labels
    pred_ref,  # out: (M_pad, N_pad) predicted soft labels
    aff,  # scratch (kb*N_pad, N_pad)
    bvals,  # scratch (KNN_PAD, N_pad): block winners' scores
    blab,  # scratch (KNN_PAD, M_pad, N_pad): block winners' label rows
    gvals,  # scratch (KNN_PAD, N_pad): running global winners
    glab,  # scratch (KNN_PAD, M_pad, N_pad)
    *,
    knn: int,
    n_pad: int,
    kb: int,
    nblocks: int,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        gvals[:] = jnp.full_like(gvals, -jnp.inf)
        glab[:] = jnp.zeros_like(glab)

    kbn = kb * n_pad
    # HIGHEST precision: plain f32 dots lower to bf16 MXU passes on TPU,
    # which would shift affinities (and top-k membership) vs the XLA path
    aff[:] = jnp.dot(
        feats_ref[:],
        query_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    temp = temp_ref[0, 0]
    mask = mask_ref[:]

    def add_mask(k, _):
        rows = pl.ds(k * n_pad, n_pad)
        # divide (not multiply-by-reciprocal): bit-equal with the XLA
        # path's `aff / temperature` — x*(1/t) differs by ulps for
        # non-power-of-two temperatures, enough to flip top-k ties
        aff[rows, :] = (
            aff[rows, :] + mask + slot_bias_ref[pid * kb + k, 0]
        ) / temp
        return 0

    jax.lax.fori_loop(0, kb, add_mask, 0)

    # -- extract this block's top-knn by iterative max-extraction ----------
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kbn, n_pad), 0)

    def select_one(k, _):
        a = aff[:]
        m = jnp.max(a, axis=0, keepdims=True)  # (1, N_pad)
        is_max = a == m
        first = jnp.min(jnp.where(is_max, row_ids, kbn), axis=0, keepdims=True)
        sel = (row_ids == first).astype(jnp.float32)  # one-hot (kbn, N_pad)
        bvals[k, :] = m[0]
        blab[k, :, :] = jax.lax.dot_general(
            labels_ref[:],
            sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (M_pad, N_pad)
        aff[:] = jnp.where(sel > 0, NEG_SELECTED, a)
        return 0

    jax.lax.fori_loop(0, knn, select_one, 0)

    # -- merge block winners into the running global top-knn ---------------
    # concat order [running, block] preserves global index order on ties
    cat_v0 = jnp.concatenate([gvals[0:knn, :], bvals[0:knn, :]], axis=0)
    cat_l = jnp.concatenate([glab[0:knn, :, :], blab[0:knn, :, :]], axis=0)
    cat_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * knn, n_pad), 0)

    def merge_one(j, cv):
        m = jnp.max(cv, axis=0, keepdims=True)
        first = jnp.min(
            jnp.where(cv == m, cat_ids, 2 * knn), axis=0, keepdims=True
        )
        sel = (cat_ids == first).astype(jnp.float32)  # (2knn, N_pad)
        gvals[j, :] = m[0]
        glab[j, :, :] = jnp.sum(cat_l * sel[:, None, :], axis=0)
        return jnp.where(sel > 0, NEG_SELECTED, cv)

    jax.lax.fori_loop(0, knn, merge_one, cat_v0)

    # -- final block: softmax the k winners, weighted label sum ------------
    @pl.when(pid == nblocks - 1)
    def _finalize():
        v = gvals[0:knn, :]
        v = v - jnp.max(v, axis=0, keepdims=True)
        e = jnp.exp(v)
        w = e / jnp.sum(e, axis=0, keepdims=True)  # (knn, N_pad)
        pred_ref[:] = jnp.sum(w[:, None, :] * glab[0:knn, :, :], axis=0)


@functools.partial(
    jax.jit, static_argnames=("knn", "interpret", "vmem_budget")
)
def prop_step_pallas(
    feats, query, radius_mask_nn, labels, slot_bias, temp, knn: int,
    interpret: bool = False, vmem_budget: int | None = None,
):
    """One fused propagation step.

    feats (K, N, C); query (N, C); radius_mask_nn (N, N) additive;
    labels (K, N, M); slot_bias (K,) additive per-slot validity bias
    (pre-temperature, like the radius mask); temp divides the masked
    affinities exactly like the XLA path. Returns pred (N, M).
    """
    K, N, C = feats.shape
    M = labels.shape[-1]
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(knn, 8)
    kb = plan_blocks(K, N, C, M, knn, vmem_budget)
    if kb is None:
        raise ValueError(
            f"no block size fits VMEM for K={K}, N={N}, C={C}, M={M}"
        )
    nblocks = -(-K // kb)
    k_pad = nblocks * kb

    f = jnp.zeros((k_pad, n_pad, c_pad), jnp.float32).at[:K, :N, :C].set(feats)
    f = f.reshape(k_pad * n_pad, c_pad)
    q = jnp.zeros((c_pad, n_pad), jnp.float32).at[:C, :N].set(query.T)
    mask = jnp.full((n_pad, n_pad), NEG_PAD, jnp.float32)
    mask = mask.at[:N, :].set(0.0).at[:N, :N].set(radius_mask_nn)
    lab = jnp.zeros((k_pad, n_pad, m_pad), jnp.float32).at[:K, :N, :M].set(labels)
    lab = lab.reshape(k_pad * n_pad, m_pad).T  # (M_pad, K_pad*N_pad)
    sb = jnp.full((k_pad, 1), NEG_PAD, jnp.float32)
    sb = sb.at[:K, 0].set(slot_bias.astype(jnp.float32))
    temp_arr = jnp.full((1, 1), temp, jnp.float32)

    pred = pl.pallas_call(
        functools.partial(
            _prop_step_kernel, knn=knn, n_pad=n_pad, kb=kb, nblocks=nblocks
        ),
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slot_bias (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # temp
            pl.BlockSpec((kb * n_pad, c_pad), lambda i: (i, 0)),  # feats block
            pl.BlockSpec((c_pad, n_pad), lambda i: (0, 0)),  # query
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0)),  # mask
            pl.BlockSpec((m_pad, kb * n_pad), lambda i: (0, i)),  # labels blk
        ],
        out_specs=pl.BlockSpec((m_pad, n_pad), lambda i: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kb * n_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, m_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, m_pad, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(sb, temp_arr, f, q, mask, lab)
    return pred[:M, :N].T  # (N, M)

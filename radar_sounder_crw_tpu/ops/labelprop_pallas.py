"""Pallas TPU kernel: one fused label-propagation step.

Fuses the whole per-frame propagation step of ops/labelprop.py —
  affinity matmul (MXU)  ->  radius/validity mask add  ->  temperature
  ->  iterative top-k selection  ->  softmax over the k scores
  ->  weighted soft-label gather (MXU)
— into a single VMEM-resident kernel, eliminating the HBM round-trips of the
(K*N, N) affinity matrix and XLA's general sort-based top_k. Inference-only
(label propagation takes no gradients), so no custom VJP is needed.

Layout: context slots are padded to N_pad=128 rows each, so the flat
candidate axis is K*N_pad — every per-slot slice is sublane-aligned, and the
radius mask + per-slot validity bias are applied in-kernel from an
(N_pad, N_pad) mask and a (K, 1) slot-bias vector instead of materializing a
(K*N_pad, N_pad) bias input (saves ~6 MB of VMEM at the reference's largest
config). Labels ride transposed as (M_pad, K*N_pad) so the class axis sits on
sublanes.

Top-k is computed by iterative max-extraction: k times {column max; first
argmax row via iota+min; one-hot select; accumulate the winner's soft label
with an (M, K*N_pad) x (K*N_pad, N_pad) MXU matmul; mask the winner}. The
selected scores are softmaxed (stable: max-subtracted, so an all-masked
column degrades to uniform 1/k, exactly like softmax over -1e10 fills) and
the per-iteration label rows are weighted-summed. Ties pick the lowest
candidate index, matching jax.lax.top_k.

Total VMEM at K=101, N<=128, C=128: ~13.8 MB < ~16 MB/core (v5e). `fits_vmem`
guards dispatch; ops/labelprop.py falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_PAD = -1e30  # padding rows: below every real candidate, no fp32 overflow
NEG_SELECTED = -3e38  # already-extracted winners: below everything


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(K: int, N: int, C: int, M: int, budget_bytes: int = 14 * 2**20) -> bool:
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = 32  # upper bound used for scratch sizing
    kn = K * n_pad
    need = 4 * (
        kn * c_pad  # feats
        + kn * n_pad  # affinity scratch
        + m_pad * kn  # labels (transposed)
        + c_pad * n_pad  # query
        + n_pad * n_pad  # radius mask
        + knn_pad * n_pad  # selected scores
        + knn_pad * m_pad * n_pad  # per-iteration label rows
    )
    return need <= budget_bytes


def _prop_step_kernel(
    feats_ref,  # (K*N_pad, C_pad) slot-padded context features
    query_ref,  # (C_pad, N_pad) current frame features, transposed
    mask_ref,  # (N_pad, N_pad) radius mask (+NEG_PAD on padding rows)
    labels_ref,  # (M_pad, K*N_pad) transposed context soft labels
    slot_bias_ref,  # (K, 1) SMEM: per-slot validity bias
    inv_temp_ref,  # (1, 1) SMEM: 1/temperature
    pred_ref,  # out: (M_pad, N_pad) predicted soft labels
    aff,  # scratch (K*N_pad, N_pad)
    vals,  # scratch (KNN_PAD, N_pad)
    contribs,  # scratch (KNN_PAD, M_pad, N_pad)
    *,
    knn: int,
    n_pad: int,
    K: int,
):
    kn = K * n_pad
    aff[:] = jnp.dot(
        feats_ref[:], query_ref[:], preferred_element_type=jnp.float32
    )

    inv_temp = inv_temp_ref[0, 0]
    mask = mask_ref[:]

    def add_mask(k, _):
        rows = pl.ds(k * n_pad, n_pad)
        aff[rows, :] = (aff[rows, :] + mask + slot_bias_ref[k, 0]) * inv_temp
        return 0

    jax.lax.fori_loop(0, K, add_mask, 0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kn, n_pad), 0)

    def select_one(k, _):
        a = aff[:]
        m = jnp.max(a, axis=0, keepdims=True)  # (1, N_pad)
        is_max = a == m
        first = jnp.min(jnp.where(is_max, row_ids, kn), axis=0, keepdims=True)
        sel = (row_ids == first).astype(jnp.float32)  # one-hot (kn, N_pad)
        vals[k, :] = m[0]
        contribs[k, :, :] = jax.lax.dot_general(
            labels_ref[:],
            sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (M_pad, N_pad)
        aff[:] = jnp.where(sel > 0, NEG_SELECTED, a)
        return 0

    jax.lax.fori_loop(0, knn, select_one, 0)

    v = vals[0:knn, :]
    v = v - jnp.max(v, axis=0, keepdims=True)
    e = jnp.exp(v)
    w = e / jnp.sum(e, axis=0, keepdims=True)  # (knn, N_pad)
    pred_ref[:] = jnp.sum(w[:, None, :] * contribs[0:knn, :, :], axis=0)


@functools.partial(jax.jit, static_argnames=("knn", "interpret"))
def prop_step_pallas(
    feats, query, radius_mask_nn, labels, slot_bias, inv_temp, knn: int,
    interpret: bool = False,
):
    """One fused propagation step.

    feats (K, N, C); query (N, C); radius_mask_nn (N, N) additive;
    labels (K, N, M); slot_bias (K,) additive per-slot validity bias
    (pre-temperature, like the radius mask). Returns pred (N, M).
    """
    K, N, C = feats.shape
    M = labels.shape[-1]
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(knn, 8)

    f = jnp.zeros((K, n_pad, c_pad), jnp.float32).at[:, :N, :C].set(feats)
    f = f.reshape(K * n_pad, c_pad)
    q = jnp.zeros((c_pad, n_pad), jnp.float32).at[:C, :N].set(query.T)
    mask = jnp.full((n_pad, n_pad), NEG_PAD, jnp.float32)
    mask = mask.at[:N, :].set(0.0).at[:N, :N].set(radius_mask_nn)
    lab = jnp.zeros((K, n_pad, m_pad), jnp.float32).at[:, :N, :M].set(labels)
    lab = lab.reshape(K * n_pad, m_pad).T  # (M_pad, K*N_pad)
    sb = slot_bias.reshape(K, 1).astype(jnp.float32)
    it = jnp.full((1, 1), inv_temp, jnp.float32)

    pred = pl.pallas_call(
        functools.partial(_prop_step_kernel, knn=knn, n_pad=n_pad, K=K),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * n_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, m_pad, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(f, q, mask, lab, sb, it)
    return pred[:M, :N].T  # (N, M)

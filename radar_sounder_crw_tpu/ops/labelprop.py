"""User-guided label propagation: top-k masked-attention over CRW embeddings.

Semantics (capability match of reference src/imported/labelprop.py:42-115 and
src/imported/maskedatt.py:151-175, after Jabri et al. 2020 "videowalk"):

Frame 0 carries user seed labels (one-hot over classes, one label per patch
node). For each later frame t, every node attends over a *context set* of
already-labelled source nodes — frame 0 (long-term memory) plus the last
CXT_SIZE frames — with
  * a spatial radius mask (additive -1e10 outside Euclidean radius on the
    patch grid; reference maskedatt.py:232-245, labelprop.py:89-96),
  * temperature scaling applied AFTER the mask add (maskedatt.py:160-164),
  * hard top-k selection over all context nodes, then softmax over the k
    selected scores (maskedatt.py:169-171 — softmax after topk, not before),
  * prediction = sum of the k source nodes' soft labels, weighted
    (labelprop.py:106-111). The predicted soft labels become frame t's
    context labels.

TPU-first design: the reference keeps a growing Python list of all past
frames and trims inside the affinity op. Here the context is a fixed-size
ring buffer carried through a single `jax.lax.scan` over frames — static
shapes, fully on-device, jit/vmap/shard-compatible; slot 0 permanently holds
frame 0, slots 1..CXT_SIZE hold the most recent frames.

Known reference bug NOT reproduced: when t > CXT_SIZE+1 the reference trims
the affinity rows but indexes the *untrimmed* label stack with trimmed
indices (maskedatt.py:166-171 vs labelprop.py:106-109), so labels come from
stale frames 1..CXT_SIZE instead of the trimmed context. The ring buffer
keeps features and labels together, i.e. implements the intended semantics.
The two agree exactly whenever T <= CXT_SIZE+1 (true for the reference's
test.py and test_all.py defaults).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_MASKED = -1e10  # radius-mask fill (reference labelprop.py:94)
NEG_INVALID = -1e12  # empty ring slots: below every reference candidate


@dataclasses.dataclass(frozen=True)
class LabelPropConfig:
    """cfg dict of the reference (labelprop.py:44-48 / test_all.py:63-68)."""

    cxt_size: int = 100
    radius: int = 10
    temperature: float = 0.1
    knn: int = 20


def radius_mask(h: int, w: int, radius: float) -> np.ndarray:
    """(h*w, h*w) additive mask: 0 within Euclidean `radius` on the (h, w)
    patch grid, NEG_MASKED outside. reference: maskedatt.py:232-245."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float32)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    return np.where(np.sqrt(d2) < radius, 0.0, NEG_MASKED).astype(np.float32)


def _push_frame(carry, q, pred):
    """Push a frame's feats + predicted labels into the circular region
    (slots 1..K-1; slot 0 permanently holds the seed frame). Shared by all
    step variants so the ring policy lives in one place."""
    feats, labels, valid, ptr = carry
    K = feats.shape[0]
    slot = 1 + jnp.mod(ptr, K - 1)
    return (
        feats.at[slot].set(q),
        labels.at[slot].set(pred),
        valid.at[slot].set(1.0),
        ptr + 1,
    )


def _topk_candidates(aff, knn):
    """Exact top-knn over the flattened (K*N) candidate axis, computed as
    per-slot top-k + a merge top-k.

    Bit-equal to `lax.top_k(aff.reshape(K*N, Q).T, knn)` including tie
    ordering: lax.top_k breaks ties toward the lower index, per-slot ranks
    therefore order ties by within-slot index, and the merge's position
    axis (slot-major) orders cross-slot ties by slot — which is exactly
    global candidate-index order. Sorting K arrays of N beats one sort of
    K*N (XLA lowers top_k to a sort on most backends).

    aff: (K, N_src, N_q). Returns (vals (N_q, knn), idx (N_q, knn)) with
    idx flat over slot*N_src + within_slot.
    """
    K, N, Q = aff.shape
    ks = min(knn, N)  # per-slot winners; K*ks >= min(knn, K*N) always
    per_query = aff.transpose(2, 0, 1)  # (Q, K, N)
    v_s, i_s = jax.lax.top_k(per_query, ks)  # (Q, K, ks)
    vals, pos = jax.lax.top_k(v_s.reshape(Q, K * ks), knn)
    within = jnp.take_along_axis(i_s.reshape(Q, K * ks), pos, axis=1)
    return vals, (pos // ks) * N + within


def _prop_step(mask, temperature, knn, carry, q):
    """One frame of propagation. carry: ring buffer; q: (N, C) query feats."""
    feats, labels, valid, ptr = carry
    K, N, C = feats.shape

    # affinity of every context node to every query node (keys @ query^T):
    # (K, N_src, N_query) — one MXU matmul per slot, batched over K.
    # HIGHEST precision: TPU f32 matmuls otherwise run as bf16 MXU passes,
    # an ~1e-2 relative affinity error that shifts top-k boundaries.
    aff = jnp.einsum(
        "knc,mc->knm", feats, q,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    aff = aff + mask[None, :, :] + ((1.0 - valid) * NEG_INVALID)[:, None, None]
    aff = aff / temperature

    vals, idx = _topk_candidates(aff, knn)  # (N_query, knn)
    w = jax.nn.softmax(vals, axis=-1)

    src_labels = labels.reshape(K * N, -1)[idx]  # (N, knn, M)
    pred = jnp.einsum(
        "nk,nkm->nm", w, src_labels,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _push_frame(carry, q, pred), pred


def _prop_step_chunked(mask_pad, chunk_ids, temperature, knn, qb, carry, q):
    """Query-chunked variant of _prop_step: the TPU-native slot of the
    reference's `mem_efficient_batched_affinity` (src/imported/
    maskedatt.py:177-207), which double-minibatches the affinity so the
    full (context*nodes, nodes) matrix never materializes.

    Here the query-node axis is processed in blocks of `qb` through a
    sequential `lax.map`, bounding peak memory to O(K*N*qb) per block
    instead of O(K*N*N) — the regime that matters for general (h, w)
    patch grids where N = h*w is large. Unlike the reference's
    mem-efficient variant (which silently drops the context-window
    trimming its plain `batched_affinity` applies, maskedatt.py:166-167
    vs :177-207), chunking changes memory use only: results match
    _prop_step (bit-identical on TPU; XLA:CPU matmul blocking is
    shape-dependent, so CPU sees ulp-level reassociation; tested).

    mask_pad ((N, ceil(N/qb)*qb), query columns padded NEG_MASKED) and
    chunk_ids are frame-invariant and bound once outside the scan."""
    feats, labels, valid, ptr = carry
    K, N, C = feats.shape
    n_pad = mask_pad.shape[1]
    q_pad = jnp.pad(q, ((0, n_pad - N), (0, 0)))
    slot_bias = ((1.0 - valid) * NEG_INVALID)[:, None, None]
    labels_flat = labels.reshape(K * N, -1)

    def one_chunk(i):
        qs = jax.lax.dynamic_slice(q_pad, (i * qb, 0), (qb, C))
        mc = jax.lax.dynamic_slice(mask_pad, (0, i * qb), (N, qb))
        aff = jnp.einsum(
            "knc,mc->knm", feats, qs,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        aff = (aff + mc[None, :, :] + slot_bias) / temperature
        vals, idx = _topk_candidates(aff, knn)  # (qb, knn)
        w = jax.nn.softmax(vals, axis=-1)
        return jnp.einsum(
            "nk,nkm->nm", w, labels_flat[idx],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    preds = jax.lax.map(one_chunk, chunk_ids)
    pred = preds.reshape(n_pad, -1)[:N]
    return _push_frame(carry, q, pred), pred


def _prop_step_fused(mask, temperature, knn, interpret, vmem_budget, carry, q):
    """Fused-kernel variant of _prop_step (see labelprop_pallas.py)."""
    from .labelprop_pallas import prop_step_pallas

    feats, labels, valid, _ = carry
    slot_bias = (1.0 - valid) * NEG_INVALID
    pred = prop_step_pallas(
        feats, q, mask, labels, slot_bias, temperature, knn,
        interpret=interpret, vmem_budget=vmem_budget,
    )
    return _push_frame(carry, q, pred), pred


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_hw", "kernel", "query_block", "vmem_budget"),
)
def propagate_labels(
    emb, seed_labels, cfg: LabelPropConfig, grid_hw=None, kernel: str = "auto",
    query_block: int | None = None, vmem_budget: int | None = None,
):
    """Propagate seed labels through a frame sequence.

    Args:
      emb: (T, N, C) L2-normalized per-node embeddings.
      seed_labels: (N, M) one-hot (or soft) labels of frame 0.
      cfg: LabelPropConfig.
      grid_hw: patch-grid shape per frame; default (N, 1) — a vertical column
        of patches, the geometry of this pipeline (reference utils.py:148).
      kernel: 'xla' (pure-JAX step), 'pallas' (fused TPU kernel, tiled over
        context-slot blocks so any config the XLA path serves runs fused),
        'pallas_interpret' (kernel in interpreter mode, for CPU tests), or
        'auto' (fused kernel on TPU; XLA only if no block tiling fits VMEM).
      query_block: when set (XLA path only), process query nodes in
        sequential blocks of this size, bounding peak memory to O(K*N*qb)
        per frame instead of materializing the (K*N, N) affinity — the
        memory-bounded path for large general (h, w) grids (reference
        capability: mem_efficient_batched_affinity, maskedatt.py:177-207).
        Results are identical to the unchunked step.
      vmem_budget: planning budget (bytes) for the fused kernel's context
        tiling; default = device-aware `default_vmem_budget()`. Exposed for
        tuning and for forcing multi-block plans in tests.

    Returns:
      soft: (T, N, M) soft labels per frame (frame 0 = seed as given).
      pred: (T, N) int32 argmax labels.
    """
    from .labelprop_pallas import plan_blocks

    T, N, C = emb.shape
    M = seed_labels.shape[-1]
    h, w = grid_hw if grid_hw is not None else (N, 1)
    assert h * w == N, f"grid {h}x{w} != {N} nodes"
    if cfg.cxt_size < 1:
        raise ValueError("cxt_size must be >= 1 (need at least one recent-frame slot)")
    mask = jnp.asarray(radius_mask(h, w, cfg.radius))

    K = cfg.cxt_size + 1
    feats0 = jnp.zeros((K, N, C), emb.dtype).at[0].set(emb[0])
    labels0 = jnp.zeros((K, N, M), jnp.float32).at[0].set(seed_labels)
    valid0 = jnp.zeros((K,), jnp.float32).at[0].set(1.0)

    knn = min(cfg.knn, K * N)  # top-k cannot exceed the candidate count
    if kernel == "auto":
        on_tpu = jax.default_backend() == "tpu"
        kernel = (
            "pallas"
            if (query_block is None and on_tpu
                and plan_blocks(K, N, C, M, knn, vmem_budget) is not None)
            else "xla"
        )
    if kernel == "xla":
        if query_block is not None:
            if int(query_block) < 1:
                raise ValueError(f"query_block must be >= 1, got {query_block}")
            qb = min(int(query_block), N)
            n_pad_q = -(-N // qb) * qb
            # frame-invariant chunking constants, bound once outside the scan
            # (padded query columns rank below every real candidate and their
            # outputs are sliced away in the step)
            mask_pad = jnp.pad(
                mask, ((0, 0), (0, n_pad_q - N)), constant_values=NEG_MASKED
            )
            step = partial(
                _prop_step_chunked, mask_pad, jnp.arange(n_pad_q // qb),
                cfg.temperature, knn, qb,
            )
        else:
            step = partial(_prop_step, mask, cfg.temperature, knn)
    elif kernel in ("pallas", "pallas_interpret"):
        if query_block is not None:
            raise ValueError(
                "query_block applies to the XLA path only (the fused kernel "
                "bounds memory by tiling the context-slot axis instead)"
            )
        step = partial(
            _prop_step_fused,
            mask,
            cfg.temperature,
            knn,
            kernel == "pallas_interpret",
            vmem_budget,
        )
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    (_, _, _, _), soft_rest = jax.lax.scan(
        step, (feats0, labels0, valid0, jnp.zeros((), jnp.int32)), emb[1:]
    )
    soft = jnp.concatenate([seed_labels[None], soft_rest], axis=0)
    return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)


def propagate_labels_batched(
    emb, seed_labels, cfg, grid_hw=None, kernel="auto", query_block=None,
    vmem_budget=None,
):
    """vmap of propagate_labels over a leading radargram batch axis — the
    scale-out path for full-survey inference (shard the batch axis over the
    mesh; each scan stays per-device serial)."""
    return jax.vmap(
        lambda e, s: propagate_labels(
            e, s, cfg, grid_hw, kernel, query_block, vmem_budget
        )
    )(emb, seed_labels)

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
shapes, fully on-device, jit/vmap/shard-compatible. Slots [0, L) permanently
pin the `long_mem` frames (L = len(cfg.long_mem); default (0,) = frame 0, the
reference's only live configuration); slots [L, L+CXT_SIZE) are a circular
window of the most recent frames. A pinned slot activates only once its
frame has left the recent window, so each context frame contributes exactly
once (see LabelPropConfig.long_mem).

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
    """cfg dict of the reference (labelprop.py:44-48 / test_all.py:63-68).

    long_mem: frame indices pinned as long-term memory (reference API surface:
    maskedatt.py:134-149 `context_index_bank` / the `long_mem` list of
    `batched_affinity`; the reference's live path only ever passes [0],
    labelprop.py:101, and its trim keeps exactly one long-term frame,
    maskedatt.py:166-167). Generalized here: each listed frame's features and
    predicted labels stay available forever. A pinned frame contributes ONCE:
    while it is still inside the recent-`cxt_size` window it participates as a
    recent frame, and its pinned slot activates only after it leaves the
    window (the reference's first-frame+last-ctx concatenation would present
    duplicate candidates for multi-frame lists — intended semantics built
    instead, like the trim/label-misalignment fix above)."""

    cxt_size: int = 100
    radius: int = 10
    temperature: float = 0.1
    knn: int = 20
    long_mem: tuple[int, ...] = (0,)


def radius_mask(h: int, w: int, radius: float) -> np.ndarray:
    """(h*w, h*w) additive mask: 0 within Euclidean `radius` on the (h, w)
    patch grid, NEG_MASKED outside. reference: maskedatt.py:232-245."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float32)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    return np.where(np.sqrt(d2) < radius, 0.0, NEG_MASKED).astype(np.float32)


def _push_frame(long_mem, carry, q, pred):
    """Push frame `t`'s feats + labels into the buffer. Layout: slots
    [0, L) are pinned long-term frames (L = len(long_mem)); slots [L, L+cxt)
    are a circular window of the last cxt frames (every frame is pushed,
    including pinned ones — dedup happens in `_slot_validity`). Shared by
    all step variants so the buffer policy lives in one place."""
    feats, labels, t = carry
    L = len(long_mem)
    cxt = feats.shape[0] - L
    r = jnp.mod(t, cxt)
    feats = feats.at[L + r].set(q)
    labels = labels.at[L + r].set(pred)
    for j, fj in enumerate(long_mem):  # pin when its frame comes up
        hit = t == fj
        feats = feats.at[j].set(jnp.where(hit, q, feats[j]))
        labels = labels.at[j].set(jnp.where(hit, pred, labels[j]))
    return (feats, labels, t + 1)


def _slot_validity(long_mem, cxt, t):
    """(L+cxt,) 1/0 slot validity for the step predicting frame `t`.

    Ring slots are valid once written — they hold exactly the last
    min(t, cxt) frames, so validity is derivable from the frame counter
    alone (the fused kernel derives it the same way). A pinned slot
    activates only after its frame has left the recent window
    (t - frame > cxt), so every context frame contributes exactly once.
    For long_mem=(0,) this selects exactly the reference's context: all
    frames while t <= cxt+1, frame 0 + last cxt after
    (maskedatt.py:166-167)."""
    ring_valid = (
        jnp.arange(cxt, dtype=jnp.int32) < jnp.minimum(t, cxt)
    ).astype(jnp.float32)
    if not long_mem:
        return ring_valid
    pins = jnp.asarray(long_mem, jnp.int32)
    pin_valid = (t - pins > cxt).astype(jnp.float32)
    return jnp.concatenate([pin_valid, ring_valid])


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


def _prop_step(mask, temperature, knn, long_mem, cxt, carry, q):
    """One frame of propagation. carry: ring buffer; q: (N, C) query feats."""
    feats, labels, t = carry
    valid = _slot_validity(long_mem, cxt, t)
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
    return _push_frame(long_mem, carry, q, pred), pred


def _prop_step_chunked(
    mask_pad, chunk_ids, temperature, knn, qb, long_mem, cxt, carry, q
):
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
    feats, labels, t = carry
    valid = _slot_validity(long_mem, cxt, t)
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
    return _push_frame(long_mem, carry, q, pred), pred


def _prop_step_fused(
    mask_pad, temperature, knn, interpret, long_mem, cxt, kb, nblocks,
    N, static_prop, carry, x
):
    """Fused-kernel variant of _prop_step (see labelprop_pallas.py).

    The ring buffer is carried in the KERNEL's padded layout — feats as
    (K_pad*N_pad, C_pad), labels transposed as (M_pad, K_pad*N_pad) — across
    the whole scan, and every frame-varying kernel input (the transposed
    query, the ring-push layout of the frame, the slot-validity bias
    column) is precomputed for ALL frames outside the scan and delivered by
    scan slicing. Per-frame XLA work is then exactly: the kernel call, two
    dynamic_update_slice ring writes, and t+1 — round 2 spent ~0.3 ms/frame
    re-padding the multi-MB context buffers, and the round-3 remainder was
    this step's per-frame pad/transpose/zeroing ops."""
    from .labelprop_pallas import prop_step_pallas_prepadded

    f2d, labT, t = carry
    qT, qP, bias_rows = x
    n_rows = mask_pad.shape[0]  # candidate rows per slot (round_up(N, 8))
    L = len(long_mem)
    # valid slot prefix at this frame: the L pinned slots + the min(t, cxt)
    # written ring slots (ops/labelprop.py:_slot_validity) — the kernel's
    # dynamic path walks only these, bit-equal to the full sweep (slots
    # beyond carry selection weight exactly 0). static_prop forces the
    # static full-sweep kernel (kernel="pallas_static": ablation knob).
    nslots = None if static_prop else L + jnp.minimum(t, cxt)
    pred_pad = prop_step_pallas_prepadded(
        f2d, qT, mask_pad, labT, None, temperature, knn, kb, nblocks,
        interpret, N, bias_rows, nslots=nslots,
    )  # (M_pad, N_lanes), padded query columns already zeroed in-kernel
    pred_store = pred_pad[:, :n_rows]  # ring stores N_rows label columns

    # push frame t — same buffer policy as _push_frame, padded layout
    r = jnp.mod(t, cxt)
    f2d = jax.lax.dynamic_update_slice(f2d, qP, ((L + r) * n_rows, 0))
    labT = jax.lax.dynamic_update_slice(labT, pred_store, (0, (L + r) * n_rows))
    for j, fj in enumerate(long_mem):  # pin when its frame comes up
        if fj == 0:
            continue  # frame 0 was pinned at init; t >= 1 in the scan
        hit = t == fj
        old_f = jax.lax.dynamic_slice(f2d, (j * n_rows, 0), (n_rows, f2d.shape[1]))
        f2d = jax.lax.dynamic_update_slice(
            f2d, jnp.where(hit, qP, old_f), (j * n_rows, 0)
        )
        old_l = jax.lax.dynamic_slice(
            labT, (0, j * n_rows), (labT.shape[0], n_rows)
        )
        labT = jax.lax.dynamic_update_slice(
            labT, jnp.where(hit, pred_store, old_l), (0, j * n_rows)
        )
    return (f2d, labT, t + 1), pred_pad


def _validate_cfg(cfg: LabelPropConfig, N: int, grid_hw):
    """Shared config/geometry validation for the propagation entry points.
    Returns (radius mask (N, N) jnp.float32, long_mem tuple)."""
    h, w = grid_hw if grid_hw is not None else (N, 1)
    assert h * w == N, f"grid {h}x{w} != {N} nodes"
    if cfg.cxt_size < 1:
        raise ValueError("cxt_size must be >= 1 (need at least one recent-frame slot)")
    if cfg.knn < 1:
        raise ValueError(f"knn must be >= 1, got {cfg.knn}")
    long_mem = tuple(int(j) for j in cfg.long_mem)
    if list(long_mem) != sorted(set(long_mem)) or (long_mem and long_mem[0] < 0):
        raise ValueError(
            f"long_mem must be strictly increasing non-negative frame "
            f"indices, got {cfg.long_mem}"
        )
    return jnp.asarray(radius_mask(h, w, cfg.radius)), long_mem


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
      kernel: 'xla' (pure-JAX step); 'pallas' (fused TPU kernel, tiled over
        context-slot blocks so any config the XLA path serves runs fused;
        single-block plans run the dynamic valid-prefix kernel — per-frame
        work bounded to the L + min(t, cxt) slots that hold context, ~35%
        less device time over a T ~= cxt run, bit-equal output);
        'pallas_static' (the same fused kernel with the full static slot
        sweep every frame — ablation/benchmark variant);
        'pallas_resident' (whole-sequence single-launch kernel with the ring
        buffer in VMEM scratch — MEASURED SLOWER than the tiled kernel on
        v5e: MC3 554 vs 84 ms, SHARAD 119 vs 43 ms per 100 frames; the
        per-frame kernel-dispatch overhead it eliminates is far smaller
        than the cost of running the knn extraction passes over the full
        un-tiled (K*N_pad, N_pad) affinity — kept as the recorded negative
        result, correct and tested);
        'pallas_interpret' / 'pallas_resident_interpret' (interpreter mode,
        for CPU tests); or 'auto' (tiled fused kernel on TPU; XLA if no
        block tiling fits VMEM).
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
    mask, long_mem = _validate_cfg(cfg, N, grid_hw)

    L, cxt = len(long_mem), cfg.cxt_size
    K = L + cxt
    # push frame 0 (seed): ring slot L+0, plus any pin listing frame 0
    pin0 = [j for j, fj in enumerate(long_mem) if fj == 0]
    t0 = jnp.ones((), jnp.int32)

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
                cfg.temperature, knn, qb, long_mem, cxt,
            )
        else:
            step = partial(_prop_step, mask, cfg.temperature, knn, long_mem, cxt)
        feats0 = jnp.zeros((K, N, C), emb.dtype).at[L].set(emb[0])
        labels0 = jnp.zeros((K, N, M), jnp.float32).at[L].set(seed_labels)
        for j in pin0:
            feats0 = feats0.at[j].set(emb[0])
            labels0 = labels0.at[j].set(seed_labels)
        carry0 = (feats0, labels0, t0)
        xs = emb[1:]
    elif kernel in (
        "pallas", "pallas_interpret", "pallas_static",
        "pallas_seq", "pallas_seq_interpret",
        "pallas_resident", "pallas_resident_interpret",
    ):
        if query_block is not None:
            raise ValueError(
                "query_block applies to the XLA path only (the fused kernel "
                "bounds memory by tiling the context-slot axis instead)"
            )
        from .labelprop_pallas import (
            _round_up,
            pad_mask,
            plan_resident,
            plan_seq,
            propagate_all_pallas,
            propagate_all_pallas_v2,
        )

        interp = kernel.endswith("interpret")
        if kernel.startswith("pallas_seq"):
            # whole-sequence resident kernel v2: one launch per radargram,
            # the FINAL r3 single-block pipeline as the per-frame body (see
            # labelprop_pallas._prop_seq_v2_kernel). Requires the ring +
            # affinity working set to fit one launch's VMEM; bit-equal to
            # the per-frame kernels and the XLA path (tested).
            if plan_seq(K, N, C, M, knn) is None and not interp:
                raise ValueError(
                    f"seq kernel working set exceeds VMEM for "
                    f"K={K}, N={N}, C={C}, M={M}"
                )
            soft = propagate_all_pallas_v2(
                emb, seed_labels, mask, cfg.temperature, knn, long_mem, cxt,
                interpret=interp,
            )
            return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)
        if kernel.startswith("pallas_resident"):
            # whole-sequence single-launch kernel — see the kernel-arg doc
            # above: a recorded negative result, selectable explicitly only
            # (interpret mode has no VMEM, so any size "fits" for testing)
            if not plan_resident(
                K, N, C, M, knn, budget=(1 << 62) if interp else None
            ):
                raise ValueError(
                    f"resident kernel working set exceeds VMEM for "
                    f"K={K}, N={N}, C={C}, M={M}"
                )
            soft = propagate_all_pallas(
                emb, seed_labels, mask, cfg.temperature, knn, long_mem, cxt,
                interpret=interp,
            )
            return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)

        kb = plan_blocks(K, N, C, M, knn, vmem_budget)
        if kb is None:
            raise ValueError(
                f"no block size fits VMEM for K={K}, N={N}, C={C}, M={M}"
            )
        nblocks = -(-K // kb)
        k_pad = nblocks * kb
        n_rows, n_lanes = _round_up(N, 8), _round_up(N, 128)
        c_pad = _round_up(C, 128)
        m_pad = _round_up(M, 8)
        # padded-resident ring buffer (kernel layout; see _prop_step_fused —
        # candidate rows pad to 8, only the query axis pads to 128 lanes)
        emb32 = emb.astype(jnp.float32)
        emb0 = emb32[0]
        seedT = seed_labels.astype(jnp.float32).T
        f2d0 = jnp.zeros((k_pad * n_rows, c_pad), jnp.float32)
        labT0 = jnp.zeros((m_pad, k_pad * n_rows), jnp.float32)
        for s in [L] + pin0:
            f2d0 = f2d0.at[s * n_rows : s * n_rows + N, :C].set(emb0)
            labT0 = labT0.at[:M, s * n_rows : s * n_rows + N].set(seedT)
        # every frame-varying kernel input, precomputed OUTSIDE the scan:
        # transposed queries, ring-push frames, per-frame validity bias rows
        embT_all = jnp.zeros((T - 1, c_pad, n_lanes), jnp.float32)
        embT_all = embT_all.at[:, :C, :N].set(jnp.transpose(emb32[1:], (0, 2, 1)))
        embP_all = jnp.zeros((T - 1, n_rows, c_pad), jnp.float32)
        embP_all = embP_all.at[:, :N, :C].set(emb32[1:])
        # ONE source of truth for the slot-validity policy: vmap the same
        # helper the XLA step uses over the frame counter
        valid_all = jax.vmap(partial(_slot_validity, long_mem, cxt))(
            jnp.arange(1, T, dtype=jnp.int32)
        )  # (T-1, K) 1/0
        from .labelprop_pallas import NEG_PAD

        sb_all = jnp.full((T - 1, k_pad), NEG_PAD, jnp.float32)
        sb_all = sb_all.at[:, :K].set((1.0 - valid_all) * NEG_INVALID)
        bias_all = jnp.broadcast_to(
            sb_all[:, :, None], (T - 1, k_pad, n_rows)
        ).reshape(T - 1, k_pad * n_rows, 1)
        step = partial(
            _prop_step_fused, pad_mask(mask, N), cfg.temperature, knn,
            interp, long_mem, cxt, kb, nblocks, N,
            kernel == "pallas_static",
        )
        carry0 = (f2d0, labT0, t0)
        _, ys = jax.lax.scan(step, carry0, (embT_all, embP_all, bias_all))
        soft_rest = jnp.transpose(ys[:, :M, :N], (0, 2, 1))  # (T-1, N, M)
        soft = jnp.concatenate([seed_labels[None], soft_rest], axis=0)
        return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    _, soft_rest = jax.lax.scan(step, carry0, xs)
    soft = jnp.concatenate([seed_labels[None], soft_rest], axis=0)
    return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "grid_hw", "kernel", "query_block", "vmem_budget"),
)
def _propagate_seq_batched(
    emb, seed_labels, cfg, grid_hw, kernel, query_block, vmem_budget
):
    """kernel='pallas_seq' under a radargram batch: the batch-aware
    whole-sequence kernel (labelprop_pallas.propagate_all_pallas_v2_batched)
    — grid (B, T-1), one launch for the whole stack, bit-equal per radargram
    to the unbatched seq kernel (tested)."""
    from .labelprop_pallas import plan_seq, propagate_all_pallas_v2_batched

    if query_block is not None:
        raise ValueError(
            "query_block applies to the XLA path only (the fused kernel "
            "bounds memory by tiling the context-slot axis instead)"
        )
    B, T, N, C = emb.shape
    mask, long_mem = _validate_cfg(cfg, N, grid_hw)
    L, cxt = len(long_mem), cfg.cxt_size
    K = L + cxt
    knn = min(cfg.knn, K * N)
    interp = kernel.endswith("interpret")
    if plan_seq(K, N, C, seed_labels.shape[-1], knn) is None and not interp:
        raise ValueError(
            f"seq kernel working set exceeds VMEM for "
            f"K={K}, N={N}, C={C}, M={seed_labels.shape[-1]}"
        )
    soft = propagate_all_pallas_v2_batched(
        emb, seed_labels, mask, cfg.temperature, knn, long_mem, cxt,
        interpret=interp,
    )
    return soft, jnp.argmax(soft, axis=-1).astype(jnp.int32)


def propagate_labels_batched(
    emb, seed_labels, cfg, grid_hw=None, kernel="auto", query_block=None,
    vmem_budget=None, batch_block=None,
):
    """vmap of propagate_labels over a leading radargram batch axis — the
    scale-out path for full-survey inference (shard the batch axis over the
    mesh; each scan stays per-device serial).

    batch_block: when set, process the batch axis in sequential chunks of
    this size (`lax.map` over vmapped chunks), bounding peak memory to
    O(batch_block) radargrams — the batch-axis analogue of `query_block`
    and the TPU-native form of the reference's `bsize=2` mini-batching in
    mem_efficient_batched_affinity (reference maskedatt.py:177-181).
    Results are identical to the unchunked call; a trailing partial chunk
    is padded with the first radargram and its outputs dropped.
    """
    if isinstance(kernel, str) and kernel.startswith("pallas_seq"):
        if kernel not in ("pallas_seq", "pallas_seq_interpret"):
            # same whitelist the unbatched entry enforces — without it a
            # typo'd interpret suffix would silently run the compiled kernel
            raise ValueError(f"unknown kernel {kernel!r}")
        # the seq kernel's grid IS the frame axis; vmap of the unbatched
        # kernel would prepend the batch as grid dim 0 and silently
        # mis-index frames. Instead the kernel has a batch-aware variant:
        # grid (B, T-1), frames innermost, the ring scratch re-initializing
        # at each radargram's first frame — ONE launch for the whole stack
        # (or one per batch_block chunk below).
        def run(e, s):
            return _propagate_seq_batched(
                e, s, cfg, grid_hw, kernel, query_block, vmem_budget
            )
    else:
        run = jax.vmap(
            lambda e, s: propagate_labels(
                e, s, cfg, grid_hw, kernel, query_block, vmem_budget
            )
        )
    if batch_block is None:
        return run(emb, seed_labels)
    bb = int(batch_block)
    if bb < 1:
        raise ValueError(f"batch_block must be >= 1, got {batch_block}")
    B = emb.shape[0]
    bb = min(bb, B)
    n_chunks = -(-B // bb)
    pad = n_chunks * bb - B
    if pad:
        emb = jnp.concatenate([emb, jnp.broadcast_to(emb[:1], (pad, *emb.shape[1:]))])
        seed_labels = jnp.concatenate(
            [seed_labels,
             jnp.broadcast_to(seed_labels[:1], (pad, *seed_labels.shape[1:]))]
        )
    emb_c = emb.reshape(n_chunks, bb, *emb.shape[1:])
    seed_c = seed_labels.reshape(n_chunks, bb, *seed_labels.shape[1:])
    soft, pred = jax.lax.map(lambda args: run(*args), (emb_c, seed_c))
    soft = soft.reshape(n_chunks * bb, *soft.shape[2:])[:B]
    pred = pred.reshape(n_chunks * bb, *pred.shape[2:])[:B]
    return soft, pred

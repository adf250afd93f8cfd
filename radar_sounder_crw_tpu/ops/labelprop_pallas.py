"""Pallas TPU kernel: one fused label-propagation step, tiled over context.

Fuses the whole per-frame propagation step of ops/labelprop.py —
  affinity matmul (MXU)  ->  radius/validity mask add  ->  temperature
  ->  top-k selection  ->  softmax over the k scores
  ->  weighted soft-label sum (MXU)
— into a single kernel, eliminating the HBM round-trips of the (K*N, N)
affinity matrix and XLA's general sort-based top_k. Inference-only (label
propagation takes no gradients), so no custom VJP is needed.

Valid-prefix bounding (late round 3): at frame t only L + min(t, cxt) ring
slots hold context (ops/labelprop.py:_slot_validity) — the leading half of
a T ~= cxt run sees a mostly-empty ring, yet the static kernel swept all
K slots every frame. Single-block plans now take a `nslots` scalar (SMEM)
and walk only the valid slot PREFIX through dynamic-trip-count fori_loops:
affinity + W-transform in SLOT_CHUNK chunks, the knn extraction passes in
kb/FIND_GROUPS groups (coarser: the passes dominate and pay per-group loop
+ lex-merge overhead). The W tail is zero-filled so the static full-width
labels matmul adds exactly 0.0 for skipped rows; skipped candidates are
NEG_INVALID-biased, i.e. their selection weight underflows to exactly 0.0
either way, so the output is BIT-equal to the full sweep (tested, incl.
knn > valid-candidate-count and tie-heavy values).

Selection scheme (round 3, v3 — replaces the round-2 per-winner label
matmuls and both earlier round-3 schemes):
  * top-k extraction is READ-ONLY: pass k excludes the already-extracted
    winners by a lexicographic threshold against the last winner's
    (value, row) pair — `(a < v_last) | (a == v_last & row > i_last)` —
    instead of writing NEG_SELECTED into the multi-MB affinity buffer every
    pass. Extraction was the dominant phase-0 cost (measured ~0.17 ms/frame
    at MC3, benchmarks/kernel_ablation.py); dropping the per-pass write
    halves its VMEM traffic. Tie order is unchanged (lowest row wins).
  * the per-winner weight SCATTER is gone (measured ~0.10 ms/frame of pure
    VPU compute — knn compare/select/add passes): the weight matrix W is
    reconstructed in ONE vectorized pass from the global k-th winner
    threshold (v_k, i_k): selected rows are exactly
    `(a > v_k) | (a == v_k & row <= i_k)`, each weighted
    `exp(a - v_1) / sum_j exp(v_j - v_1)` — bit-equal to softmax over the
    extracted values (the trick proven in the resident kernel).

Grid shapes:
  * single block (nblocks == 1 — the default on v5e+ for every flagship
    config incl. MC3, via `default_single_block_budget`): grid (1, 1), one
    affinity compute, one label matmul, no phases. Two sub-variants chosen
    by working-set size: small plans keep the affinity as a live VALUE
    through extraction and weight reconstruction; big plans (MC3) use the
    IN-PLACE variant — affinity materialized once in scratch and
    transformed to W in place, with the dot/mask/W passes walking slot
    chunks through fori_loops (unrolled, the scheduler kept every chunk's
    temporaries and the HIGHEST-matmul partial products live: ~100 MB of
    register-spill slots in the OOM dump, and 10x the Mosaic compile time).
  * tiled (nblocks > 1 — VMEM-constrained chips or explicit small budgets):
    grid (2, nblocks). Phase 0 per block: affinity + read-only block top-k
    + merge into the running global top-k (scratch). Phase 1 per block:
    RECOMPUTE the block affinity (one extra MXU matmul — cheaper than
    holding every block's affinity in VMEM), reconstruct W, accumulate
    pred += labels_block @ W.
Per-step VMEM is O(kb*N_pad*(C_pad+N_pad)) — `plan_blocks` picks the largest
`kb` that fits the budget, so any (K, N) the XLA path serves runs fused too.

Layout (round 3 final): the candidate-row axis pads each slot to
round_up(N, 8) ROWS (sublane alignment), while only the query axis pads to
round_up(N, 128) LANES — lane-padding the rows, as earlier rounds did,
multiplied every extraction/mask/W pass by n_lanes/n_rows (1.33x at MC3,
2.3x at the full-survey config N=50).

Measured (v5e via the axon relay, 2026-08-18 r3 final, 100-frame
sequences, clean measurement order — see BASELINE.md's measurement-order
note): MC3 (N=190, cxt=100, knn=20) 50.0 ms wall / 27.2 ms device-slope
vs the XLA path's 122.0 ms (r2 kernel: 83.2 wall); SHARAD (N=113) 34.8 ms
wall / 12.8 ms device-slope vs 51.5 (r2: 42.6). Wall minus slope is the
~22-23 ms per-call host-fetch round-trip of this deployment's tunnel
(benchmarks/bench_pallas_mc3.py, RSCRW_BENCH_SLOPE=1).

Ordering/parity contract (bit-equal top-k with jax.lax.top_k + softmax):
  * within a block, extraction picks the lowest candidate index on ties;
  * the merge concatenates [running, block] in that order, so earlier blocks
    (lower global indices) win ties — global index order is preserved;
  * padded slot rows carry NEG_PAD bias and padded grid rows NEG_PAD mask,
    ranking strictly below every real (even radius-masked, -1e10) candidate,
    so they are only selected when knn exceeds the real candidate count —
    exactly like the XLA path's masked fills (their softmax weight underflows
    to 0, so they contribute nothing).

The flat candidate axis is therefore K_pad*N_rows; the radius mask +
per-slot validity bias are applied in-kernel from an (N_rows, N_lanes)
mask and a per-candidate-row bias column. Labels ride transposed as
(M_pad, K_pad*N_rows) so the class axis sits on sublanes. In the tiled
grid, labels are pinned to block 0 during phase 0 so they are not
re-streamed in the phase that does not use them.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_PAD = -1e30  # padding rows/slots: below every real candidate, no fp32 overflow
NEG_SELECTED = -jnp.inf  # already-extracted winners: below everything
# unwritten ring slots: ONE constant shared with the XLA path — the kernels'
# valid-prefix skipping and bit-parity depend on the bias values matching
# exactly (labelprop.py builds the bias columns from it). labelprop imports
# this module lazily inside functions, so the top-level import is cycle-free.
from .labelprop import NEG_INVALID as NEG_INVALID_F  # noqa: E402
DEFAULT_VMEM_BUDGET = 14 * 2**20  # conservative floor (~16 MB/core chips)
SLOT_CHUNK = 8  # slots per in-place chunk pass; single-block plans pad the
# slot axis to a SLOT_CHUNK multiple so dynamic chunk loops never straddle
# the buffer end (see the valid-prefix bounding note in _prop_step_kernel)
# extraction groups on the dynamic path: the knn passes pay per-group loop
# + merge overhead, so they walk kb/FIND_GROUPS-slot groups instead of
# SLOT_CHUNK-sized chunks. Must divide every kb (kb % 8 == 0 on dynamic
# plans, so 1/2/4/8 are always safe). RSCRW_FIND_GROUPS overrides for
# benchmarking; values that don't divide a given kb are clamped to the
# nearest-below divisor by _find_groups_for (a non-divisor would make the
# covered prefix overrun the affinity scratch — OOB VMEM traffic).
# Default 8 from a v5e sweep over {1,2,4,8,13,26,52,104} at kb=104
# (2026-08-18, fresh process each, 8-iter single-fetch): SHARAD N=113
# 13.8/11.3/10.6/9.6/9.9/10.4/10.7/11.6 ms per 100 frames, MC3 N=190
# 35.4/28.9/25.0/23.3/22.6/23.0/23.2/22.6 — finer groups bound each pass
# tighter to the valid prefix until the per-group merge overhead wins;
# 8 is at/near the optimum for both and divides every dynamic-plan kb.
FIND_GROUPS_DEFAULT = 8


def _find_divisor(kb: int, want: int) -> int:
    """Largest divisor of kb that is <= want (>= 1)."""
    g = max(1, min(want, kb))
    while kb % g:
        g -= 1
    return g


def _find_groups_for(kb: int) -> int:
    """Extraction-group count for a kb-slot plan (divisor-clamped).

    The env override is read at TRACE time, like RSCRW_CH — for BOTH knobs
    an override only takes effect on a fresh trace (new shapes/static args,
    or a new process); the env value is not part of any jit cache key, so
    sweeps must use fresh processes (the recorded sweeps did)."""
    return _find_divisor(
        kb, int(os.environ.get("RSCRW_FIND_GROUPS", str(FIND_GROUPS_DEFAULT)))
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


RESIDENT_BUDGET_V5 = 120 * 2**20  # whole-sequence kernel VMEM plan (v5e+: 128MB)
RESIDENT_VMEM_LIMIT = 126 * 2**20  # scoped-vmem ceiling passed to Mosaic
STEP_VMEM_LIMIT = 92 * 2**20  # per-frame step kernel scoped-vmem ceiling


def plan_resident(
    K: int, N: int, C: int, M: int, knn: int, budget: int | None = None
) -> bool:
    """True when the whole-sequence resident kernel's working set (ring
    buffer + affinity + original-affinity copy + streamed frame blocks,
    plus ~two (K*N_pad, N_pad) compiler temporaries for the extraction
    loop — calibrated on v5e: MC3 N=190/cxt=100 allocates 114.3 MB scoped
    vmem vs the 117 MB this model predicts) fits VMEM — on this device
    generation, or under an explicit budget."""
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(max(knn, 1), 8)
    kpn = K * n_pad
    scratch = 4 * (
        kpn * c_pad  # feats ring
        + m_pad * kpn  # labels ring
        + 2 * kpn * n_pad  # aff + orig
        + knn_pad * n_pad
    )
    temporaries = 4 * 2 * kpn * n_pad  # extraction-loop live intermediates
    blocks = 4 * (
        2 * 2 * c_pad * n_pad  # embT + embP (double-buffered)
        + 2 * (c_pad * n_pad + m_pad * n_pad)  # emb0 + seed + mask + out
        + n_pad * n_pad
    )
    if budget is None:
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:
            return False
        budget = (
            RESIDENT_BUDGET_V5
            if any(g in kind for g in ("v5", "v6", "v7"))
            else 12 * 2**20
        )
    return scratch + temporaries + blocks <= budget


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


def default_single_block_budget() -> int:
    """Ceiling for the single-block fast path's working set. A single-block
    plan runs one grid step — no block-transfer pipelining to preserve — so
    it may use most of VMEM; the kernel switches to its in-place scratch
    variant when the value path's live temporaries would not fit (see
    prop_step_pallas_prepadded). v5e+ has 128 MB/core; unknown or older
    chips keep the conservative multi-block budget."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return DEFAULT_VMEM_BUDGET
    if any(g in kind for g in ("v5", "v6", "v7")):
        return 100 * 2**20
    return DEFAULT_VMEM_BUDGET


def plan_blocks(
    K: int, N: int, C: int, M: int, knn: int,
    budget_bytes: int | None = None,
) -> int | None:
    """Largest per-grid-step slot-block size `kb` whose working set fits the
    VMEM budget (default: `default_vmem_budget()` for the local device, with
    the single-block fast path checked against the larger
    `default_single_block_budget()`); None if even kb=1 does not fit (fall
    back to XLA)."""
    single_budget = budget_bytes
    if budget_bytes is None:
        budget_bytes = default_vmem_budget()
        # the single-block estimate must also clear the kernel's compile
        # limit (STEP_VMEM_LIMIT), with the same ~8% estimate-error margin
        # the value-path/in-place switch uses: the estimate over-counts the
        # in-place floor by roughly one affinity transient, and approving a
        # plan in the (limit, budget] gap would fail Mosaic's scoped-VMEM
        # check at compile instead of falling back to a multi-block plan
        single_budget = min(
            default_single_block_budget(), int(STEP_VMEM_LIMIT * 0.92)
        )
    n_rows = _round_up(N, 8)  # candidate rows per slot (sublane-aligned)
    n_lanes = _round_up(N, 128)  # query lanes
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(max(knn, 1), 8)
    # fixed tensors: query, mask, pred, top-k state (block+global value/idx
    # pairs + softmax weights), merge concat transients (values + indices)
    fixed = 4 * (
        c_pad * n_lanes
        + n_rows * n_lanes
        + m_pad * n_lanes
        + 5 * knn_pad * n_lanes
        + 2 * 2 * knn_pad * n_lanes
    )
    # single-block fast path: one affinity matmul, no block pipeline, so
    # feats/labels are charged once; worst case is the in-place variant's
    # aff scratch + one affinity-sized transient. The slot axis rounds up
    # to a SLOT_CHUNK multiple so the valid-prefix chunk loops (dynamic
    # trip counts) always walk full chunks; the extra slots ride as
    # NEG_PAD-biased padding like any k_pad > K slot.
    k_single = _round_up(K, SLOT_CHUNK)
    per_slot_single = 4 * n_rows * (c_pad + m_pad + 2 * n_lanes)
    if fixed + k_single * per_slot_single <= single_budget:
        return k_single
    # per-slot: feats + labels blocks (double-buffered by the pipeline) + aff
    per_slot = 4 * n_rows * (2 * c_pad + 2 * m_pad + n_lanes)
    if fixed + per_slot > budget_bytes:
        return None
    return max(1, min(K, (budget_bytes - fixed) // per_slot))


def _single_block_pipeline(
    aff, bvals, bidx, gvals, gidx, wvals,
    feats_ref, q, mask, bias_at, labels_ref, temp,
    ns,  # traced valid-slot count, ALREADY clipped to [min_slots, kb]
    *, knn: int, n_rows: int, n_lanes: int, kb: int, n_real: int, ch: int,
    labels_rowmajor: bool = False, lane_span: int | None = None,
):
    """One single-block dynamic-valid-prefix propagation frame, shared by
    the per-frame step kernel and the whole-sequence resident kernel (v2):
    chunked in-place affinity -> grouped read-only top-k extraction (static
    full sweep once the prefix saturates) -> softmax denominator -> in-place
    W transform -> labels matmul. Reads context feats/labels through REFS
    (input blocks or resident VMEM scratch — same indexing interface), takes
    the frame-varying query/bias as VALUES, and returns the (M_pad, n_lanes)
    prediction value (padded query columns zeroed when n_real < n_lanes).

    Semantics and bit-parity contracts are those of _prop_step_kernel's
    single-block dynamic path (see the module docstring); this helper IS
    that path, hoisted so the resident kernel cannot drift from it.

    bias_at(start_row, n) -> the (n, 1) validity-bias column for candidate
    rows [start_row, start_row + n) — a ref load for the per-frame kernel,
    an arithmetic construction for the resident kernel (Mosaic has no
    dynamic_slice on VALUES, so the bias cannot ride as one big value).

    labels_ref carries the context soft labels either TRANSPOSED as
    (M_pad, kbn) — the per-frame kernel's layout — or UNtransposed as
    (kbn, M_pad) (labels_rowmajor=True): the resident kernel must push each
    frame's prediction into its label ring at a dynamic slot offset, and
    Mosaic only allows dynamic offsets on the SUBLANE axis (lane offsets
    must be provably 128-aligned; the slot pitch n_rows is 8-aligned only),
    so its ring keeps candidate rows on sublanes. The matmul contracts the
    same candidate axis either way.

    lane_span: the per-item query span when several batch items ride the
    lane axis (the packed batched seq kernel, see _prop_seq_v2_kernel
    `packs`): real query columns are [p*lane_span, p*lane_span + n_real)
    per item p. None (default) = the whole lane axis is one item's."""
    kbn = kb * n_rows

    def mchunk(c, g):
        sl = pl.ds(g * n_rows, c * n_rows)
        v = jnp.dot(
            feats_ref[sl, :],
            q,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(c, n_rows, n_lanes) + mask[None, :, :]
        b = bias_at(g * n_rows, c * n_rows)
        aff[sl, :] = (v.reshape(c * n_rows, n_lanes) + b) / temp

    ce = kb // _find_groups_for(kb)  # slots per extraction group
    ns_cover = ((ns + ce - 1) // ce) * ce
    nch = (ns_cover + ch - 1) // ch
    # valid-prefix affinity chunks + zero-filled W tail (the static labels
    # matmul below reads the full buffer as weights)
    jax.lax.fori_loop(0, nch, lambda i, _: (mchunk(ch, i * ch), 0)[1], 0)
    zeros_chunk = jnp.zeros((ch * n_rows, n_lanes), jnp.float32)

    def zchunk(i, _):
        aff[pl.ds(i * ch * n_rows, ch * n_rows), :] = zeros_chunk
        return 0

    jax.lax.fori_loop(nch, kb // ch, zchunk, 0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kbn, n_lanes), 0)

    def _find_static():
        def body(k, carry):
            vl, il = carry
            a = aff[:]
            elig = (a < vl) | ((a == vl) & (row_ids > il))
            av = jnp.where(elig, a, NEG_SELECTED)
            m = jnp.max(av, axis=0, keepdims=True)
            iln = jnp.min(
                jnp.where(av == m, row_ids, kbn), axis=0, keepdims=True
            )
            bvals[pl.ds(k, 1), :] = m
            bidx[pl.ds(k, 1), :] = iln
            return m, iln

        jax.lax.fori_loop(
            0, knn, body,
            (
                jnp.full((1, n_lanes), jnp.inf, jnp.float32),
                jnp.full((1, n_lanes), -1, jnp.int32),
            ),
        )

    def _find_bounded():
        cerows = ce * n_rows
        ng = (ns + ce - 1) // ce
        base_iota = jax.lax.broadcasted_iota(jnp.int32, (cerows, n_lanes), 0)

        def pass_body(k, carry):
            vl, il = carry

            def group_body(c, run):
                m_run, i_run = run
                a_c = aff[pl.ds(c * cerows, cerows), :]
                grow = base_iota + c * cerows
                elig = (a_c < vl) | ((a_c == vl) & (grow > il))
                av = jnp.where(elig, a_c, NEG_SELECTED)
                mc = jnp.max(av, axis=0, keepdims=True)
                ic = jnp.min(
                    jnp.where(av == mc, grow, kbn), axis=0, keepdims=True
                )
                better = (mc > m_run) | ((mc == m_run) & (ic < i_run))
                return (
                    jnp.where(better, mc, m_run),
                    jnp.where(better, ic, i_run),
                )

            m, iln = jax.lax.fori_loop(
                0, ng, group_body,
                (
                    jnp.full((1, n_lanes), NEG_SELECTED, jnp.float32),
                    jnp.full((1, n_lanes), kbn, jnp.int32),
                ),
            )
            bvals[pl.ds(k, 1), :] = m
            bidx[pl.ds(k, 1), :] = iln
            return m, iln

        jax.lax.fori_loop(
            0, knn, pass_body,
            (
                jnp.full((1, n_lanes), jnp.inf, jnp.float32),
                jnp.full((1, n_lanes), -1, jnp.int32),
            ),
        )

    # grouped passes pay per-group loop + merge overhead (~25% at saturated
    # context) — switch to the static full sweep once the prefix covers all
    @pl.when(ns_cover < kb)
    def _bounded():
        _find_bounded()

    @pl.when(ns_cover >= kb)
    def _full():
        _find_static()

    gvals[:] = bvals[:]
    gidx[:] = bidx[:]
    e = jnp.exp(gvals[0:knn, :] - gvals[0:1, :])
    wvals[0:1, :] = jnp.sum(e, axis=0, keepdims=True)

    v1 = gvals[0:1, :]
    vk = gvals[knn - 1 : knn, :]
    ik = gidx[knn - 1 : knn, :]

    def wchunk(c, g):
        sl = pl.ds(g * n_rows, c * n_rows)
        a_c = aff[sl, :]
        grow_c = (
            jax.lax.broadcasted_iota(jnp.int32, (c * n_rows, n_lanes), 0)
            + g * n_rows
        )
        sel_c = (a_c > vk) | ((a_c == vk) & (grow_c <= ik))
        aff[sl, :] = jnp.where(
            sel_c, jnp.exp(a_c - v1) / wvals[0:1, :], 0.0
        )

    jax.lax.fori_loop(0, nch, lambda i, _: (wchunk(ch, i * ch), 0)[1], 0)

    contrib = jax.lax.dot_general(
        labels_ref[:],
        aff[:],
        dimension_numbers=(
            ((0,), (0,)) if labels_rowmajor else ((1,), (0,)),
            ((), ()),
        ),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (M_pad, n_lanes)
    span = n_lanes if lane_span is None else lane_span
    if n_real < span:
        cols = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
        contrib = jnp.where(cols % span < n_real, contrib, 0.0)
    return contrib


def _prop_step_kernel(
    temp_ref,  # (1, 1) SMEM: temperature
    nslots_ref,  # (1, 1) SMEM int32: valid slot-prefix count (dynamic path;
    # carries kb — i.e. "all" — when the static path is compiled)
    feats_ref,  # (kb*N_rows, C_pad) this block's slot-padded context features
    query_ref,  # (C_pad, N_lanes) current frame features, transposed
    mask_ref,  # (N_rows, N_lanes) radius mask (+NEG_PAD on padding rows)
    bias_ref,  # (kb*N_rows, 1) this block's per-candidate-row validity bias
    labels_ref,  # (M_pad, kb*N_rows) this block's transposed context soft labels
    pred_ref,  # out: (M_pad, N_lanes) predicted soft labels
    *scratch,  # bvals, bidx, gvals, gidx, wvals (+ aff when inplace)
    knn: int,
    n_rows: int,
    n_lanes: int,
    kb: int,
    nblocks: int,
    n_real: int,
    inplace: bool,
    dynamic: bool,
):
    # The candidate-row axis pads each slot to N_rows = round_up(N, 8) —
    # sublane alignment only, NOT 128: rows are the axis every extraction
    # pass walks, so lane-padding them (as rounds 1-2 did) multiplied the
    # dominant per-frame cost by n_lanes/n_rows (2.3x at the survey config
    # N=50, 1.33x at MC3 N=190). Only the query axis needs 128 lanes.
    #
    # bvals/gvals (KNN_PAD, N_lanes): block/global winners' scores;
    # bidx/gidx int32: their global flat rows; wvals row 0 = softmax
    # denominator. `aff` (kb*N_rows, N_lanes) exists only on the in-place
    # path: the affinity written ONCE, transformed to the weight matrix W
    # in place — big single-block plans would otherwise hold ~4
    # affinity-sized live value temporaries and blow scoped VMEM.
    if inplace:
        bvals, bidx, gvals, gidx, wvals, aff = scratch
    else:
        bvals, bidx, gvals, gidx, wvals = scratch
    phase = pl.program_id(0)
    blk = pl.program_id(1)
    kbn = kb * n_rows
    single = nblocks == 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kbn, n_lanes), 0)

    def _affinity():
        # HIGHEST precision: plain f32 dots lower to bf16 MXU passes on TPU,
        # which would shift affinities (and top-k membership) vs the XLA path
        a = jnp.dot(
            feats_ref[:],
            query_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # mask + per-slot validity bias + temperature, ONE vectorized pass:
        # the radius mask broadcasts over slots via a (kb, N_pad, N_pad)
        # view, the bias rides as a per-row column. (Round-3 change: a
        # per-slot fori_loop here cost ~kb serial vector ops per frame —
        # the dominant fixed cost at kb ~ 100.) Divide (not multiply-by-
        # reciprocal): bit-equal with the XLA path's `aff / temperature` —
        # x*(1/t) differs by ulps for non-power-of-two temperatures,
        # enough to flip top-k ties.
        a = a.reshape(kb, n_rows, n_lanes) + mask_ref[:][None, :, :]
        return (a.reshape(kbn, n_lanes) + bias_ref[:]) / temp_ref[0, 0]

    def _find(get_a):
        # extract this block's top-knn (value, global row); lowest row wins
        # ties. READ-ONLY: pass k excludes prior winners by a lexicographic
        # threshold against the last winner (v_last, i_last) — everything
        # lex-greater was extracted on an earlier pass — instead of writing
        # NEG_SELECTED into the (kbn, N_pad) buffer (halves the VMEM traffic
        # of what kernel_ablation.py measured as the dominant cost).
        # get_a: () -> the block affinity (a live value, or a load from the
        # in-place scratch).
        #
        # Value path: unrolled (knn static) so Mosaic can pipeline. In-place
        # path: a fori_loop — the passes are serially dependent anyway, and
        # unrolling made the scheduler hold many affinity-sized temporaries
        # on the scoped-VMEM stack (measured 113-128 MB at MC3 single-block
        # depending on the vmem limit given; the one-body loop needs only
        # one pass's temps).
        if inplace:
            def body(k, carry):
                vl, il = carry
                a = get_a()
                elig = (a < vl) | ((a == vl) & (row_ids > il))
                av = jnp.where(elig, a, NEG_SELECTED)
                m = jnp.max(av, axis=0, keepdims=True)  # (1, N_lanes)
                iln = jnp.min(
                    jnp.where(av == m, row_ids, kbn), axis=0, keepdims=True
                )
                bvals[pl.ds(k, 1), :] = m
                bidx[pl.ds(k, 1), :] = iln + blk * kbn
                return m, iln

            # first pass: +inf threshold / row -1 -> everything eligible
            jax.lax.fori_loop(
                0, knn, body,
                (
                    jnp.full((1, n_lanes), jnp.inf, jnp.float32),
                    jnp.full((1, n_lanes), -1, jnp.int32),
                ),
            )
            return
        vl = il = None
        for k in range(knn):
            a = get_a()
            if k == 0:
                av = a
            else:
                elig = (a < vl) | ((a == vl) & (row_ids > il))
                av = jnp.where(elig, a, NEG_SELECTED)
            m = jnp.max(av, axis=0, keepdims=True)  # (1, N_lanes)
            il = jnp.min(
                jnp.where(av == m, row_ids, kbn), axis=0, keepdims=True
            )
            vl = m
            bvals[k, :] = m[0]
            bidx[k, :] = il[0] + blk * kbn

    def _denom():
        # softmax normalizer over the global winners; same max-subtraction
        # and ascending-k sum order as jax.nn.softmax on the XLA path
        e = jnp.exp(gvals[0:knn, :] - gvals[0:1, :])
        wvals[0:1, :] = jnp.sum(e, axis=0, keepdims=True)

    def _apply(get_a):
        # ONE-pass weight reconstruction: the selected set is exactly the
        # rows lexicographically >= the k-th global winner (v_k, i_k); each
        # winner's weight exp(a - v_1)/denom is bit-equal to softmax over
        # the extracted values (a == its gvals entry: same dot, same ops).
        # Value path: W stays a live value. In-place path: the scratch that
        # holds the affinity is transformed to W tile-by-tile (read-modify-
        # write of one ref — no affinity-sized temporaries).
        v1 = gvals[0:1, :]
        vk = gvals[knn - 1 : knn, :]
        ik = gidx[knn - 1 : knn, :]
        if inplace:
            # chunked in-place transform affinity -> W (see CH above). A
            # fori_loop, NOT an unrolled chunk loop: unrolled, the compiler
            # keeps every chunk's temporaries live and the register
            # allocator spills ~100 MB of VMEM (measured; the "spill slots"
            # allocation in the OOM dump).
            def wchunk(c, g):
                sl = pl.ds(g * n_rows, c * n_rows)
                a_c = aff[sl, :]
                grow_c = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (c * n_rows, n_lanes), 0
                    )
                    + g * n_rows
                )
                sel_c = (a_c > vk) | ((a_c == vk) & (grow_c <= ik))
                aff[sl, :] = jnp.where(
                    sel_c, jnp.exp(a_c - v1) / wvals[0:1, :], 0.0
                )

            # CH | kb by the divisor clamp: whole chunks cover the block
            jax.lax.fori_loop(
                0, kb // CH, lambda i, _: (wchunk(CH, i * CH), 0)[1], 0
            )
            w = aff[:]
        else:
            grow = row_ids + blk * kbn
            a = get_a()
            sel = (a > vk) | ((a == vk) & (grow <= ik))
            w = jnp.where(sel, jnp.exp(a - v1) / wvals[0:1, :], 0.0)

        contrib = jax.lax.dot_general(
            labels_ref[:],
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (M_pad, N_lanes)
        if n_real < n_lanes:
            # zero padded query columns here so callers that push pred into
            # a label ring need no external cleanup pass (padded queries
            # produce finite garbage; they are never selected as candidates
            # but would otherwise persist in the ring)
            cols = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
            contrib = jnp.where(cols < n_real, contrib, 0.0)

        if single:
            pred_ref[:] = contrib
        else:
            @pl.when(blk == 0)
            def _set():
                pred_ref[:] = contrib

            @pl.when(blk > 0)
            def _acc():
                pred_ref[:] = pred_ref[:] + contrib

    # slots per chunk for the in-place path's read-modify-write passes:
    # full-affinity value expressions would hold (kbn, N_lanes)-sized
    # temporaries on the scoped-VMEM stack (the big single-block plans sit
    # within ~1 MB of the hardware ceiling — measured 127.98M vs 127.55M
    # when the mask-add chain materialized at full size), so the in-place
    # transforms walk static slot chunks with ~CH*N_pad^2-sized temps.
    # RSCRW_CH overrides for benchmarking; like FIND_GROUPS it is clamped
    # to a divisor of kb — the dynamic path's tail zero-fill loop assumes
    # CH | kb (it walks [nch_dyn, kb//CH) whole chunks).
    CH = _find_divisor(kb, int(os.environ.get("RSCRW_CH", "8")))

    def _inplace_affinity():
        # dot + mask + bias + temperature, computed and stored chunk-by-
        # chunk through a fori_loop. Chunking the DOT matters as much as
        # the elementwise ops: the HIGHEST-precision (6-pass bf16) matmul
        # at full (kbn, N_pad) size holds several output-sized partial
        # products — ~100 MB of register-allocator spill slots in the OOM
        # dump — and unrolled chunk loops keep every chunk's temporaries
        # live, which spills just as much.
        def mchunk(c, g):
            sl = pl.ds(g * n_rows, c * n_rows)
            v = jnp.dot(
                feats_ref[sl, :],
                query_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(c, n_rows, n_lanes) + mask_ref[:][None, :, :]
            aff[sl, :] = (
                v.reshape(c * n_rows, n_lanes) + bias_ref[sl, :]
            ) / temp_ref[0, 0]

        # CH | kb by the divisor clamp: whole chunks cover the block
        jax.lax.fori_loop(
            0, kb // CH, lambda i, _: (mchunk(CH, i * CH), 0)[1], 0
        )

    if single:
        # one grid step: the affinity is computed ONCE and reused through
        # extraction and weight reconstruction — as a live value when the
        # working set is small, via the in-place scratch when it is not
        if dynamic:
            # valid-prefix bounding (requires the in-place scratch and a
            # SLOT_CHUNK-multiple kb): affinity, extraction and the W
            # transform walk only the slots valid at this frame, through the
            # shared single-block pipeline (_single_block_pipeline — also
            # the body of the whole-sequence resident kernel v2). min_slots
            # keeps >= knn candidate rows in range so the k-th winner
            # threshold stays finite (the all-rows-selected failure mode of
            # vk == -inf); results are bit-equal to the static kernel —
            # skipped candidates have selection weight exactly 0.0.
            min_slots = -(-knn // n_rows)
            ns = jnp.clip(nslots_ref[0, 0], min_slots, kb)
            pred_ref[:] = _single_block_pipeline(
                aff, bvals, bidx, gvals, gidx, wvals,
                feats_ref, query_ref[:], mask_ref[:],
                lambda s, r: bias_ref[pl.ds(s, r), :],
                labels_ref, temp_ref[0, 0], ns,
                knn=knn, n_rows=n_rows, n_lanes=n_lanes, kb=kb,
                n_real=n_real, ch=CH,
            )
            return
        if inplace:
            _inplace_affinity()
            get_a = lambda: aff[:]  # noqa: E731
        else:
            a = _affinity()
            get_a = lambda: a  # noqa: E731
        _find(get_a)
        gvals[:] = bvals[:]
        gidx[:] = bidx[:]
        _denom()
        _apply(get_a)
        return

    # ---- phase 0: affinity + read-only block top-k + merge ----
    @pl.when(phase == 0)
    def _p0():
        a0 = _affinity()
        _find(lambda: a0)

        @pl.when(blk == 0)
        def _first_block():
            gvals[:] = bvals[:]
            gidx[:] = bidx[:]

        @pl.when(blk > 0)
        def _merge():
            # merge block winners into the running global top-knn; concat
            # order [running, block] keeps global index order on ties
            cat_v = jnp.concatenate(
                [gvals[0:knn, :], bvals[0:knn, :]], axis=0
            )
            cat_i = jnp.concatenate(
                [gidx[0:knn, :], bidx[0:knn, :]], axis=0
            )
            cat_pos = jax.lax.broadcasted_iota(
                jnp.int32, (2 * knn, n_lanes), 0
            )
            first = jnp.full((1, n_lanes), -1, jnp.int32)
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

    # ---- phase 1: recompute the block affinity, reconstruct W, matmul ----
    @pl.when(phase == 1)
    def _p1():
        @pl.when(blk == 0)
        def _d():
            _denom()

        a1 = _affinity()
        _apply(lambda: a1)


def pad_mask(radius_mask_nn, N: int) -> jnp.ndarray:
    """(N, N) additive radius mask -> (N_rows, N_lanes) kernel layout
    (padded candidate ROWS to round_up(N, 8) with NEG_PAD, padded query
    LANES to round_up(N, 128) with 0 — see the row/lane note in
    _prop_step_kernel). Frame-invariant: built once outside the scan."""
    n_rows = _round_up(N, 8)
    n_lanes = _round_up(N, 128)
    mask = jnp.full((n_rows, n_lanes), NEG_PAD, jnp.float32)
    return mask.at[:N, :].set(0.0).at[:N, :N].set(radius_mask_nn)


def prop_step_pallas_prepadded(
    f2d, qT, mask_pad, labT, sb_col, temp, knn: int, kb: int, nblocks: int,
    interpret: bool = False, n_real: int | None = None, bias_rows=None,
    force_inplace: bool | None = None, nslots=None,
):
    """Raw fused step on inputs ALREADY in kernel layout (the propagation
    scan keeps its ring buffer in this layout, so no per-frame pad/copy):
    f2d (K_pad*N_rows, C_pad); qT (C_pad, N_lanes); mask_pad
    (N_rows, N_lanes) from `pad_mask`; labT (M_pad, K_pad*N_rows); sb_col
    (K_pad, 1) slot bias with NEG_PAD on padded slots (ignored when a
    precomputed `bias_rows` (K_pad*N_rows, 1) column is given — the scan
    precomputes these for every frame outside the loop). Returns padded
    pred (M_pad, N_lanes); with n_real set, padded query columns come back
    zeroed (ready for a label ring push).

    nslots: optional traced int32 scalar — the count of slots in the valid
    PREFIX of the ring at this frame (L + min(t, cxt); everything beyond is
    NEG_INVALID-biased, weight exactly 0). Single-block plans then run the
    dynamic valid-prefix kernel: affinity/extraction/W walk only ceil(
    nslots/SLOT_CHUNK) chunks — the ~2x average saving over a T ~= cxt run
    that the static kernel spends on not-yet-written ring slots. Output is
    bit-equal to nslots=None. Requires kb % SLOT_CHUNK == 0 (plan_blocks
    pads single-block plans); ignored on multi-block grids."""
    n_rows, n_lanes = mask_pad.shape
    c_pad = qT.shape[0]
    m_pad = labT.shape[0]
    k_pad = nblocks * kb
    knn_pad = _round_up(knn, 8)
    temp_arr = jnp.full((1, 1), temp, jnp.float32)
    if bias_rows is None:
        # per-slot bias -> per-candidate-row bias column (K_pad*N_rows x 1)
        bias_rows = jnp.broadcast_to(
            sb_col.astype(jnp.float32), (k_pad, n_rows)
        ).reshape(k_pad * n_rows, 1)

    # Value path holds ~4 affinity-sized live temporaries (a, sel, exp, W)
    # plus the feats/labels blocks on the scoped-VMEM stack; when that
    # estimate nears the compiler's scoped-VMEM ceiling, switch the
    # single-block kernel to the in-place scratch variant (measured: the MC3
    # single-block plan needs 126.68 MB on the value path — 700 KB over the
    # limit). The estimate runs ~3% under measured use (123.3 vs 126.68 MB
    # at MC3), so the switch point sits 8% below the ceiling — a plan whose
    # estimate squeaks under the limit would otherwise fail Mosaic's
    # scoped-VMEM check instead of running in-place.
    kbn = kb * n_rows
    value_est = 4 * (4 * kbn * n_lanes + kbn * c_pad + m_pad * kbn)
    inplace = nblocks == 1 and value_est > int(STEP_VMEM_LIMIT * 0.92)
    if force_inplace is not None:
        inplace = force_inplace and nblocks == 1
    dynamic = (
        nslots is not None and nblocks == 1 and kb % SLOT_CHUNK == 0
        and force_inplace is not False
    )
    if dynamic:
        inplace = True  # the valid-prefix loops walk the aff scratch
    nslots_arr = (
        jnp.reshape(nslots.astype(jnp.int32), (1, 1))
        if dynamic
        else jnp.full((1, 1), kb, jnp.int32)
    )
    scratch = [
        pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
        pltpu.VMEM((knn_pad, n_lanes), jnp.int32),
        pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
        pltpu.VMEM((knn_pad, n_lanes), jnp.int32),
        pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
    ]
    if inplace:
        scratch.append(pltpu.VMEM((kbn, n_lanes), jnp.float32))

    return pl.pallas_call(
        functools.partial(
            _prop_step_kernel, knn=knn, n_rows=n_rows, n_lanes=n_lanes,
            kb=kb, nblocks=nblocks,
            n_real=n_lanes if n_real is None else n_real, inplace=inplace,
            dynamic=dynamic,
        ),
        grid=(1, 1) if nblocks == 1 else (2, nblocks),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # temp
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nslots (valid prefix)
            # feats: walk blocks in BOTH phases (phase 1 recomputes the
            # block affinity for the one-pass weight reconstruction)
            pl.BlockSpec((kb * n_rows, c_pad), lambda p, b: (b, 0)),
            pl.BlockSpec((c_pad, n_lanes), lambda p, b: (0, 0)),  # query
            pl.BlockSpec((n_rows, n_lanes), lambda p, b: (0, 0)),  # mask
            pl.BlockSpec((kb * n_rows, 1), lambda p, b: (b, 0)),  # bias rows
            # labels: pinned to block 0 in phase 0, walk blocks in phase 1
            pl.BlockSpec((m_pad, kb * n_rows), lambda p, b: (0, p * b)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_lanes), lambda p, b: (0, 0)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=STEP_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(temp_arr, nslots_arr, f2d, qT, mask_pad, bias_rows, labT)


@functools.partial(
    jax.jit, static_argnames=("knn", "interpret", "vmem_budget", "force_inplace")
)
def prop_step_pallas(
    feats, query, radius_mask_nn, labels, slot_bias, temp, knn: int,
    interpret: bool = False, vmem_budget: int | None = None,
    force_inplace: bool | None = None, nslots=None,
):
    """One fused propagation step on UNPADDED inputs (pads, calls the
    pre-padded kernel, unpads — the standalone/test entry point; the
    propagation scan uses `prop_step_pallas_prepadded` directly on a
    padded-resident ring buffer).

    feats (K, N, C); query (N, C); radius_mask_nn (N, N) additive;
    labels (K, N, M); slot_bias (K,) additive per-slot validity bias
    (pre-temperature, like the radius mask); temp divides the masked
    affinities exactly like the XLA path. Returns pred (N, M).
    """
    K, N, C = feats.shape
    M = labels.shape[-1]
    n_rows = _round_up(N, 8)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    kb = plan_blocks(K, N, C, M, knn, vmem_budget)
    if kb is None:
        raise ValueError(
            f"no block size fits VMEM for K={K}, N={N}, C={C}, M={M}"
        )
    nblocks = -(-K // kb)
    k_pad = nblocks * kb

    f = jnp.zeros((k_pad, n_rows, c_pad), jnp.float32).at[:K, :N, :C].set(feats)
    f = f.reshape(k_pad * n_rows, c_pad)
    n_lanes = _round_up(N, 128)
    q = jnp.zeros((c_pad, n_lanes), jnp.float32).at[:C, :N].set(query.T)
    mask = pad_mask(radius_mask_nn, N)
    lab = jnp.zeros((k_pad, n_rows, m_pad), jnp.float32).at[:K, :N, :M].set(labels)
    lab = lab.reshape(k_pad * n_rows, m_pad).T  # (M_pad, K_pad*N_rows)
    sb = jnp.full((k_pad, 1), NEG_PAD, jnp.float32)
    sb = sb.at[:K, 0].set(slot_bias.astype(jnp.float32))

    pred = prop_step_pallas_prepadded(
        f, q, mask, lab, sb, temp, knn, kb, nblocks, interpret,
        force_inplace=force_inplace,
        nslots=None if nslots is None else jnp.asarray(nslots, jnp.int32),
    )
    return pred[:M, :N].T  # (N, M)


def _prop_seq_v2_kernel(
    temp_ref,  # (1, 1) SMEM: temperature
    embT_ref,  # (1, 1, C_pad, N_lanes) frame t features, transposed (query)
    embP_ref,  # (1, 1, N_rows, C_pad) frame t features (ring-push layout)
    emb0_ref,  # (1, N_rows, C_pad) frame 0 features (ring init)
    seedP_ref,  # (1, N_rows, M_pad) seed labels (ring-push layout)
    mask_ref,  # (N_rows, N_lanes) radius mask (pad_mask layout)
    soft_ref,  # out block: (1, 1, M_pad, N_lanes) this frame's soft labels
    featsS,  # scratch (kb*N_rows, C_pad): feature ring, resident all frames
    labS,  # scratch (kb*N_rows, M_pad): label ring, ROW-major (candidate
    # rows on sublanes — ring pushes use dynamic slot offsets, which Mosaic
    # only allows on the sublane axis; see _single_block_pipeline)
    aff,  # scratch (kb*N_rows, N_lanes): in-place affinity -> W buffer
    bvals, bidx, gvals, gidx, wvals,  # top-k state (as in the step kernel)
    *,
    knn: int,
    n_rows: int,
    n_lanes: int,
    kb: int,
    K: int,
    cxt: int,
    long_mem: tuple,
    n_real: int,
    packs: int = 1,
):
    """Whole-sequence resident propagation, v2 (VERDICT r3 #3): ONE kernel
    launch per radargram stack, grid over frames, ring buffer in VMEM scratch —
    but the per-frame body is the FINAL r3 single-block pipeline
    (_single_block_pipeline: rect row/lane layout, chunked in-place
    affinity, grouped read-only valid-prefix extraction with the
    static-sweep switch, one-pass W reconstruction), unlike the round-2-era
    `_prop_all_kernel` (kept below as the recorded negative result), whose
    full-affinity NEG_SELECTED extraction was what made residency lose.
    Eliminates the per-frame kernel dispatch AND the XLA-side ring
    dynamic_update_slices of the scan path (_prop_step_fused); the ring
    pushes become VMEM scratch writes.

    The grid is (B, T-1) — radargrams on grid dim 0, frames INNERMOST so
    each radargram's frames run in order and the ring scratch re-initializes
    at its first frame (i == 0); B=1 is the single-radargram case
    (propagate_all_pallas_v2 delegates there).

    packs > 1: LANE-PACKED batch items. When N <= n_lanes/packs, a single
    grid step carries `packs` radargrams side by side on the LANE axis —
    item p's query columns at [p*n_lanes/packs, ...), its features on the
    feature axis at [p*c_pad, ...) (the affinity matmul is block-diagonal:
    the rhs query matrix zeroes the off-item feature rows, so cross-item
    products are exactly 0.0), its labels at [p*m_pad, ...) of the label
    ring. The extraction/W passes — the dominant cost at small N, where
    (packs-1)/packs of the 128 VPU lanes would otherwise process padding —
    then serve all `packs` items in one sweep. Per-item math is unchanged;
    the only pack-aware code is the per-item output zeroing span and this
    push's per-item slicing.

    Bit-parity: the pipeline body is shared with the per-frame kernel; the
    slot-validity bias is computed in-kernel from the frame index with
    exactly ops/labelprop.py:_slot_validity's policy (NEG_INVALID on
    not-yet-valid real slots, NEG_PAD on kb-padding slots — matching the
    scan path's precomputed bias columns bit-for-bit)."""
    i = pl.program_id(1)
    emb0, seedP = emb0_ref[0], seedP_ref[0]
    embT, embP = embT_ref[0, 0], embP_ref[0, 0]
    t = i + 1
    L = len(long_mem)
    kbn = kb * n_rows

    @pl.when(i == 0)
    def _init():
        # zero rings: garbage feats would make invalid-slot affinities
        # non-finite before the bias add; garbage labels would turn the
        # exact-0.0 weights of skipped rows into NaN contributions. In the
        # batched grid this re-runs at every radargram's first frame,
        # resetting the ring between batch items.
        featsS[:] = jnp.zeros((kbn, featsS.shape[1]), jnp.float32)
        labS[:] = jnp.zeros((kbn, labS.shape[1]), jnp.float32)
        featsS[L * n_rows : (L + 1) * n_rows, :] = emb0
        labS[L * n_rows : (L + 1) * n_rows, :] = seedP
        for j, fj in enumerate(long_mem):
            if fj == 0:
                featsS[j * n_rows : (j + 1) * n_rows, :] = emb0
                labS[j * n_rows : (j + 1) * n_rows, :] = seedP

    # per-candidate-row validity bias (ops/labelprop.py:_slot_validity):
    # ring slots valid once written (r < t suffices: r < cxt by layout),
    # pins valid once their frame left the recent window; kb-padding slots
    # (>= K) carry NEG_PAD exactly like the scan path's sb_all. Constructed
    # PER CHUNK from an iota + the chunk's start row (Mosaic cannot
    # dynamic_slice a kernel-wide value).
    def bias_at(start_row, n):
        slot_col = (
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) + start_row
        ) // n_rows
        valid = (slot_col >= L) & (slot_col < K) & (slot_col - L < t)
        for j, fj in enumerate(long_mem):
            valid = valid | ((slot_col == j) & (t - fj > cxt))
        return jnp.where(
            valid, 0.0, jnp.where(slot_col < K, NEG_INVALID_F, NEG_PAD)
        ).astype(jnp.float32)

    min_slots = -(-knn // n_rows)
    ns = jnp.clip(L + jnp.minimum(t, cxt), min_slots, kb)
    ch = _find_divisor(kb, int(os.environ.get("RSCRW_CH", "8")))
    pred = _single_block_pipeline(
        aff, bvals, bidx, gvals, gidx, wvals,
        featsS, embT, mask_ref[:], bias_at, labS, temp_ref[0, 0], ns,
        knn=knn, n_rows=n_rows, n_lanes=n_lanes, kb=kb, n_real=n_real, ch=ch,
        labels_rowmajor=True,
        lane_span=None if packs == 1 else n_lanes // packs,
    )
    soft_ref[0, 0] = pred

    # push frame t into the ring (same policy as labelprop._push_frame);
    # the label ring is row-major, so the push stores pred TRANSPOSED at a
    # dynamic SUBLANE offset (lane offsets would need 128-alignment)
    slot = L + jnp.mod(t, cxt)
    if packs == 1:
        pred_store = jnp.transpose(pred[:, :n_rows], (1, 0))  # (N_rows, M_pad)
    else:
        # per-item slices: item p's soft labels live at rows [p*m_item, ...)
        # x lanes [p*span, p*span + n_rows) of the packed prediction
        span = n_lanes // packs
        m_item = labS.shape[1] // packs
        pred_store = jnp.concatenate(
            [
                jnp.transpose(
                    pred[
                        p * m_item : (p + 1) * m_item,
                        p * span : p * span + n_rows,
                    ],
                    (1, 0),
                )
                for p in range(packs)
            ],
            axis=1,
        )  # (N_rows, packs*M_item)
    featsS[pl.ds(slot * n_rows, n_rows), :] = embP
    labS[pl.ds(slot * n_rows, n_rows), :] = pred_store
    for j, fj in enumerate(long_mem):
        if fj == 0:
            continue  # pinned at init; the grid starts at t = 1
        @pl.when(t == fj)
        def _pin(j=j):
            featsS[pl.ds(j * n_rows, n_rows), :] = embP
            labS[pl.ds(j * n_rows, n_rows), :] = pred_store


def plan_seq(K: int, N: int, C: int, M: int, knn: int) -> int | None:
    """kb (slot-padded ring size) for the whole-sequence v2 kernel if its
    working set fits the per-launch VMEM limit; None -> fall back to the
    per-frame scan. Working set: resident rings + the in-place affinity
    scratch + streamed per-frame blocks (double-buffered) + the pipeline's
    chunk temporaries (~2 chunk-sized affinity slices)."""
    n_rows = _round_up(N, 8)
    n_lanes = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(max(knn, 1), 8)
    kb = _round_up(K, SLOT_CHUNK)
    kbn = kb * n_rows
    scratch = 4 * (
        kbn * c_pad  # featsS
        + m_pad * kbn  # labS
        + kbn * n_lanes  # aff
        + 5 * knn_pad * n_lanes
    )
    blocks = 4 * (
        2 * (c_pad * n_lanes + n_rows * c_pad)  # embT + embP, double-buffered
        + n_rows * c_pad  # emb0
        + m_pad * n_rows  # seedT
        + n_rows * n_lanes  # mask
        + 2 * m_pad * n_lanes  # out block
    )
    temporaries = 4 * 2 * SLOT_CHUNK * n_rows * n_lanes
    if scratch + blocks + temporaries <= int(STEP_VMEM_LIMIT * 0.92):
        return kb
    return None


def propagate_all_pallas_v2(
    emb, seed_labels, radius_mask_nn, temp, knn: int, long_mem: tuple,
    cxt: int, interpret: bool = False,
):
    """Whole-sequence resident propagation v2 (see _prop_seq_v2_kernel).

    emb (T, N, C) L2-normalized; seed_labels (N, M); radius_mask_nn (N, N).
    Returns soft (T, N, M) float32 (frame 0 = seed as given), bit-equal to
    the per-frame kernel scan and the XLA path.

    Thin B=1 view of the batched launch below: grid (1, T-1) instead of
    (T-1,), same kernel body, same per-launch VMEM working set — ONE set of
    padding/BlockSpec/scratch tables to maintain (two hand-kept copies had
    already diverged once, on the kernel-name whitelist)."""
    return propagate_all_pallas_v2_batched(
        emb[None], seed_labels[None], radius_mask_nn, temp, knn, long_mem,
        cxt, interpret=interpret,
    )[0]


def seq_autopack(B: int, N: int, C: int, M: int, K: int, knn: int) -> int:
    """The lane-pack factor `propagate_all_pallas_v2_batched`'s
    `packs=None` auto policy selects for this shape: the largest of 4/2
    whose per-item lane span round_up(N,128)//p still holds the
    round_up(N,8) query rows AND whose packed working set `plan_seq`
    accepts, else 1 (unpacked). Pure shape math — callers (the survey
    dispatch in infer/propagate.py) use it to predict whether packing
    engages before choosing a kernel."""
    n_rows = _round_up(N, 8)
    n_lanes = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    for p in (4, 2):
        if (
            B >= 2
            and n_rows <= n_lanes // p
            and plan_seq(K, N, p * c_pad, p * m_pad, knn) is not None
        ):
            return p
    return 1


def propagate_all_pallas_v2_batched(
    emb, seed_labels, radius_mask_nn, temp, knn: int, long_mem: tuple,
    cxt: int, interpret: bool = False, packs: int | None = None,
):
    """Batched whole-sequence resident propagation: ONE kernel launch for a
    whole stack of radargrams, grid (B, T-1) with frames INNERMOST — each
    radargram's frames run in order and the VMEM ring scratch re-initializes
    at its first frame, so the per-frame math (and the VMEM working set,
    `plan_seq`) is exactly the single-radargram v2 kernel's. This closes the
    round-4 limitation that `kernel="pallas_seq"` under
    `propagate_labels_batched` had to fall back to a sequential per-radargram
    `lax.map` (vmap would have prepended the batch as grid dim 0 of the
    UNBATCHED kernel and mis-indexed frames — here the kernel itself is
    batch-aware).

    packs: lane-pack `packs` radargrams per grid step (see
    _prop_seq_v2_kernel). At small N the extraction/W passes — the dominant
    per-frame cost — sweep 128 lanes regardless of N, so (packs-1)/packs of
    the VPU work serves padding; packing fills the lanes with real items
    (grid (ceil(B/packs), T-1)). None = auto: the largest of 4/2 whose
    per-item lane span fits N and whose working set `plan_seq` accepts,
    else 1. A trailing partial pack is padded with item 0 and dropped.
    Measured (v5e, survey shape R=63 x T=100, N=50, C=128, cxt=100,
    knn=20, honest final-fetch timing): packs=2 cuts the whole-stack
    launch 194.9 -> 119.0 ms (1.64x) vs the unpacked seq kernel, and
    beats the per-frame batched path's 188.5 ms by 1.58x — bit-equal
    outputs on hardware at packs 1/2/auto (BASELINE.md r4).

    emb (B, T, N, C) L2-normalized; seed_labels (B, N, M). Returns soft
    (B, T, N, M) float32 (frame 0 = seed as given), bit-equal per radargram
    to propagate_all_pallas_v2 (tested)."""
    B, T, N, C = emb.shape
    M = seed_labels.shape[-1]
    if T == 1:
        return seed_labels.astype(jnp.float32)[:, None]
    L = len(long_mem)
    K = L + cxt
    kb = _round_up(K, SLOT_CHUNK)
    n_rows = _round_up(N, 8)
    n_lanes = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(knn, 8)

    if packs is None:  # auto: fill the lane axis with real items
        packs = seq_autopack(B, N, C, M, K, knn)
    if packs > 1 and (n_rows > n_lanes // packs or n_lanes % packs):
        raise ValueError(
            f"packs={packs} needs n_rows={n_rows} lane-span slots "
            f"(n_lanes={n_lanes})"
        )

    emb = emb.astype(jnp.float32)
    seed_labels = seed_labels.astype(jnp.float32)
    if packs > 1:
        pad = (-B) % packs
        if pad:
            emb = jnp.concatenate(
                [emb, jnp.broadcast_to(emb[:1], (pad, *emb.shape[1:]))]
            )
            seed_labels = jnp.concatenate(
                [
                    seed_labels,
                    jnp.broadcast_to(
                        seed_labels[:1], (pad, *seed_labels.shape[1:])
                    ),
                ]
            )
        Bp = emb.shape[0] // packs
        span = n_lanes // packs
        e2 = emb.reshape(Bp, packs, T, N, C)
        s2 = seed_labels.reshape(Bp, packs, N, M)
        c_tot, m_tot = packs * c_pad, packs * m_pad
        embT = jnp.zeros((Bp, T - 1, c_tot, n_lanes), jnp.float32)
        embP = jnp.zeros((Bp, T - 1, n_rows, c_tot), jnp.float32)
        emb0 = jnp.zeros((Bp, n_rows, c_tot), jnp.float32)
        seedP = jnp.zeros((Bp, n_rows, m_tot), jnp.float32)
        mask = jnp.full((n_rows, n_lanes), NEG_PAD, jnp.float32)
        mask = mask.at[:N, :].set(0.0)
        for p in range(packs):
            # item p: queries at lanes [p*span, ...), features at
            # [p*c_pad, ...), labels at [p*m_pad, ...) — the block-diagonal
            # layout the packed kernel expects
            embT = embT.at[
                :, :, p * c_pad : p * c_pad + C, p * span : p * span + N
            ].set(jnp.transpose(e2[:, p, 1:], (0, 1, 3, 2)))
            embP = embP.at[:, :, :N, p * c_pad : p * c_pad + C].set(
                e2[:, p, 1:]
            )
            emb0 = emb0.at[:, :N, p * c_pad : p * c_pad + C].set(e2[:, p, 0])
            seedP = seedP.at[:, :N, p * m_pad : p * m_pad + M].set(s2[:, p])
            mask = mask.at[:N, p * span : p * span + N].set(radius_mask_nn)
        grid_b, c_k, m_k = Bp, c_tot, m_tot
    else:
        embT = jnp.zeros((B, T - 1, c_pad, n_lanes), jnp.float32)
        embT = embT.at[:, :, :C, :N].set(jnp.transpose(emb[:, 1:], (0, 1, 3, 2)))
        embP = jnp.zeros((B, T - 1, n_rows, c_pad), jnp.float32)
        embP = embP.at[:, :, :N, :C].set(emb[:, 1:])
        emb0 = jnp.zeros((B, n_rows, c_pad), jnp.float32).at[:, :N, :C].set(
            emb[:, 0]
        )
        seedP = jnp.zeros((B, n_rows, m_pad), jnp.float32)
        seedP = seedP.at[:, :N, :M].set(seed_labels)
        mask = pad_mask(radius_mask_nn, N)
        grid_b, c_k, m_k = B, c_pad, m_pad
    temp_arr = jnp.full((1, 1), temp, jnp.float32)

    soft = pl.pallas_call(
        functools.partial(
            _prop_seq_v2_kernel, knn=knn, n_rows=n_rows, n_lanes=n_lanes,
            kb=kb, K=K, cxt=cxt, long_mem=long_mem, n_real=N, packs=packs,
        ),
        grid=(grid_b, T - 1),
        out_shape=jax.ShapeDtypeStruct(
            (grid_b, T - 1, m_k, n_lanes), jnp.float32
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # temp
            pl.BlockSpec((1, 1, c_k, n_lanes), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, n_rows, c_k), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, n_rows, c_k), lambda b, i: (b, 0, 0)),  # emb0
            pl.BlockSpec((1, n_rows, m_k), lambda b, i: (b, 0, 0)),  # seedP
            pl.BlockSpec((n_rows, n_lanes), lambda b, i: (0, 0)),  # mask
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m_k, n_lanes), lambda b, i: (b, i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((kb * n_rows, c_k), jnp.float32),  # featsS
            pltpu.VMEM((kb * n_rows, m_k), jnp.float32),  # labS (row-major)
            pltpu.VMEM((kb * n_rows, n_lanes), jnp.float32),  # aff
            pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
            pltpu.VMEM((knn_pad, n_lanes), jnp.int32),
            pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
            pltpu.VMEM((knn_pad, n_lanes), jnp.int32),
            pltpu.VMEM((knn_pad, n_lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=STEP_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(temp_arr, embT, embP, emb0, seedP, mask)
    if packs > 1:
        span = n_lanes // packs
        parts = [
            jnp.transpose(
                soft[:, :, p * m_pad : p * m_pad + M, p * span : p * span + N],
                (0, 1, 3, 2),
            )
            for p in range(packs)
        ]
        soft_rest = jnp.stack(parts, axis=1).reshape(
            grid_b * packs, T - 1, N, M
        )[:B]
        seeds_b = seed_labels[:B]
    else:
        soft_rest = jnp.transpose(soft[:, :, :M, :N], (0, 1, 3, 2))
        seeds_b = seed_labels
    return jnp.concatenate([seeds_b[:, None], soft_rest], axis=1)


def _prop_all_kernel(
    temp_ref,  # (1, 1) SMEM: temperature
    embT_ref,  # (1, C_pad, N_pad) frame t features, transposed (query)
    embP_ref,  # (1, N_pad, C_pad) frame t features (ring-push layout)
    emb0_ref,  # (N_pad, C_pad) frame 0 features (ring init)
    seedT_ref,  # (M_pad, N_pad) seed labels, transposed
    mask_ref,  # (N_pad, N_pad) radius mask (+NEG_PAD on padding rows)
    soft_ref,  # out block: (1, M_pad, N_pad) this frame's soft labels
    featsS,  # scratch (K*N_pad, C_pad): the feature ring, resident all frames
    labS,  # scratch (M_pad, K*N_pad): the label ring
    aff,  # scratch (K*N_pad, N_pad): affinity -> extraction marks -> W
    orig,  # scratch (K*N_pad, N_pad): affinity copy (weight reconstruction)
    bvals,  # scratch (KNN_PAD, N_pad): top-k values, sorted desc
    *,
    knn: int,
    n_pad: int,
    K: int,
    cxt: int,
    long_mem: tuple,
    N: int,
):
    """Whole-sequence fused propagation: ONE kernel launch per radargram,
    grid over frames, the context ring buffer resident in VMEM scratch.

    RECORDED NEGATIVE RESULT (v5e, 2026-08-17): 554.4 ms MC3 / 118.6 ms
    SHARAD per 100 frames vs the tiled per-frame kernel's 83.7 / 42.6.
    The hypothesis was that the per-frame kernel dispatch + carry-prep
    floor (~0.35 ms/frame) dominated; in fact running the knn serial
    extraction passes over the full un-tiled (K*N_pad, N_pad) affinity
    (no context-block tiling inside one launch) costs several times more
    than the dispatch overhead saved, and super-linearly so at MC3 where
    the working set (~114 MB scoped VMEM) nears the v5e ceiling. Kept
    correct + tested as the record; never auto-routed.

    Design notes that remain of value: selection weights are reconstructed
    in ONE vectorized pass — winners are the rows extraction marked
    NEG_SELECTED, each weighted exp(orig - max)/sum(exp(topk - max)),
    bit-identical to softmax over the extracted values — instead of knn
    scatter passes.
    """
    i = pl.program_id(0)
    t = i + 1
    L = len(long_mem)
    kpn = K * n_pad

    @pl.when(i == 0)
    def _init():
        featsS[:] = jnp.zeros_like(featsS)
        labS[:] = jnp.zeros_like(labS)
        featsS[L * n_pad : (L + 1) * n_pad, :] = emb0_ref[:]
        labS[:, L * n_pad : (L + 1) * n_pad] = seedT_ref[:]
        for j, fj in enumerate(long_mem):
            if fj == 0:
                featsS[j * n_pad : (j + 1) * n_pad, :] = emb0_ref[:]
                labS[:, j * n_pad : (j + 1) * n_pad] = seedT_ref[:]

    # per-slot validity bias, computed arithmetically from the frame index
    # (same policy as ops/labelprop.py:_slot_validity): ring slots valid once
    # written; pins valid once their frame left the recent window
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (kpn, 1), 0) // n_pad
    valid = (slot_col >= L) & (slot_col - L < t)
    for j, fj in enumerate(long_mem):
        valid = valid | ((slot_col == j) & (t - fj > cxt))
    bias = jnp.where(valid, 0.0, NEG_INVALID_F)

    temp = temp_ref[0, 0]
    a = jnp.dot(
        featsS[:],
        embT_ref[0],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a = a.reshape(K, n_pad, n_pad) + mask_ref[:][None, :, :]
    a = (a.reshape(kpn, n_pad) + bias) / temp
    orig[:] = a
    aff[:] = a

    # iterative max-extraction of the top-knn (lowest row wins ties); every
    # winner stays marked NEG_SELECTED in `aff` for the weight pass
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kpn, n_pad), 0)
    prev = jnp.full((1, n_pad), -1, jnp.int32)
    for k in range(knn):
        a2 = jnp.where(row_ids == prev, NEG_SELECTED, aff[:])
        m = jnp.max(a2, axis=0, keepdims=True)
        prev = jnp.min(jnp.where(a2 == m, row_ids, kpn), axis=0, keepdims=True)
        bvals[k, :] = m[0]
        aff[:] = a2
    aff[:] = jnp.where(row_ids == prev, NEG_SELECTED, aff[:])

    # ONE-pass weight matrix: W[r,q] = exp(orig - max)/denom on winner rows
    v0 = bvals[0:1, :]
    denom = jnp.sum(jnp.exp(bvals[0:knn, :] - v0), axis=0, keepdims=True)
    aff[:] = jnp.where(
        aff[:] == NEG_SELECTED, jnp.exp(orig[:] - v0) / denom, 0.0
    )

    pred = jax.lax.dot_general(
        labS[:],
        aff[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (M_pad, N_pad)
    # zero padded query columns: their garbage predictions would otherwise
    # persist in the label ring
    col_ids = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
    pred = jnp.where(col_ids < N, pred, 0.0)
    soft_ref[0] = pred

    # push frame t into the ring (+ pin slots when their frame comes up)
    slot = L + jnp.mod(t, cxt)
    featsS[pl.ds(slot * n_pad, n_pad), :] = embP_ref[0]
    labS[:, pl.ds(slot * n_pad, n_pad)] = pred
    for j, fj in enumerate(long_mem):
        @pl.when(t == fj)
        def _pin(j=j):
            featsS[j * n_pad : (j + 1) * n_pad, :] = embP_ref[0]
            labS[:, j * n_pad : (j + 1) * n_pad] = pred


def propagate_all_pallas(
    emb, seed_labels, radius_mask_nn, temp, knn: int, long_mem: tuple,
    cxt: int, interpret: bool = False,
):
    """Whole-sequence resident propagation (see _prop_all_kernel).

    emb (T, N, C) L2-normalized; seed_labels (N, M); radius_mask_nn (N, N).
    Returns soft (T, N, M) float32 (frame 0 = seed as given).
    """
    T, N, C = emb.shape
    M = seed_labels.shape[-1]
    if T == 1:
        # single-frame sequence: nothing to propagate — return the seed,
        # like the XLA/tiled paths' empty scan (a (0,)-length grid with
        # zero-size embT/embP blocks is rejected by pallas_call)
        return seed_labels.astype(jnp.float32)[None]
    L = len(long_mem)
    K = L + cxt
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    m_pad = _round_up(M, 8)
    knn_pad = _round_up(knn, 8)

    emb = emb.astype(jnp.float32)
    embT = jnp.zeros((T - 1, c_pad, n_pad), jnp.float32)
    embT = embT.at[:, :C, :N].set(jnp.transpose(emb[1:], (0, 2, 1)))
    embP = jnp.zeros((T - 1, n_pad, c_pad), jnp.float32).at[:, :N, :C].set(emb[1:])
    emb0 = jnp.zeros((n_pad, c_pad), jnp.float32).at[:N, :C].set(emb[0])
    seedT = jnp.zeros((m_pad, n_pad), jnp.float32)
    seedT = seedT.at[:M, :N].set(seed_labels.astype(jnp.float32).T)
    # this legacy kernel keeps the square lane-padded candidate layout
    # (pad_mask now builds the per-frame kernel's rectangular rows/lanes one)
    mask = jnp.full((n_pad, n_pad), NEG_PAD, jnp.float32)
    mask = mask.at[:N, :].set(0.0).at[:N, :N].set(radius_mask_nn)
    temp_arr = jnp.full((1, 1), temp, jnp.float32)

    soft = pl.pallas_call(
        functools.partial(
            _prop_all_kernel, knn=knn, n_pad=n_pad, K=K, cxt=cxt,
            long_mem=long_mem, N=N,
        ),
        grid=(T - 1,),
        out_shape=jax.ShapeDtypeStruct((T - 1, m_pad, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # temp
            pl.BlockSpec((1, c_pad, n_pad), lambda i: (i, 0, 0)),  # embT
            pl.BlockSpec((1, n_pad, c_pad), lambda i: (i, 0, 0)),  # embP
            pl.BlockSpec((n_pad, c_pad), lambda i: (0, 0)),  # emb0
            pl.BlockSpec((m_pad, n_pad), lambda i: (0, 0)),  # seedT
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0)),  # mask
        ],
        out_specs=pl.BlockSpec((1, m_pad, n_pad), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K * n_pad, c_pad), jnp.float32),
            pltpu.VMEM((m_pad, K * n_pad), jnp.float32),
            pltpu.VMEM((K * n_pad, n_pad), jnp.float32),
            pltpu.VMEM((K * n_pad, n_pad), jnp.float32),
            pltpu.VMEM((knn_pad, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=RESIDENT_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(temp_arr, embT, embP, emb0, seedT, mask)
    soft_rest = jnp.transpose(soft[:, :M, :N], (0, 2, 1))  # (T-1, N, M)
    return jnp.concatenate(
        [seed_labels.astype(jnp.float32)[None], soft_rest], axis=0
    )

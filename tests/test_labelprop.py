"""Label propagation: golden tests against an independent numpy oracle of
the documented growing-context semantics (frame-0 long-term memory + last
CXT_SIZE frames, radius mask, temperature after mask, topk-then-softmax,
weighted soft-label sum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_sounder_crw_tpu.ops.labelprop import (
    LabelPropConfig,
    propagate_labels,
    propagate_labels_batched,
    radius_mask,
)


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def oracle_propagate(emb, seed, cfg: LabelPropConfig):
    """Growing-list implementation with consistent feature/label trimming."""
    T, N, C = emb.shape
    feats, labels = [emb[0]], [seed]
    out = [seed]
    m = np.where(
        np.abs(np.arange(N)[:, None] - np.arange(N)[None, :]) < cfg.radius,
        0.0,
        -1e10,
    )
    for t in range(1, T):
        if len(feats) > cfg.cxt_size + 1:
            cf = [feats[0]] + feats[-cfg.cxt_size :]
            cl = [labels[0]] + labels[-cfg.cxt_size :]
        else:
            cf, cl = list(feats), list(labels)
        K = np.concatenate(cf, 0)  # (n*N, C)
        L = np.concatenate(cl, 0)  # (n*N, M)
        aff = K @ emb[t].T + np.tile(m, (len(cf), 1))
        aff = aff / cfg.temperature
        idx = np.argsort(-aff, axis=0, kind="stable")[: cfg.knn]  # (k, N)
        vals = np.take_along_axis(aff, idx, 0)
        w = np_softmax(vals, axis=0)
        pred = np.einsum("kn,knm->nm", w, L[idx])
        feats.append(emb[t])
        labels.append(pred)
        out.append(pred)
    return np.stack(out)


def random_emb(T, N, C, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((T, N, C)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def onehot_seed(N, M, seed=1):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, M, N)
    return np.eye(M, dtype=np.float32)[lab]


@pytest.mark.parametrize(
    "T,ctx,radius,knn",
    [
        (6, 10, 4, 3),  # no trimming (T <= ctx+1): matches reference exactly
        (12, 4, 5, 4),  # trimming active: intended (bug-fixed) semantics
        (9, 1, 12, 6),  # tiny context
    ],
)
def test_matches_oracle(T, ctx, radius, knn):
    N, C, M = 12, 16, 4
    emb = random_emb(T, N, C)
    seed = onehot_seed(N, M)
    cfg = LabelPropConfig(cxt_size=ctx, radius=radius, temperature=0.07, knn=knn)

    want = oracle_propagate(emb, seed, cfg)
    soft, pred = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg)
    np.testing.assert_allclose(np.asarray(soft), want, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pred), want.argmax(-1))


def test_identical_embeddings_keep_labels():
    """If every frame embeds identically and radius=1 (self only), the seed
    labels persist unchanged through the sequence."""
    N, M, T = 8, 3, 5
    e = random_emb(1, N, 32)[0]
    emb = np.broadcast_to(e, (T, N, 32)).copy()
    seed = onehot_seed(N, M, seed=3)
    cfg = LabelPropConfig(cxt_size=10, radius=1, temperature=0.01, knn=1)
    soft, pred = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg)
    for t in range(T):
        np.testing.assert_array_equal(np.asarray(pred[t]), seed.argmax(-1))


def test_batched_vmap():
    B, T, N, C, M = 3, 5, 10, 8, 4
    emb = np.stack([random_emb(T, N, C, seed=i) for i in range(B)])
    seeds = np.stack([onehot_seed(N, M, seed=i) for i in range(B)])
    cfg = LabelPropConfig(cxt_size=6, radius=4, temperature=0.1, knn=3)
    soft, pred = propagate_labels_batched(
        jnp.asarray(emb), jnp.asarray(seeds), cfg, None, "xla"
    )
    assert soft.shape == (B, T, N, M)
    assert pred.shape == (B, T, N)
    for i in range(B):  # every item, soft AND argmax
        s_i, p_i = propagate_labels(
            jnp.asarray(emb[i]), jnp.asarray(seeds[i]), cfg, None, "xla"
        )
        np.testing.assert_allclose(
            np.asarray(soft[i]), np.asarray(s_i), rtol=1e-5, atol=1e-7,
            err_msg=f"item {i}",
        )
        np.testing.assert_array_equal(np.asarray(pred[i]), np.asarray(p_i))


def test_knn_exceeding_candidates_is_clamped():
    """knn larger than the context candidate count must not crash (top_k
    would reject k > axis size); both kernels agree after clamping."""
    T, N, C, M = 4, 4, 8, 3
    emb = random_emb(T, N, C, seed=9)
    seed = onehot_seed(N, M, seed=9)
    cfg = LabelPropConfig(cxt_size=1, radius=2, temperature=0.1, knn=50)
    s1, p1 = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla")
    s2, p2 = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, None, "pallas_interpret"
    )
    assert np.isfinite(np.asarray(s1)).all()
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("qb", [4, 7, 64])
def test_query_chunked_matches_plain(qb):
    """The memory-bounded query-chunked XLA path (reference capability:
    mem_efficient_batched_affinity, maskedatt.py:177-207) matches the
    unchunked step on a general (h, w) patch grid — including block sizes
    that do not divide N and blocks larger than N. (Bit-identical on TPU;
    XLA:CPU matmul blocking depends on shape, so CPU allows ulp-level
    reassociation differences.)"""
    T, h, w, C, M = 7, 6, 5, 16, 4
    N = h * w
    emb = random_emb(T, N, C, seed=5)
    seed = onehot_seed(N, M, seed=5)
    cfg = LabelPropConfig(cxt_size=3, radius=2.5, temperature=0.08, knn=5)
    s0, p0 = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg, (h, w), "xla")
    s1, p1 = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, (h, w), "xla", qb
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    # auto with query_block set must resolve to the chunked XLA path,
    # and the fused kernel must reject it explicitly
    s2, _ = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, (h, w), "auto", qb
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-6, atol=0)
    with pytest.raises(ValueError, match="query_block"):
        propagate_labels(
            jnp.asarray(emb), jnp.asarray(seed), cfg, (h, w),
            "pallas_interpret", qb
        )


@pytest.mark.parametrize(
    "K,N,Q,knn,dup",
    [
        (5, 7, 6, 4, False),
        (3, 4, 5, 10, False),  # knn > per-slot N (and > some-slot coverage)
        (4, 6, 6, 5, True),  # heavy ties: duplicated values across slots
        (2, 3, 4, 6, True),  # knn == K*N exactly, with ties
    ],
)
def test_two_stage_topk_bitequal_flat(K, N, Q, knn, dup):
    """The per-slot + merge top-k must be BIT-equal to lax.top_k over the
    flat candidate axis — values AND indices, including tie ordering (ties
    resolve toward the lower global candidate index). Tie-heavy inputs
    (duplicated values, masked -1e10 fills) exercise the ordering contract."""
    import jax

    from radar_sounder_crw_tpu.ops.labelprop import _topk_candidates

    rng = np.random.default_rng(K * 100 + N)
    aff = rng.standard_normal((K, N, Q)).astype(np.float32)
    if dup:
        # quantize so many exact ties occur, incl. across slots
        aff = np.round(aff * 2) / 2
        aff[1] = aff[0]  # whole duplicated slot
    knn = min(knn, K * N)
    flat = jnp.asarray(aff).reshape(K * N, Q).T
    want_v, want_i = jax.lax.top_k(flat, knn)
    got_v, got_i = _topk_candidates(jnp.asarray(aff), knn)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_radius_mask_column_and_grid():
    m = radius_mask(6, 1, 2)
    want = np.where(
        np.abs(np.arange(6)[:, None] - np.arange(6)[None, :]) < 2, 0.0, -1e10
    )
    np.testing.assert_array_equal(m, want)
    # 2-D grid: brute-force Euclidean check
    m2 = radius_mask(3, 4, 1.5)
    for a in range(12):
        for b in range(12):
            ya, xa, yb, xb = a // 4, a % 4, b // 4, b % 4
            d = ((ya - yb) ** 2 + (xa - xb) ** 2) ** 0.5
            assert m2[a, b] == (0.0 if d < 1.5 else -1e10)


def test_long_mem_kernel_paths_agree():
    """Generalized pinned memory: xla, query-chunked and interpret-mode
    fused kernels agree through pin-activation transitions."""
    T, N, C, M = 14, 10, 8, 4
    emb = random_emb(T, N, C, seed=21)
    seed = onehot_seed(N, M, seed=21)
    cfg = LabelPropConfig(
        cxt_size=3, radius=4, temperature=0.07, knn=5, long_mem=(0, 2, 6)
    )
    s_x, p_x = propagate_labels(jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla")
    s_c, p_c = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla", query_block=4
    )
    s_p, p_p = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, None, "pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_x), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(p_c), np.asarray(p_x))
    np.testing.assert_array_equal(np.asarray(p_p), np.asarray(p_x))


def test_long_mem_pin_changes_result_when_out_of_window():
    """Pinning a mid-sequence frame must change predictions after that frame
    leaves the recent window (i.e. the pin is actually consulted)."""
    T, N, C, M = 14, 10, 8, 4
    emb = random_emb(T, N, C, seed=22)
    seed = onehot_seed(N, M, seed=22)
    base = dict(cxt_size=3, radius=100, temperature=0.07, knn=5)
    s0, _ = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed),
        LabelPropConfig(**base, long_mem=(0,)), None, "xla",
    )
    s1, _ = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed),
        LabelPropConfig(**base, long_mem=(0, 5)), None, "xla",
    )
    # identical until frame 5 leaves the window (t <= 5+cxt): first diff after
    np.testing.assert_allclose(
        np.asarray(s1[: 5 + 3 + 1]), np.asarray(s0[: 5 + 3 + 1]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(s1), np.asarray(s0))


def test_long_mem_validation():
    emb = jnp.asarray(random_emb(4, 6, 8, seed=1))
    seed = jnp.asarray(onehot_seed(6, 3, seed=1))
    for bad in [(2, 1), (0, 0), (-1,)]:
        with pytest.raises(ValueError, match="long_mem"):
            propagate_labels(
                emb, seed,
                LabelPropConfig(cxt_size=2, long_mem=bad), None, "xla",
            )


def test_knn_validation():
    emb = jnp.asarray(random_emb(4, 6, 8, seed=1))
    seed = jnp.asarray(onehot_seed(6, 3, seed=1))
    for bad in (0, -3):
        with pytest.raises(ValueError, match="knn"):
            propagate_labels(
                emb, seed,
                LabelPropConfig(cxt_size=2, knn=bad), None, "xla",
            )


def test_resident_kernel_matches_xla():
    """Whole-sequence resident kernel (interpret mode) == XLA path,
    including argmax, for default and multi-pin long_mem configs. (The
    resident kernel is a recorded negative perf result — explicitly
    selectable, never auto-routed — but must stay correct.)"""
    T, N, C, M = 12, 10, 8, 4
    emb = random_emb(T, N, C, seed=31)
    seed = onehot_seed(N, M, seed=31)
    for lm in [(0,), (0, 2, 5), ()]:
        cfg = LabelPropConfig(
            cxt_size=4, radius=4, temperature=0.07, knn=5, long_mem=lm
        )
        s_x, p_x = propagate_labels(
            jnp.asarray(emb), jnp.asarray(seed), cfg, None, "xla"
        )
        s_r, p_r = propagate_labels(
            jnp.asarray(emb), jnp.asarray(seed), cfg, None,
            "pallas_resident_interpret",
        )
        s_t, p_t = propagate_labels(
            jnp.asarray(emb), jnp.asarray(seed), cfg, None,
            "pallas_interpret",
        )
        np.testing.assert_allclose(
            np.asarray(s_r), np.asarray(s_x), rtol=1e-4, atol=1e-6,
            err_msg=f"long_mem={lm}",
        )
        np.testing.assert_array_equal(np.asarray(p_r), np.asarray(p_x))
        np.testing.assert_allclose(
            np.asarray(s_t), np.asarray(s_x), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(p_t), np.asarray(p_x))


def test_resident_kernel_vmap_matches_per_item():
    """The resident kernel under vmap (the batched full-survey path) must
    equal per-item calls — guards the pallas batching-rule/grid interaction
    (program_id axes shift when vmap prepends a batch grid dimension)."""
    B, T, N, C, M = 3, 8, 10, 8, 4
    emb = np.stack([random_emb(T, N, C, seed=40 + i) for i in range(B)])
    seeds = np.stack([onehot_seed(N, M, seed=40 + i) for i in range(B)])
    cfg = LabelPropConfig(cxt_size=4, radius=4, temperature=0.07, knn=4)
    soft_b, pred_b = propagate_labels_batched(
        jnp.asarray(emb), jnp.asarray(seeds), cfg, None,
        "pallas_resident_interpret",
    )
    for i in range(B):
        s_i, p_i = propagate_labels(
            jnp.asarray(emb[i]), jnp.asarray(seeds[i]), cfg, None,
            "pallas_resident_interpret",
        )
        np.testing.assert_allclose(
            np.asarray(soft_b[i]), np.asarray(s_i), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(pred_b[i]), np.asarray(p_i))


def test_tiled_kernel_vmap_matches_per_item():
    """The tiled per-frame fused kernel under vmap — the kernel the batched
    TPU production path (propagate_batch -> kernel='auto') actually routes
    to — must equal per-item calls, with and without the dynamic
    valid-prefix path's SMEM nslots scalar in play (multi-pin long_mem
    exercises pinned-slot handling under the batch grid dimension too)."""
    B, T, N, C, M = 3, 9, 10, 8, 4
    emb = np.stack([random_emb(T, N, C, seed=80 + i) for i in range(B)])
    seeds = np.stack([onehot_seed(N, M, seed=80 + i) for i in range(B)])
    for lm in ((0,), (0, 2)):
        cfg = LabelPropConfig(
            cxt_size=4, radius=4, temperature=0.07, knn=4, long_mem=lm
        )
        soft_b, pred_b = propagate_labels_batched(
            jnp.asarray(emb), jnp.asarray(seeds), cfg, None, "pallas_interpret"
        )
        for i in range(B):
            s_i, p_i = propagate_labels(
                jnp.asarray(emb[i]), jnp.asarray(seeds[i]), cfg, None,
                "pallas_interpret",
            )
            np.testing.assert_allclose(
                np.asarray(soft_b[i]), np.asarray(s_i), rtol=1e-5, atol=1e-7,
                err_msg=f"long_mem={lm} item={i}",
            )
            np.testing.assert_array_equal(np.asarray(pred_b[i]), np.asarray(p_i))


def test_batch_block_matches_unchunked():
    """batch_block chunking (the reference's bsize mini-batching analogue,
    maskedatt.py:177-181) must be a pure memory knob: identical results,
    including a trailing partial chunk (B=5, bb=2)."""
    B, T, N, C, M = 5, 8, 10, 8, 4
    emb = np.stack([random_emb(T, N, C, seed=60 + i) for i in range(B)])
    seeds = np.stack([onehot_seed(N, M, seed=60 + i) for i in range(B)])
    cfg = LabelPropConfig(cxt_size=4, radius=4, temperature=0.07, knn=4)
    s0, p0 = propagate_labels_batched(
        jnp.asarray(emb), jnp.asarray(seeds), cfg, None, "xla"
    )
    for bb in (1, 2, 5, 9):
        s1, p1 = propagate_labels_batched(
            jnp.asarray(emb), jnp.asarray(seeds), cfg, None, "xla",
            batch_block=bb,
        )
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s0), rtol=1e-6, atol=1e-7,
            err_msg=f"batch_block={bb}",
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    with pytest.raises(ValueError):
        propagate_labels_batched(
            jnp.asarray(emb), jnp.asarray(seeds), cfg, None, "xla",
            batch_block=0,
        )

"""Device-resident survey inference (PropagationPipeline.propagate_survey):
equality with the host-staged propagate_batch and the sequential pipeline
across every pass the product scripts run (VERDICT r3 #1), on the forced
8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radar_sounder_crw_tpu.data import (
    ConcatWindows,
    RGWindows,
    synthetic_radargram,
)
from radar_sounder_crw_tpu.infer import PropagationPipeline
from radar_sounder_crw_tpu.models import create_model
from radar_sounder_crw_tpu.ops import LabelPropConfig


def _make_pipe(nclasses=4, model_id=0, **kw):
    model = create_model(model_id, False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False
    )
    return PropagationPipeline(
        model, dict(variables), LabelPropConfig(4, 4, 0.1, 3),
        nclasses=nclasses, **kw,
    )


@pytest.fixture(scope="module")
def single_rg():
    rg, seg = synthetic_radargram(H=72, W=800, nclasses=4, seed=3)
    T = 8
    ds = RGWindows(rg, length=T, dim=(16, 16), overlap=(8, 0))
    pipe = _make_pipe()
    ids = list(range(0, len(ds), T))[:5]  # R=5: uneven over the 8-dev mesh
    geo = ds.geo
    refs = [
        seg[: geo.rg_h(), geo.col_start(i) : geo.col_start(i) + 16] for i in ids
    ]
    return ds, pipe, ids, refs


def test_survey_matches_host_staged_forward(single_rg):
    ds, pipe, ids, refs = single_rg
    seqs = np.stack([ds[i] for i in ids])
    base, ch_base = pipe.propagate_batch(seqs, refs, detect_change=True)
    got, ch_got = pipe.propagate_survey(ds, ids, refs, detect_change=True)
    np.testing.assert_array_equal(base, got)
    assert ch_base == ch_got


def test_survey_matches_host_staged_reverse(single_rg):
    ds, pipe, ids, refs = single_rg
    seqs = np.stack([ds[i] for i in ids])
    np.testing.assert_array_equal(
        pipe.propagate_batch(seqs, refs, use_last=True),
        pipe.propagate_survey(ds, ids, refs, use_last=True),
    )


def test_survey_matches_host_staged_xent(single_rg):
    ds, pipe, ids, refs = single_rg
    seqs = np.stack([ds[i] for i in ids])
    _, xb = pipe.propagate_batch(seqs, refs, return_xent=True)
    _, xs = pipe.propagate_survey(ds, ids, refs, return_xent=True)
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(xs))


def test_survey_correction_head_and_tail_windows(single_rg):
    """Both correction variants are resident gathers: the head window of
    small_length frames (reference test_all.py:114 get_smaller_item) and the
    true frame tail [change_idx:] (reference test_mc3.py:126) via
    frame_offsets."""
    ds, pipe, ids, refs = single_rg
    Ts = 5
    head_host = pipe.propagate_batch(
        np.stack([ds.get_smaller_item(i, Ts) for i in ids]), refs
    )
    head_res = pipe.propagate_survey(ds, ids, refs, length=Ts)
    np.testing.assert_array_equal(head_host, head_res)

    ci = 3
    tail_host = pipe.propagate_batch(np.stack([ds[i][ci:] for i in ids]), refs)
    tail_res = pipe.propagate_survey(
        ds, ids, refs, length=8 - ci, frame_offsets=[ci] * len(ids)
    )
    np.testing.assert_array_equal(tail_host, tail_res)


def test_survey_matches_sequential_r11_8dev(single_rg):
    """R=11 (not divisible by the 8-device mesh) resident survey equals the
    sequential per-radargram pipeline bit-for-bit (VERDICT r3 #7 mesh
    criterion)."""
    ds, pipe, _, _ = single_rg
    assert jax.device_count() >= 8
    rg, seg = synthetic_radargram(H=72, W=800, nclasses=4, seed=3)
    geo = ds.geo
    ids = list(range(11))
    refs = [
        seg[: geo.rg_h(), geo.col_start(i) : geo.col_start(i) + 16] for i in ids
    ]
    got = pipe.propagate_survey(ds, ids, refs)
    assert got.shape == (11, geo.nh, geo.length)
    for k, (i, r) in enumerate(zip(ids, refs)):
        res = pipe(ds[i], r, detect_change=False)
        np.testing.assert_array_equal(got[k], res.prediction, err_msg=f"rg {k}")


def test_survey_seq_kernel_shard_mapped_8dev(single_rg):
    """kernel='pallas_seq' under a >1-device mesh: the batched seq kernel is
    ONE pallas_call over grid (B, T-1), which GSPMD cannot partition along
    B — left to the partitioner it would all-gather the batch and replicate
    the whole sequential grid on every device. The survey paths shard_map it
    instead, each device launching over its local batch shard. 8-device ==
    1-device bit-for-bit (same kernel, interpret mode on the CPU mesh), on
    both the resident and the host-staged batched paths."""
    ds, _, ids, refs = single_rg
    assert jax.device_count() >= 8
    from radar_sounder_crw_tpu.parallel import make_mesh

    pipe_seq = _make_pipe(kernel="pallas_seq_interpret")
    mesh1 = make_mesh(jax.devices()[:1])
    base, ch_base = pipe_seq.propagate_survey(
        ds, ids, refs, mesh=mesh1, detect_change=True
    )
    got, ch_got = pipe_seq.propagate_survey(ds, ids, refs, detect_change=True)
    np.testing.assert_array_equal(base, got)
    assert ch_base == ch_got
    seqs = np.stack([ds[i] for i in ids])
    np.testing.assert_array_equal(base, pipe_seq.propagate_batch(seqs, refs))


def test_survey_stacked_multi_radargram_matches_sequential():
    """ConcatWindows source (the qualitative scripts' QualitativeSurvey
    layout): radargrams of DIFFERENT widths sharing one window shape, each a
    full-width window, gathered from the zero-padded device stack."""
    patch, overlap, T = (16, 16), (8, 0), 6
    pxw = T * 16
    rgs, segs = [], []
    for s, w_extra in zip((5, 6, 7), (0, 3, 7)):  # widths differ < (w-ow)
        rg, seg = synthetic_radargram(H=72, W=pxw + w_extra, nclasses=4, seed=s)
        rgs.append(rg)
        segs.append(seg)
    sets = [RGWindows(r, length=T, dim=patch, overlap=overlap) for r in rgs]
    cat = ConcatWindows(sets)
    assert len(cat) == 3  # one full-width window each
    pipe = _make_pipe()
    geo = cat.geo
    refs = [s[: geo.rg_h(), :16] for s in segs]

    got = pipe.propagate_survey(cat, [0, 1, 2], refs)
    for k in range(3):
        res = pipe(sets[k][0], refs[k], detect_change=False)
        np.testing.assert_array_equal(got[k], res.prediction, err_msg=f"rg {k}")

    # reverse + tail correction on the stacked source
    rev = pipe.propagate_survey(cat, [0, 1, 2], refs, use_last=True)
    for k in range(3):
        res = pipe(sets[k][0], refs[k], use_last=True, detect_change=False)
        np.testing.assert_array_equal(rev[k], res.prediction, err_msg=f"rg {k}")
    ci = 2
    tail = pipe.propagate_survey(
        cat, [0, 1, 2], refs, length=T - ci, frame_offsets=[ci] * 3
    )
    for k in range(3):
        res = pipe(sets[k][0][ci:], refs[k], detect_change=False)
        np.testing.assert_array_equal(tail[k], res.prediction, err_msg=f"rg {k}")


def test_survey_subset_source():
    """SubsetWindows (create_dataset full=False) maps dataset positions
    through its index map before gathering."""
    from radar_sounder_crw_tpu.data.registry import SubsetWindows

    rg, seg = synthetic_radargram(H=72, W=800, nclasses=4, seed=4)
    T = 6
    ds = RGWindows(rg, length=T, dim=(16, 16), overlap=(8, 0))
    sub = SubsetWindows(ds, list(ds.non_overlapping_indices()))
    pipe = _make_pipe()
    geo = ds.geo
    ids = [0, 2, 3]
    refs = [
        seg[: geo.rg_h(), geo.col_start(sub.indices[i]) :][:, :16] for i in ids
    ]
    got = pipe.propagate_survey(sub, ids, refs)
    for k, i in enumerate(ids):
        res = pipe(sub[i], refs[k], detect_change=False)
        np.testing.assert_array_equal(got[k], res.prediction, err_msg=f"rg {k}")


def test_survey_validates_ids_and_offsets(single_rg):
    ds, pipe, ids, refs = single_rg
    with pytest.raises(IndexError):
        pipe.propagate_survey(ds, [len(ds) + 5], refs[:1])
    with pytest.raises(IndexError):
        pipe.propagate_survey(ds, [-1], refs[:1])
    with pytest.raises(ValueError):
        pipe.propagate_survey(ds, ids, refs, frame_offsets=[1])  # wrong shape
    with pytest.raises(IndexError):
        # offset pushes the window past the trace end for this length
        pipe.propagate_survey(
            ds, [len(ds) - 1], refs[:1], frame_offsets=[5]
        )
    with pytest.raises(TypeError):
        pipe.propagate_survey(np.zeros((4, 4)), [0], refs[:1])


def test_resident_radargram_memoized(single_rg):
    """The survey re-uses one device copy across passes — forward, reverse,
    correction hit the same upload."""
    ds, pipe, ids, refs = single_rg
    pipe.propagate_survey(ds, ids, refs)
    memo1 = pipe._rg_memo[2]
    pipe.propagate_survey(ds, ids, refs, use_last=True)
    assert pipe._rg_memo[2] is memo1
    pipe.propagate_survey(ds, ids, refs, length=5)
    assert pipe._rg_memo[2] is memo1


def test_survey_stacked_offset_respects_segment_widths():
    """On a zero-padded multi-width stack, an offset window that fits the
    WIDEST segment but overruns a NARROWER one must raise — not silently
    gather padding zeros (review finding)."""
    patch, overlap, T = (16, 16), (8, 0), 6
    pxw = T * 16
    rgs = []
    for s, w_extra in zip((5, 6), (0, 64)):  # widths 96 and 160
        rg, _ = synthetic_radargram(H=72, W=pxw + w_extra, nclasses=4, seed=s)
        rgs.append(rg)
    sets = [RGWindows(r, length=T, dim=patch, overlap=overlap) for r in rgs]
    cat = ConcatWindows(sets)
    pipe = _make_pipe()
    geo = cat.geo
    refs = [np.zeros((geo.rg_h(), 16), np.int64)] * 2
    # offset 4 with length 4: end col = (0+4)*16 + 4*16 = 128 — fits the
    # 160-wide segment, overruns the 96-wide one
    with pytest.raises(IndexError, match="segment 0"):
        pipe.propagate_survey(
            cat, [0, 1], refs, length=4, frame_offsets=[4, 4]
        )
    # the same windows on the wide segment alone are fine
    out = pipe.propagate_survey(cat, [1], refs[:1], length=4, frame_offsets=[4])
    assert out.shape == (1, geo.nh, 4)


def test_resolve_batched_kernel_policy():
    """'auto' under the batched survey programs upgrades to the lane-packed
    whole-sequence kernel exactly when packing engages for the per-device
    local batch (TPU, N <= 64, local B >= 2) — measured 1.6x at the Miguel
    survey shape; wider shapes and explicit kernels are untouched."""
    from radar_sounder_crw_tpu.infer.propagate import _resolve_batched_kernel

    cfg = LabelPropConfig(
        cxt_size=100, radius=64, temperature=0.07, knn=20, long_mem=(0,)
    )
    # Miguel survey shape on TPU: packs=2 engages -> seq kernel
    r = _resolve_batched_kernel("auto", 63, 100, 50, 128, 6, cfg, backend="tpu")
    assert r == "pallas_seq"
    # local batch of 1 (one radargram per device) cannot pack
    assert (
        _resolve_batched_kernel("auto", 1, 100, 50, 128, 6, cfg, backend="tpu")
        == "auto"
    )
    # SHARAD/MC3 widths exceed the packed lane span
    for n in (113, 190):
        assert (
            _resolve_batched_kernel(
                "auto", 63, 100, n, 128, 6, cfg, backend="tpu"
            )
            == "auto"
        )
    # non-TPU backends and explicit kernels pass through unchanged
    assert (
        _resolve_batched_kernel("auto", 63, 100, 50, 128, 6, cfg, backend="cpu")
        == "auto"
    )
    assert (
        _resolve_batched_kernel(
            "pallas", 63, 100, 50, 128, 6, cfg, backend="tpu"
        )
        == "pallas"
    )
    # T=1 surveys never propagate — nothing to flip
    assert (
        _resolve_batched_kernel("auto", 63, 1, 50, 128, 6, cfg, backend="tpu")
        == "auto"
    )


def test_pipeline_pins_eval_stem_for_auto_models():
    """bn_train_mode=True applies the flax train switch at inference; the
    pipeline must still use the EVAL stem schedule (auto s2d is a training
    win but a 16x eval HBM amplifier — review finding). Explicit overrides
    are honored."""
    model = create_model(1, False)  # ResNetEncoder, s2d_stem=None (auto)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False
    )
    pipe = PropagationPipeline(
        model, dict(variables), LabelPropConfig(4, 4, 0.1, 3), nclasses=4,
        bn_train_mode=True,
    )
    assert pipe.model.s2d_stem is False
    forced = model.clone(s2d_stem=True)
    pipe2 = PropagationPipeline(
        forced, dict(variables), LabelPropConfig(4, 4, 0.1, 3), nclasses=4
    )
    assert pipe2.model.s2d_stem is True  # user override untouched
    # CNN has no stem flag: passes through unchanged
    cnn = create_model(0, False)
    vc = cnn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False)
    pipe3 = PropagationPipeline(
        cnn, dict(vc), LabelPropConfig(4, 4, 0.1, 3), nclasses=4
    )
    assert pipe3.model is cnn

def test_survey_device_dispatch_is_the_fetchless_product(single_rg):
    """propagate_survey_device (the bench probe / embedder surface) returns
    exactly the device tuple propagate_survey fetches: fetching its pred and
    slicing to `real` must equal the product call, and the padded batch is
    the mesh-rounded size."""
    ds, pipe, ids, refs = single_rg
    prod = pipe.propagate_survey(ds, ids, refs)
    pred, sigs, xents, real = pipe.propagate_survey_device(ds, ids, refs)
    assert real == len(ids)
    assert pred.shape[0] % jax.device_count() == 0
    assert sigs is None and xents is None
    got = np.asarray(jax.device_get(pred))[:real]
    got = np.transpose(got, (0, 2, 1)).astype(np.int32)
    np.testing.assert_array_equal(got, prod)

"""Full-survey batched propagation: sharded over the 8-device virtual mesh,
results must match the per-radargram sequential path."""

import jax
import numpy as np

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.infer import PropagationPipeline
from radar_sounder_crw_tpu.models import create_model
from radar_sounder_crw_tpu.ops import LabelPropConfig
from radar_sounder_crw_tpu.parallel import make_mesh


def test_propagate_batch_matches_sequential():
    rg, seg = synthetic_radargram(H=96, W=1280, nclasses=4, seed=17, change_point=None)
    ds = RGWindows(rg, length=10, dim=(16, 16), overlap=(8, 0))
    geo = ds.geo

    model = create_model(0, False)
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 16, 16, 1), np.float32), train=False
    )
    pipe = PropagationPipeline(
        model,
        dict(variables),
        LabelPropConfig(cxt_size=8, radius=5, temperature=0.05, knn=4),
        nclasses=4,
    )

    idxs = list(range(0, len(ds), geo.length))[:5]  # 5 radargrams (pads to 8)
    seqs = np.stack([ds[i] for i in idxs])
    refs = [
        seg[: geo.rg_h(), geo.rg_len() * t : geo.rg_len() * t + geo.w]
        for t in range(len(idxs))
    ]

    batched = pipe.propagate_batch(seqs, refs, mesh=make_mesh())
    assert batched.shape == (5, geo.nh, geo.length)
    for t in range(5):
        res = pipe(seqs[t], refs[t], detect_change=False)
        np.testing.assert_array_equal(batched[t], res.prediction)

    # batched change detection matches the sequential pipeline's
    preds2, change = pipe.propagate_batch(
        seqs, refs, mesh=make_mesh(), detect_change=True
    )
    np.testing.assert_array_equal(preds2, batched)
    assert len(change) == 5
    for t in range(5):
        seq_res = pipe(seqs[t], refs[t], detect_change=True)
        assert change[t] == seq_res.change_idx

    # return_xent: per-radargram xent maps identical to the sequential
    # pipeline's PropagateResult.xent (the qualitative scripts' product)
    preds3, xents = pipe.propagate_batch(
        seqs, refs, mesh=make_mesh(), return_xent=True
    )
    np.testing.assert_array_equal(preds3, batched)
    assert xents.shape[0] == 5
    for t in range(5):
        seq_res = pipe(seqs[t], refs[t], detect_change=False)
        np.testing.assert_allclose(xents[t], seq_res.xent, rtol=1e-6, atol=1e-6)

    # all three outputs at once: (preds, change, xents)
    preds4, change4, xents4 = pipe.propagate_batch(
        seqs, refs, mesh=make_mesh(), detect_change=True, return_xent=True
    )
    np.testing.assert_array_equal(preds4, batched)
    assert change4 == change
    np.testing.assert_array_equal(xents4, xents)

    # use_last + return_xent: matches the sequential use_last call's xent
    # (computed on the time-flipped sequence)
    rpreds, rxents = pipe.propagate_batch(
        seqs, refs, mesh=make_mesh(), use_last=True, return_xent=True
    )
    for t in range(5):
        seq_res = pipe(seqs[t], refs[t], use_last=True, detect_change=False)
        np.testing.assert_array_equal(rpreds[t], seq_res.prediction)
        np.testing.assert_allclose(rxents[t], seq_res.xent, rtol=1e-6, atol=1e-6)


def test_propagate_batch_bn_train_mode_per_radargram_stats():
    """The single sharded program vmaps the encoder over radargrams, so
    BatchNorm batch statistics (bn_train_mode=True, the reference test_all
    semantics) must stay per-radargram — identical to sequential encodes."""
    rg, seg = synthetic_radargram(H=64, W=640, nclasses=4, seed=23, change_point=None)
    ds = RGWindows(rg, length=6, dim=(16, 16), overlap=(8, 0))
    geo = ds.geo

    model = create_model(1, False)  # ResNet: has BatchNorm
    variables = model.init(
        jax.random.PRNGKey(4), np.zeros((1, 16, 16, 1), np.float32), train=False
    )
    pipe = PropagationPipeline(
        model,
        dict(variables),
        LabelPropConfig(cxt_size=6, radius=5, temperature=0.05, knn=4),
        nclasses=4,
        bn_train_mode=True,
    )
    idxs = list(range(0, len(ds), geo.length))[:3]
    seqs = np.stack([ds[i] for i in idxs])
    refs = [
        seg[: geo.rg_h(), geo.rg_len() * t : geo.rg_len() * t + geo.w]
        for t in range(len(idxs))
    ]
    batched = pipe.propagate_batch(seqs, refs, mesh=make_mesh())
    for t in range(3):
        res = pipe(seqs[t], refs[t], detect_change=False)
        np.testing.assert_array_equal(batched[t], res.prediction)

def test_compact_seed_labels_match_eye_semantics():
    """The batched paths upload compact int labels and rebuild the one-hot
    on device (jax.nn.one_hot); the single-radargram path uses
    np.eye(C)[labels]. np.eye accepts NEGATIVE labels in [-C, 0) with
    wrap-around (an unlabeled -1 marker seeds the LAST class), while a raw
    jax.nn.one_hot(-1) would emit an all-zero row — _stack_seed_labels must
    wrap negatives host-side so both paths stay exactly interchangeable,
    and must refuse what np.eye refuses."""
    import pytest

    rg, seg = synthetic_radargram(H=96, W=1280, nclasses=4, seed=31, change_point=None)
    ds = RGWindows(rg, length=8, dim=(16, 16), overlap=(8, 0))
    geo = ds.geo
    model = create_model(0, False)
    variables = model.init(
        jax.random.PRNGKey(6), np.zeros((1, 16, 16, 1), np.float32), train=False
    )
    pipe = PropagationPipeline(
        model,
        dict(variables),
        LabelPropConfig(cxt_size=8, radius=5, temperature=0.05, knn=4),
        nclasses=4,
    )
    idxs = list(range(0, len(ds), geo.length))[:3]
    seqs = np.stack([ds[i] for i in idxs])
    refs = [
        seg[: geo.rg_h(), geo.rg_len() * t : geo.rg_len() * t + geo.w].copy()
        for t in range(len(idxs))
    ]
    for r in refs:  # plant unlabeled markers: np.eye maps -1 -> class C-1
        r[: r.shape[0] // 3] = -1

    # host-side: the compact labels must equal np.eye's row selection
    from radar_sounder_crw_tpu.infer.propagate import seed_onehot_from_segmentation

    labels = pipe._stack_seed_labels(refs, geo.nh)
    for t, r in enumerate(refs):
        onehot = seed_onehot_from_segmentation(r, geo.nh, 4)[0]
        np.testing.assert_array_equal(np.eye(4, dtype=np.float32)[labels[t]], onehot)

    # end-to-end: batched (compact upload) == sequential (np.eye one-hot)
    batched = pipe.propagate_batch(seqs, refs, mesh=make_mesh())
    for t in range(3):
        res = pipe(seqs[t], refs[t], detect_change=False)
        np.testing.assert_array_equal(batched[t], res.prediction)

    # out-of-range labels are refused, mirroring np.eye's IndexError
    bad = [np.full_like(refs[0], 7)] + refs[1:]
    with pytest.raises(IndexError):
        pipe._stack_seed_labels(bad, geo.nh)

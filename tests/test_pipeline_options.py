"""PropagationPipeline option coverage: pos-embed encoders, BatchNorm
train-mode inference, the xent quirk flag, and 2-D patch grids."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_sounder_crw_tpu.data import synthetic_radargram, RGWindows
from radar_sounder_crw_tpu.infer import PropagationPipeline
from radar_sounder_crw_tpu.models import create_model
from radar_sounder_crw_tpu.ops import LabelPropConfig, propagate_labels
from radar_sounder_crw_tpu.utils.pos_embed import pos_embed


def make_pipe(model_id=0, use_pos_embed=False, **kw):
    model = create_model(model_id, use_pos_embed)
    in_ch = 2 if use_pos_embed else 1
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, in_ch), np.float32), train=False
    )
    return PropagationPipeline(
        model,
        dict(variables),
        LabelPropConfig(cxt_size=6, radius=5, temperature=0.1, knn=4),
        nclasses=4,
        use_pos_embed=use_pos_embed,
        **kw,
    )


def setup_seq():
    rg, seg = synthetic_radargram(H=96, W=400, seed=30, change_point=None)
    ds = RGWindows(rg, length=6, dim=(16, 16), overlap=(8, 0))
    return ds[0], seg[: ds.geo.rg_h(), : ds.geo.w]


def test_pos_embed_pipeline_runs_and_differs():
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.utils.pos_embed import maybe_pos_embed

    seq, ref = setup_seq()
    plain = make_pipe(use_pos_embed=False)(seq, ref)
    pe = make_pipe(use_pos_embed=True)(seq, ref)
    assert pe.prediction.shape == plain.prediction.shape
    assert np.isfinite(pe.xent).all()
    # the flag must actually thread the extra channel through the pipeline's
    # encode: the xent metric (a continuous function of the embeddings)
    # cannot coincide with the plain pipeline's if it does
    assert not np.allclose(pe.xent, plain.xent), "pos_embed was a no-op"
    # the added channel must really be the normalized vertical coordinate
    # (reference src/utils.py:76-90: arange(H)/H - 0.5, channel order
    # [pe, data]) — not an accidental zero channel the model also accepts
    x = jnp.zeros((2, 16, 16, 1))
    out = np.asarray(maybe_pos_embed(x, True))
    assert out.shape == (2, 16, 16, 2)
    ramp = np.arange(16, dtype=np.float32) / 16 - 0.5
    np.testing.assert_allclose(out[0, :, 3, 0], ramp, atol=1e-6)
    np.testing.assert_array_equal(out[..., 1], 0.0)


def test_bn_train_mode_changes_resnet_outputs():
    seq, ref = setup_seq()
    a = make_pipe(model_id=1)(seq, ref)
    b = make_pipe(model_id=1, bn_train_mode=True)(seq, ref)
    # batch-stat BN vs fresh running stats must differ measurably
    assert not np.allclose(a.xent, b.xent)


def test_xent_quirk_flag_changes_metric():
    seq, ref = setup_seq()
    a = make_pipe()(seq, ref)
    b = make_pipe(xent_quirk=True)(seq, ref)
    assert a.xent.shape == b.xent.shape
    assert not np.allclose(a.xent, b.xent)


def test_pos_embed_values():
    x = jnp.zeros((2, 8, 4, 1))
    out = pos_embed(x)
    assert out.shape == (2, 8, 4, 2)
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0, 0]), np.arange(8) / 8 - 0.5, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out[..., 1]), 0.0)


def test_pipeline_kernel_selection():
    """The pipeline's `kernel` knob threads to the propagation op: explicit
    'xla' matches the default ('auto' resolves to 'xla' on CPU) exactly,
    and the whole-sequence seq kernel (interpret mode here) produces the
    same segmentation through the full pipeline, single and batched."""
    seq, ref = setup_seq()
    base = make_pipe()(seq, ref)
    xla = make_pipe(kernel="xla")(seq, ref)
    np.testing.assert_array_equal(base.prediction, xla.prediction)
    pseq = make_pipe(kernel="pallas_seq_interpret")(seq, ref)
    np.testing.assert_array_equal(base.prediction, pseq.prediction)
    # batched survey path honors the knob too (batch-aware seq kernel)
    seqs = np.stack([np.asarray(seq)] * 2)
    refs = [ref, ref]
    preds = make_pipe(kernel="pallas_seq_interpret").propagate_batch(seqs, refs)
    np.testing.assert_array_equal(preds[0], base.prediction)
    np.testing.assert_array_equal(preds[1], base.prediction)


def test_2d_grid_propagation():
    """Label propagation on a (h, w) patch grid (not just a column)."""
    rng = np.random.default_rng(0)
    T, h, w, C, M = 5, 4, 3, 16, 3
    N = h * w
    emb = rng.standard_normal((T, N, C)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    seed = np.eye(M, dtype=np.float32)[rng.integers(0, M, N)]
    cfg = LabelPropConfig(cxt_size=4, radius=1.5, temperature=0.1, knn=3)
    soft, pred = propagate_labels(
        jnp.asarray(emb), jnp.asarray(seed), cfg, grid_hw=(h, w)
    )
    assert soft.shape == (T, N, M) and np.isfinite(np.asarray(soft)).all()

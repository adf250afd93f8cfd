"""Batch-minor (HWCN) eval forward: equivalence with the stock flax forward
and the dispatch predicate (models/batch_minor.py).

The layout rewrite must be a pure relayout: same conv geometry, same
BatchNorm eval arithmetic, same rounding points — so in float32 on CPU the
two forwards agree to accumulation-order noise, and through
`encode_sequence` the embeddings match at the jit boundary too.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_sounder_crw_tpu.models import create_model, resnet_eval_batch_minor
from radar_sounder_crw_tpu.models.batch_minor import use_batch_minor


def _init(model, h=16, w=16, cin=1, seed=0):
    return model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, w, cin), jnp.float32), train=False
    )


def _randomized_stats(variables, seed=1):
    """BatchNorm running stats away from the init (mean 0 / var 1) so the
    eval-BN arithmetic is actually exercised."""
    rng = np.random.default_rng(seed)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.normal(0.6, 0.4, a.shape).astype(np.float32) ** 2 + 0.1
        ),
        variables["batch_stats"],
    )
    return {**variables, "batch_stats": stats}


def test_matches_stock_forward_f32():
    model = create_model(1, False, dtype=jnp.float32)
    variables = _randomized_stats(_init(model))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(37, 16, 16, 1)), jnp.float32)
    ours = resnet_eval_batch_minor(model, variables, x)
    stock = model.apply(variables, x, train=False)
    assert ours.shape == stock.shape == (37, 128)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(stock), rtol=2e-5, atol=2e-5)


def test_matches_stock_forward_pos_embed_channel():
    model = create_model(1, True, dtype=jnp.float32)
    variables = _randomized_stats(_init(model, cin=2), seed=3)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(12, 16, 16, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(resnet_eval_batch_minor(model, variables, x)),
        np.asarray(model.apply(variables, x, train=False)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_matches_stock_forward_generic_geometry():
    # non-square, non-16 patches: the layout rewrite is shape-generic
    model = create_model(1, False, dtype=jnp.float32)
    variables = _randomized_stats(_init(model, h=24, w=12), seed=5)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(9, 24, 12, 1)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(resnet_eval_batch_minor(model, variables, x)),
        np.asarray(model.apply(variables, x, train=False)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_matches_stock_forward_bf16():
    # the TPU deployment dtype: agreement at bf16 noise scale, and both
    # forwards keep the f32 head exactly
    model = create_model(1, False, dtype=jnp.bfloat16)
    variables = _randomized_stats(_init(model), seed=7)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(33, 16, 16, 1)), jnp.float32)
    ours = np.asarray(resnet_eval_batch_minor(model, variables, x))
    stock = np.asarray(model.apply(variables, x, train=False))
    assert ours.dtype == stock.dtype == np.float32
    np.testing.assert_allclose(ours, stock, rtol=5e-2, atol=5e-2)


def test_dispatch_predicate(monkeypatch):
    resnet = create_model(1, False)
    cnn = create_model(0, False)
    monkeypatch.delenv("RSCRW_ENCODER_IMPL", raising=False)
    # default 'auto': CPU backend -> stock path
    assert not use_batch_minor(resnet, 10_000, bn_train_mode=False)
    monkeypatch.setenv("RSCRW_ENCODER_IMPL", "batch_minor")
    assert use_batch_minor(resnet, 4, bn_train_mode=False)
    # never for train-mode BN or the CNN encoder, even when forced
    assert not use_batch_minor(resnet, 10_000, bn_train_mode=True)
    assert not use_batch_minor(cnn, 10_000, bn_train_mode=False)
    # nor for encoder configs whose eval arithmetic this module does not
    # reproduce (BN variants, explicit space-to-depth eval stem)
    assert not use_batch_minor(
        create_model(1, False, fused_bn="lean"), 10_000, bn_train_mode=False
    )
    assert not use_batch_minor(
        create_model(1, False, s2d_stem=True), 10_000, bn_train_mode=False
    )
    monkeypatch.setenv("RSCRW_ENCODER_IMPL", "stock")
    assert not use_batch_minor(resnet, 10_000, bn_train_mode=False)
    # typos fail loudly instead of silently meaning 'auto'
    monkeypatch.setenv("RSCRW_ENCODER_IMPL", "batchminor")
    with pytest.raises(ValueError, match="RSCRW_ENCODER_IMPL"):
        use_batch_minor(resnet, 10_000, bn_train_mode=False)


def test_encode_sequence_routes_batch_minor(monkeypatch):
    """Through the jitted product entry point: with the impl forced, a
    never-before-traced shape (1) actually routes through
    resnet_eval_batch_minor — asserted via a trace-time spy, since a cached
    encode_sequence executable would silently keep the impl it traced with
    — and (2) reproduces the stock embeddings computed directly."""
    import radar_sounder_crw_tpu.models.batch_minor as bm
    from radar_sounder_crw_tpu.infer import encode_sequence

    model = create_model(1, False, dtype=jnp.float32)
    variables = _randomized_stats(_init(model), seed=11)
    # shape chosen to be unique to this test: the spy proves a fresh trace
    seq = jnp.asarray(
        np.random.default_rng(4).normal(size=(3, 13, 16, 16)), jnp.float32
    )
    calls = []
    real = bm.resnet_eval_batch_minor

    def spy(model, variables, x):
        calls.append(x.shape)
        return real(model, variables, x)

    monkeypatch.setenv("RSCRW_ENCODER_IMPL", "batch_minor")
    monkeypatch.setattr(bm, "resnet_eval_batch_minor", spy)
    forced = np.asarray(encode_sequence(model, variables, seq, False, False))
    assert calls == [(39, 16, 16, 1)], (
        "encode_sequence did not route through the batch-minor forward "
        f"(spy calls: {calls})"
    )
    # stock reference computed directly (not via encode_sequence, whose
    # jit cache now holds the batch-minor trace for this shape)
    out = model.apply(variables, seq.reshape(39, 16, 16, 1), train=False)
    emb = np.asarray(out).reshape(3, 13, -1)
    base = emb / np.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-12)
    assert forced.shape == base.shape == (3, 13, 128)
    np.testing.assert_allclose(forced, base, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.linalg.norm(forced, axis=-1), np.ones((3, 13)), rtol=1e-5, atol=1e-5
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])

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


def test_dispatch_predicate():
    resnet = create_model(1, False)
    cnn = create_model(0, False)
    env = os.environ
    assert "RSCRW_ENCODER_IMPL" not in env
    # default 'auto': CPU backend -> stock path
    assert not use_batch_minor(resnet, 10_000, bn_train_mode=False)
    try:
        env["RSCRW_ENCODER_IMPL"] = "batch_minor"
        assert use_batch_minor(resnet, 4, bn_train_mode=False)
        # never for train-mode BN or the CNN encoder, even when forced
        assert not use_batch_minor(resnet, 10_000, bn_train_mode=True)
        assert not use_batch_minor(cnn, 10_000, bn_train_mode=False)
        env["RSCRW_ENCODER_IMPL"] = "stock"
        assert not use_batch_minor(resnet, 10_000, bn_train_mode=False)
    finally:
        del env["RSCRW_ENCODER_IMPL"]


def test_encode_sequence_routes_batch_minor():
    """Through the jitted product entry point: forcing the batch-minor impl
    reproduces the default embeddings (CPU, f32 — exact path comparison at
    the encode_sequence boundary, unique shape to defeat the jit cache)."""
    from radar_sounder_crw_tpu.infer import encode_sequence

    model = create_model(1, False, dtype=jnp.float32)
    variables = _randomized_stats(_init(model), seed=11)
    seq = jnp.asarray(
        np.random.default_rng(4).normal(size=(3, 13, 16, 16)), jnp.float32
    )
    base = np.asarray(encode_sequence(model, variables, seq, False, False))
    try:
        os.environ["RSCRW_ENCODER_IMPL"] = "batch_minor"
        # new jit entry (fresh wrap) so the env override is seen at trace time
        forced = np.asarray(
            jax.jit(
                lambda v, s: encode_sequence(model, v, s, False, False)
            )(variables, seq)
        )
    finally:
        del os.environ["RSCRW_ENCODER_IMPL"]
    assert base.shape == forced.shape == (3, 13, 128)
    np.testing.assert_allclose(forced, base, rtol=2e-5, atol=2e-5)
    # embeddings are L2-normalized in both paths
    np.testing.assert_allclose(
        np.linalg.norm(forced, axis=-1), np.ones((3, 13)), rtol=1e-5, atol=1e-5
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])

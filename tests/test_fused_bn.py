"""FusedBatchNorm (models/fused_bn.py) must be a numerics-transparent
drop-in for flax nn.BatchNorm: same outputs, same gradients, same
batch_stats updates, same param/collection layout — it only reschedules
the HBM passes (the train-step BN-statistics attack, round-3 VERDICT #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from radar_sounder_crw_tpu.models.fused_bn import FusedBatchNorm


def _pair(use_running_average, dtype):
    kw = dict(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
    )
    return nn.BatchNorm(**kw), FusedBatchNorm(**kw)


def test_train_forward_and_stats_match_flax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 5, 5, 16)).astype(np.float32))
    ref, fused = _pair(False, jnp.float32)
    vr = ref.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vf)
    yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
    yf, mf = fused.apply(vr, x, mutable=["batch_stats"])  # same variables
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr), rtol=2e-6, atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"][k]),
            np.asarray(mr["batch_stats"][k]),
            rtol=2e-6, atol=2e-6,
        )


def test_train_gradients_match_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 3, 3, 8)).astype(np.float32))
    ref, fused = _pair(False, jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    # non-trivial scale/bias so dγ/dβ pathways are exercised
    v = {
        "params": {
            "scale": jnp.asarray(
                rng.standard_normal(8).astype(np.float32) + 1.0
            ),
            "bias": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
        },
        "batch_stats": v["batch_stats"],
    }
    tgt = jnp.asarray(rng.standard_normal((64, 3, 3, 8)).astype(np.float32))

    def loss(mod, params, xx):
        y, _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xx,
            mutable=["batch_stats"],
        )
        return jnp.sum((y - tgt) ** 2)

    gr_p, gr_x = jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(
        v["params"], x
    )
    gf_p, gf_x = jax.grad(lambda p, xx: loss(fused, p, xx), argnums=(0, 1))(
        v["params"], x
    )
    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(gr_x), rtol=1e-4, atol=1e-4
    )
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(gf_p[k]), np.asarray(gr_p[k]), rtol=1e-4, atol=1e-4
        )


def test_eval_matches_flax():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 4, 4, 8)).astype(np.float32))
    ref, fused = _pair(True, jnp.float32)
    v = {
        "params": {
            "scale": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
            "var": jnp.asarray(
                np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
            ),
        },
    }
    yr = ref.apply(v, x)
    yf = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr), rtol=1e-6, atol=1e-6)


def test_bfloat16_activation_close_to_f32_reference():
    """bf16 input: the fused module normalizes in f32 and casts once at the
    end — at least as precise as flax's bf16 normalize, so compare both
    against the f32 reference."""
    rng = np.random.default_rng(3)
    x32 = rng.standard_normal((128, 4, 4, 8)).astype(np.float32)
    x16 = jnp.asarray(x32).astype(jnp.bfloat16)
    ref32, _ = _pair(False, jnp.float32)
    _, fused16 = _pair(False, jnp.bfloat16)
    v = ref32.init(jax.random.PRNGKey(0), jnp.asarray(x32))
    y32, _ = ref32.apply(v, jnp.asarray(x32), mutable=["batch_stats"])
    y16, m16 = fused16.apply(v, x16, mutable=["batch_stats"])
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), rtol=0.05, atol=0.05
    )
    # running stats accumulate in f32 regardless of activation dtype
    assert m16["batch_stats"]["mean"].dtype == jnp.float32


def _rel_l2(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def test_resnet_encoder_fused_flag_equivalence():
    """ResNetEncoder(fused_bn=True) is as accurate as (fused_bn=False).

    The two schedules are the same math in a different f32 rounding order;
    through 10+ conv/BN layers the MUTUAL difference on ill-conditioned
    leaves (fc0/kernel: BN scale-invariance cancels the component along W)
    reaches O(1e-2) while BOTH sit O(1e-1) from the float64 truth — so the
    sound criterion is not fused==flax but |fused - f64| <~ |flax - f64|
    per gradient leaf, plus a forward check at mutual-rounding scale."""
    from radar_sounder_crw_tpu.models import ResNetEncoder

    rng = np.random.default_rng(4)
    x32 = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    x = jnp.asarray(x32)
    enc_f = ResNetEncoder(pos_embed=False, fused_bn=True, s2d_stem=False)
    enc_r = ResNetEncoder(pos_embed=False, fused_bn=False, s2d_stem=False)
    enc64 = ResNetEncoder(
        pos_embed=False, fused_bn=False, s2d_stem=False, dtype=jnp.float64
    )
    v = enc_r.init(jax.random.PRNGKey(0), x, train=True)
    yr, _ = enc_r.apply(v, x, train=True, mutable=["batch_stats"])
    yf, _ = enc_f.apply(v, x, train=True, mutable=["batch_stats"])
    assert _rel_l2(yf, yr) < 1e-4

    def grads(enc, dtype):
        params = jax.tree.map(lambda a: a.astype(dtype), v["params"])
        bs = jax.tree.map(lambda a: a.astype(dtype), v["batch_stats"])

        def loss(p):
            y, _ = enc.apply(
                {"params": p, "batch_stats": bs},
                jnp.asarray(x32, dtype), train=True, mutable=["batch_stats"],
            )
            return jnp.sum(y * y)

        return jax.grad(loss)(params)

    try:
        jax.config.update("jax_enable_x64", True)
        g64 = dict(jax.tree_util.tree_leaves_with_path(
            grads(enc64, jnp.float64)
        ))
        gr = dict(jax.tree_util.tree_leaves_with_path(
            grads(enc_r, jnp.float32)
        ))
        gf = dict(jax.tree_util.tree_leaves_with_path(
            grads(enc_f, jnp.float32)
        ))
    finally:
        jax.config.update("jax_enable_x64", False)
    for path, truth in g64.items():
        err_r = _rel_l2(gr[path], truth)
        err_f = _rel_l2(gf[path], truth)
        # fc0/bias's true gradient is ~0 (a conv bias feeding training-mode
        # BN cancels against the batch mean): both errors are meaningless
        # noise there, and the 1.5x ratio bound covers it anyway
        assert err_f <= 1.5 * err_r + 1e-6, (
            f"{path}: fused err {err_f:.2e} vs flax err {err_r:.2e}"
        )


def test_lean_bn_matches_flax_forward_stats_and_grads():
    """LeanBatchNorm (bf16-read statistics, f32 accumulation — VERDICT r3
    #5) is the same math as flax nn.BatchNorm: forward, running-stat
    updates, and gradients agree to reduction-reassociation tolerance."""
    from radar_sounder_crw_tpu.models.fused_bn import LeanBatchNorm

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((32, 5, 5, 16)).astype(np.float32))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    lean = LeanBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        lean.init(jax.random.PRNGKey(0), x)
    )
    yr, mr = ref.apply(v, x, mutable=["batch_stats"])
    yl, ml = lean.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yr), rtol=2e-6, atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(ml["batch_stats"][k]),
            np.asarray(mr["batch_stats"][k]),
            rtol=2e-6, atol=2e-6,
        )

    tgt = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def loss(mod, params):
        y, _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return jnp.mean((y - tgt) ** 2)

    gr = jax.grad(lambda p: loss(ref, p))(v["params"])
    gl = jax.grad(lambda p: loss(lean, p))(v["params"])
    for k in gr:
        np.testing.assert_allclose(
            np.asarray(gl[k]), np.asarray(gr[k]), rtol=5e-6, atol=5e-6,
            err_msg=k,
        )

    # eval mode matches flax's running-average path
    ref_e = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    lean_e = LeanBatchNorm(use_running_average=True, epsilon=1e-5)
    ye_r = ref_e.apply(v, x)
    ye_l = lean_e.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(ye_l), np.asarray(ye_r), rtol=2e-6, atol=2e-6
    )


def test_lean_bn_bf16_trains_through_crw_trainer():
    """fused_bn='lean' plumbs end-to-end: the bf16 train step produces a
    loss within mutual-rounding distance of the flax-BN step on the same
    batch and init."""
    from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    rg, _ = synthetic_radargram(H=88, W=600, seed=5)
    ds = RGWindows(rg, length=5, dim=(16, 16), overlap=(8, 0))
    losses = {}
    for impl in (None, "lean"):
        cfg = CRWTrainConfig(
            model=1, seq_length=5, batch_size=2, lr=1e-3, tau=0.05,
            dtype=jnp.bfloat16, fused_bn=impl,
        )
        tr = CRWTrainer(cfg)
        tr.init_state(ds[0].shape)
        batch = np.stack([ds[0], ds[1]])
        loss = tr.train_step(batch)
        losses[impl] = float(jax.device_get(loss))
    assert np.isfinite(losses["lean"])
    assert abs(losses["lean"] - losses[None]) < 2e-2, losses

"""TRAINING-trajectory parity against the upstream reference (round-5
VERDICT #1): everything before this suite certified inference with SHARED
weights; these tests certify the training loop itself — optax-vs-torch Adam
semantics, BatchNorm running-stat momentum across steps, K-step loss-curve
agreement from a shared torch-initialized encoder, and (for the first time)
the full train->eval lifecycle: both sides train K steps on an identical
batch schedule, then each side's own propagate pipeline evaluates its own
trained encoder, and the mIoU gap must be within the BASELINE north star
(0.5 pt).

The reference training loop is scripts/train.py:56-75 — Adam(lr),
model.train(True), loss = CRW(seq) recorded pre-update, zero_grad /
backward / step — reproduced here verbatim on CPU torch with the reference's
own CRW + encoders (imported via tests/_reference_runtime), with the
shuffled DataLoader replaced by a FIXED batch schedule shared bit-for-bit
with our trainer (the schedule is the experiment's control variable; the
loader itself is plain batching, covered by tests/test_geometry.py).

What "float tolerance" means across frameworks: XLA and ATen produce
gradients that differ at ~1e-7 relative (different conv algorithms). A
semantics error in Adam (bias correction, eps placement) or in the BN
update (momentum, blend direction) is a SYSTEMATIC error visible at step 1;
backend float noise instead amplifies gradually through the nonlinear
optimization (measured here: CNN loss agreement 6.7e-8 at step 3, ~2e-5 by
step 11 on flat data; ~1e-3 by step 10 on descending data). The isolated
optimizer/BN-rule tests therefore assert near-bit equality on IDENTICAL
inputs (no backend in the loop), and the end-to-end trajectories assert the
measured-noise envelope with ~10x headroom.

BatchNorm variance semantics, pinned exactly: torch updates running_var
with the UNBIASED batch variance (n/(n-1)); flax blends the biased one.
With identical batch variances the K-step blends relate exactly by
   torch_rv - (1-m)^K rv0 == (ours_rv - (1-m)^K rv0) * n/(n-1)
(m = 0.1, n = elements per channel) — asserted below to float precision,
so the deviation is fully characterized rather than hidden in a loose
tolerance. fused_bn='twopass' (models/resnet.py:make_norm) is used on our
side: torch computes batch variance in two passes, while flax's default
one-pass E[x^2]-E[x]^2 loses ~1e-2 relative precision to float32
cancellation when |mean| >> std (measured; also asserted below).
"""

import numpy as np
import pytest

from _reference_runtime import (
    cuda_neutralized,
    import_reference,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)


# --------------------------------------------------------------------------
# shared harness
# --------------------------------------------------------------------------


def _train_reference_crw(encoder, batches, lr, tau):
    """The reference training loop, scripts/train.py:56-75: Adam, train-mode
    model, loss recorded BEFORE the update. Returns per-step losses."""
    import torch

    ref_model = import_reference("model")
    with cuda_neutralized():
        crw = ref_model.CRW(encoder, tau, pos_embed=False)
        opt = torch.optim.Adam(crw.parameters(), lr=lr)
        crw.train(True)
        losses = []
        for b in batches:
            loss, _ = crw(torch.tensor(b))
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
    return losses


def _our_trainer_from_torch_init(sd0, model_id, shape, lr, tau, **cfg_kw):
    """CRWTrainer whose TrainState starts from the torch state_dict sd0."""
    import jax

    from radar_sounder_crw_tpu.models.torch_import import import_state_dict
    from radar_sounder_crw_tpu.parallel.mesh import replicated
    from radar_sounder_crw_tpu.train.crw_trainer import (
        CRWTrainConfig,
        CRWTrainer,
        TrainState,
    )

    T, N, H, W = shape
    cfg = CRWTrainConfig(
        model=model_id,
        patch_size=(H, W),
        seq_length=T,
        lr=lr,
        tau=tau,
        device_resident=False,
        **cfg_kw,
    )
    trainer = CRWTrainer(cfg)
    trainer.init_state(shape)
    variables = import_state_dict(sd0)
    st = trainer.state
    trainer.state = jax.device_put(
        TrainState(
            step=st.step,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=trainer.tx.init(variables["params"]),
        ),
        replicated(trainer.mesh),
    )
    return trainer


def _torch_init_encoder(model_id, seed=11):
    import torch

    utils = import_reference("utils")
    torch.manual_seed(seed)
    enc = utils.create_model(model_id, False)
    sd0 = {k: v.numpy().copy() for k, v in enc.state_dict().items()}
    return enc, sd0


# --------------------------------------------------------------------------
# 1. the optimizer in isolation: identical gradients, no backend in the loop
# --------------------------------------------------------------------------


def test_optax_adam_matches_torch_adam():
    """optax.adam(lr) vs torch.optim.Adam(lr) driven by IDENTICAL synthetic
    gradient sequences for 25 steps: parameters must agree to float32
    round-off. Certifies bias correction, eps placement (inside the sqrt
    denominator sum), and lr scaling — the semantics the reference trainer
    relies on (scripts/train.py:56)."""
    import jax.numpy as jnp
    import optax
    import torch

    rng = np.random.default_rng(1)
    shapes = [(8, 5, 5), (16,), (32, 8)]
    K, lr = 25, 1e-3
    p0 = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    # gradient magnitudes spanning 1e-6..10: exercises the eps regime too
    grads = [
        [
            rng.standard_normal(s).astype(np.float32)
            * 10.0 ** rng.uniform(-6, 1)
            for s in shapes
        ]
        for _ in range(K)
    ]

    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in p0]
    topt = torch.optim.Adam(tparams, lr=lr)
    for g in grads:
        topt.zero_grad()
        for p, gi in zip(tparams, g):
            p.grad = torch.tensor(gi)
        topt.step()

    tx = optax.adam(lr)
    params = [jnp.asarray(p) for p in p0]
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update([jnp.asarray(x) for x in g], state, params)
        params = optax.apply_updates(params, updates)

    for want, got in zip(tparams, params):
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), atol=5e-6, rtol=0
        )


# --------------------------------------------------------------------------
# 2. the BN running-stat rule in isolation: identical inputs, K steps
# --------------------------------------------------------------------------


def test_bn_running_stat_rule_matches_torch():
    """One flax BatchNorm vs one torch BatchNorm2d fed IDENTICAL inputs for
    6 train-mode steps (no optimizer): running_mean must match tightly and
    running_var must match through the exact Bessel transform above —
    certifying the momentum value (0.1 torch == 0.9 flax convention), the
    blend direction, and that the ONLY variance deviation is the documented
    biased-vs-unbiased factor. Inputs carry |mean| >> std to also pin the
    one-pass-variance precision loss that makes 'twopass' necessary."""
    import jax
    from flax import linen as nn
    import torch

    jax.config.update("jax_platforms", "cpu")
    C, K = 5, 6
    rng = np.random.default_rng(2)
    xs = [
        (rng.standard_normal((8, 6, 7, C)) * 0.05 + 3.0).astype(np.float32)
        for _ in range(K)
    ]
    n = xs[0].size // C

    tbn = torch.nn.BatchNorm2d(C)
    tbn.train(True)
    with torch.no_grad():
        for x in xs:
            tbn(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    torch_rm = tbn.running_mean.numpy()
    torch_rv = tbn.running_var.numpy()

    def run_flax(fast):
        bn = nn.BatchNorm(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-5,
            use_fast_variance=fast,
        )
        variables = bn.init(jax.random.PRNGKey(0), xs[0])
        stats = variables["batch_stats"]
        for x in xs:
            _, upd = bn.apply(
                {"params": variables["params"], "batch_stats": stats},
                x,
                mutable=["batch_stats"],
            )
            stats = upd["batch_stats"]
        return np.asarray(stats["mean"]), np.asarray(stats["var"])

    ours_rm, ours_rv = run_flax(fast=False)
    np.testing.assert_allclose(ours_rm, torch_rm, rtol=1e-5, atol=1e-7)
    decay = 0.9**K  # residual of the rv0 = 1.0 init after K blends
    resid_torch = torch_rv - decay
    resid_ours = ours_rv - decay
    np.testing.assert_allclose(
        resid_torch, resid_ours * n / (n - 1), rtol=2e-4
    )
    # the flax-default one-pass variance is NOT exact on offset inputs —
    # bounded float noise (this is why make_norm grew 'twopass'); if this
    # starts passing at 2e-4 the default became two-pass and the knob can go
    _, fast_rv = run_flax(fast=True)
    fast_err = np.max(
        np.abs(resid_torch - (fast_rv - decay) * n / (n - 1))
        / np.abs(resid_torch)
    )
    assert 1e-4 < fast_err < 5e-2, fast_err


# --------------------------------------------------------------------------
# 3. CRW end-to-end trajectory: reference CRW+CNN vs CRWTrainer, K=12
# --------------------------------------------------------------------------


def test_crw_cnn_train_trajectory_matches_reference():
    """K=12 Adam steps from a shared torch-initialized CNN encoder on an
    identical batch schedule: per-step losses within the measured
    float-noise envelope (loss_k reflects k prior updates, so a bias-
    correction or momentum-semantics error would blow up immediately —
    measured agreement: 6.7e-8 at step 3, <=2e-5 at step 11)."""
    B, T, N, H, W = 2, 5, 6, 16, 16
    K, lr, tau = 12, 1e-3, 0.05
    rng = np.random.default_rng(0)
    batches = [
        rng.standard_normal((B, T, N, H, W)).astype(np.float32) * 0.5
        for _ in range(K)
    ]

    enc, sd0 = _torch_init_encoder(0)
    want = _train_reference_crw(enc, batches, lr, tau)

    trainer = _our_trainer_from_torch_init(
        sd0, 0, (T, N, H, W), lr, tau, batch_size=B
    )
    got = [float(trainer.train_step(b)) for b in batches]

    rel = np.abs(np.asarray(got) - np.asarray(want)) / np.abs(want)
    assert np.all(rel[:4] < 5e-6), rel[:4]
    assert np.all(rel < 2e-4), rel


# --------------------------------------------------------------------------
# 4. ResNet single-step: loss + EVERY BN running stat, exactly
# --------------------------------------------------------------------------


def test_resnet_train_step_bn_stats_match_reference():
    """One optimizer step of the full ResNet encoder (13 BatchNorms) from a
    shared torch init: the loss and every running_mean match tightly, and
    every running_var matches through the exact Bessel transform with its
    layer's own n (recorded from the torch side via forward hooks). One step
    isolates update semantics from trajectory chaos; the K-step blend rule
    is certified by test_bn_running_stat_rule_matches_torch."""
    import jax
    import torch

    from radar_sounder_crw_tpu.models.torch_import import export_state_dict

    B, T, N, H, W = 1, 4, 4, 16, 16
    lr, tau = 1e-3, 0.05
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((B, T, N, H, W)).astype(np.float32) * 0.5

    enc, sd0 = _torch_init_encoder(1)
    rv0 = {k: v for k, v in sd0.items() if k.endswith("running_var")}

    # record each BN layer's n = elements per channel via forward hooks
    bn_n = {}
    name_of = {m: name for name, m in enc.named_modules()}
    for m in enc.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.register_forward_hook(
                lambda mod, inp, out: bn_n.__setitem__(
                    name_of[mod], inp[0].numel() // inp[0].shape[1]
                )
            )

    want_losses = _train_reference_crw(enc, [batch], lr, tau)
    ref_final = {k: v.numpy().copy() for k, v in enc.state_dict().items()}

    trainer = _our_trainer_from_torch_init(
        sd0, 1, (T, N, H, W), lr, tau, batch_size=B, fused_bn="twopass"
    )
    got_loss = float(trainer.train_step(batch))
    np.testing.assert_allclose(got_loss, want_losses[0], rtol=5e-5)

    ours_final = export_state_dict(
        jax.tree.map(
            np.asarray,
            {
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
        )
    )
    decay = 0.9  # one blend step
    checked = 0
    for k in ref_final:
        if k.endswith("running_mean"):
            # atol scaled to the stat's magnitude: near-zero channel means
            # carry absolute backend noise that a pure rtol misreads
            scale = float(np.max(np.abs(ref_final[k]))) or 1.0
            np.testing.assert_allclose(
                ours_final[k], ref_final[k], rtol=1e-3, atol=1e-3 * scale,
                err_msg=k,
            )
            checked += 1
        elif k.endswith("running_var"):
            n = bn_n[k[: -len(".running_var")]]
            resid_t = ref_final[k] - decay * rv0[k]
            resid_o = ours_final[k] - decay * rv0[k]
            scale = float(np.max(np.abs(resid_t))) or 1.0
            np.testing.assert_allclose(
                resid_t, resid_o * n / (n - 1), rtol=2e-3,
                atol=2e-3 * scale, err_msg=f"{k} (n={n})",
            )
            checked += 1
    # 13 BN layers x (mean, var): bn0, model.bn1, layer1 2x, layers 2-4
    # 3x each (bn1, bn2, downsample) — reference src/encoder.py:63-89
    assert checked == 26


# --------------------------------------------------------------------------
# 5. the full lifecycle: train K steps both sides, then each side's own
#    propagate evaluates its own trained encoder — the BASELINE north star
# --------------------------------------------------------------------------


def test_trained_encoder_miou_parity():
    """Both sides train the CNN encoder for K=10 Adam steps on an identical
    class-structured batch schedule (the loss actually descends), then the
    reference's own propagate() and our PropagationPipeline each evaluate
    THEIR OWN trained encoder on a shared fixture. Asserts per-step loss
    agreement, the BASELINE.json north-star mIoU gap (<= 0.5 pt), and pins
    the prediction flip count. Closes the train->eval lifecycle end to end:
    reference flow scripts/train.py:56-75 + src/utils.py:93-161."""
    import jax
    import test_e2e_bitmatch as e2e

    from radar_sounder_crw_tpu.ops import confusion_matrix, miou

    B, T, N, H, W = 2, 6, 12, 16, 16
    K, lr, tau, ncls = 10, 1e-3, 0.05, 4
    rng = np.random.default_rng(5)
    protos = rng.standard_normal((ncls, H, W)).astype(np.float32)
    cls = np.array([n * ncls // N for n in range(N)])

    def make_seq(b, t, drift=0.15, noise=0.3):
        base = protos[cls][None, None]
        d = np.cumsum(drift * rng.standard_normal((b, t, N, H, W)), axis=1)
        return (
            base + d + noise * rng.standard_normal((b, t, N, H, W))
        ).astype(np.float32)

    batches = [make_seq(B, T) for _ in range(K)]

    enc, sd0 = _torch_init_encoder(0)
    want = _train_reference_crw(enc, batches, lr, tau)
    trainer = _our_trainer_from_torch_init(
        sd0, 0, (T, N, H, W), lr, tau, batch_size=B
    )
    got = [float(trainer.train_step(b)) for b in batches]
    rel = np.abs(np.asarray(got) - np.asarray(want)) / np.abs(want)
    assert np.all(rel[:3] < 1e-5), rel[:3]
    assert np.all(rel < 5e-3), rel  # measured ~1.2e-3 by step 10

    # ---- eval: each side's own propagate on a shared fixture -------------
    Te = 8
    seq = make_seq(1, Te)[0]
    seg = np.repeat(cls, H)[:, None] * np.ones((1, W), np.int64)
    cfgp = (12, 6.0, 0.05, 5)  # cxt, radius, temp, knn
    lp = e2e._make_lp(*cfgp)
    enc.train(False)
    want_pred, _, _ = e2e._reference_propagate(
        seq, seg, enc, lp, ncls, False, False
    )
    trained_vars = jax.tree.map(np.asarray, {"params": trainer.state.params})
    pipe = e2e._our_pipeline(0, False, trained_vars, cfgp, ncls, False)
    res = pipe(seq, seg)

    gt = np.repeat(cls[:, None], want_pred.shape[-1], axis=1)

    def mi(pred):
        return miou(confusion_matrix(gt.ravel(), np.asarray(pred).ravel(), ncls))

    gap = abs(mi(want_pred) - mi(res.prediction))
    flips = int((np.asarray(res.prediction) != want_pred).sum())
    assert gap <= 0.005, f"mIoU gap {gap * 100:.3f} pt (north star: 0.5)"
    # measured: identical maps; budget a couple of flips for backend drift
    assert flips <= 2, f"{flips}/{want_pred.size} prediction flips"


# --------------------------------------------------------------------------
# 6. UNet supervised trajectory: the reference's softmax-then-CE loop
# --------------------------------------------------------------------------


def test_unet_train_trajectory_matches_reference():
    """K=10 Adam steps of the supervised UNet from a shared torch init on an
    identical batch schedule, reproducing the reference loop VERBATIM —
    including its double-softmax quirk (softmax the logits, then
    cross_entropy ON THE PROBABILITIES, reference
    scripts/test/test_unet.py:63-65) — then both trained nets segment a
    held-out strip batch in eval mode (running stats). Asserts per-step loss
    agreement within the measured float-noise envelope, >=99.5% pixel
    agreement of the eval maps, and accuracy gap <= 0.5 pt. Closes the UNet
    train->eval lifecycle the same way section 5 closes CRW's (round-5
    VERDICT #5)."""
    import jax
    import torch
    import torch.nn.functional as F

    from radar_sounder_crw_tpu.models.torch_import import import_state_dict
    from radar_sounder_crw_tpu.parallel.mesh import replicated
    from radar_sounder_crw_tpu.train.unet_trainer import (
        UNetState,
        UNetTrainConfig,
        UNetTrainer,
    )

    B, H, W, C, K, lr = 4, 32, 16, 4, 10, 1e-3
    rng = np.random.default_rng(3)
    protos = rng.standard_normal((C,)).astype(np.float32) * 2.0
    bands = np.linspace(0, C, H, endpoint=False).astype(np.int64)  # (H,)

    def make_batch():
        y = np.broadcast_to(bands[None, :, None], (B, H, W))
        x = protos[y] + 0.5 * rng.standard_normal((B, H, W))
        onehot = np.eye(C, dtype=np.float32)[y]
        return x[..., None].astype(np.float32), onehot

    batches = [make_batch() for _ in range(K)]
    x_te, y_te = make_batch()

    ref_unet = import_reference("unet")
    torch.manual_seed(11)
    tnet = ref_unet.UNet(1, C, bilinear=True)
    sd0 = {k: v.numpy().copy() for k, v in tnet.state_dict().items()}

    # the reference loop, scripts/test/test_unet.py:55-70 (CPU, fixed batches)
    opt = torch.optim.Adam(tnet.parameters(), lr=lr)
    tnet.train(True)
    want = []
    with cuda_neutralized():
        for x, y in batches:
            pred = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            pred = F.softmax(pred, dim=1)  # the quirk: probs into CE
            loss = F.cross_entropy(
                input=pred, target=torch.from_numpy(y.transpose(0, 3, 1, 2))
            )
            want.append(float(loss.detach()))
            opt.zero_grad()
            loss.backward()
            opt.step()
        tnet.train(False)
        with torch.no_grad():
            want_pred = (
                tnet(torch.from_numpy(x_te.transpose(0, 3, 1, 2)))
                .argmax(dim=1)
                .numpy()
            )

    # our trainer from the identical init, identical schedule
    cfg = UNetTrainConfig(
        batch_size=B, epochs=1, lr=lr, n_classes=C,
        quirk_double_softmax=True, device_resident=False,
    )
    trainer = UNetTrainer(cfg)
    trainer.init_state(batches[0][0].shape)
    variables = import_state_dict(sd0)
    st = trainer.state
    repl = replicated(trainer.mesh)
    trainer.state = jax.device_put(
        UNetState(
            step=st.step,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=trainer.tx.init(variables["params"]),
        ),
        repl,
    )
    got = []
    w = np.ones(B, np.float32)
    for x, y in batches:
        # B=4 is partial on the 8-device test mesh -> the replicated step
        # (exact BN batch statistics), same path fit() takes
        trainer.state, loss = trainer._step_repl(
            trainer.state,
            jax.device_put(x, repl),
            jax.device_put(y, repl),
            jax.device_put(w, repl),
        )
        got.append(float(jax.device_get(loss)))

    rel = np.abs(np.asarray(got) - np.asarray(want)) / np.abs(want)
    # a semantics error (Adam bias correction, BN momentum, the quirk's CE
    # direction) is systematic and visible at step 1 (~1e-7 measured there);
    # later steps amplify backend conv noise through 18 conv layers + 9 BNs,
    # faster than the small CNN's envelope (measured K=10 profile: 1.7e-7,
    # 1.3e-6, 8.1e-6, 1.9e-5, then plateauing 4e-6..4.8e-5 — asserted ~10x)
    assert rel[0] < 2e-6, rel
    assert np.all(rel < 5e-4), rel

    ours_pred = trainer.predict(x_te)
    agree = (ours_pred == want_pred).mean()
    assert agree >= 0.995, f"eval map agreement {agree:.4f}"
    gt = y_te.argmax(-1)
    gap = abs((want_pred == gt).mean() - (ours_pred == gt).mean())
    assert gap <= 0.005, f"accuracy gap {gap * 100:.2f} pt"

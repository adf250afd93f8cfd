"""Encoder architecture tests: param counts, torch forward parity, and
state-dict import/export round-trips.

The torch "oracle" modules below are built from the documented architecture
spec (reference: src/encoder.py) purely to cross-check numerics; attribute
names follow the reference state_dict layout so export_state_dict output can
be loaded directly with load_state_dict — validating the weight mapping and
the forward math in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from radar_sounder_crw_tpu.models import (
    CNNEncoder,
    ResNetEncoder,
    create_model,
    export_state_dict,
    import_state_dict,
    param_count,
)


# ---------------------------------------------------------------- oracles


def torch_cnn(in_ch):
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(in_ch, 8, 5, padding=1)
    m.conv2 = tnn.Conv2d(8, 32, 5, padding=1)
    m.conv3 = tnn.Conv2d(32, 64, 3, padding=1)
    m.conv4 = tnn.Conv2d(64, 128, 3, padding=1)
    m.conv5 = tnn.Conv2d(128, 128, 3, padding=1)
    m.fc = tnn.Linear(128, 128)

    def forward(x):
        x = tnn.functional.max_pool2d(torch.relu(m.conv1(x)), 2, stride=1)
        x = tnn.functional.max_pool2d(torch.relu(m.conv2(x)), 2, stride=1)
        x = torch.relu(m.conv3(x))
        x = torch.relu(m.conv4(x))
        x = torch.relu(m.conv5(x))
        x = x.mean(dim=(2, 3))
        return m.fc(x)

    m.forward = forward
    return m


class TorchBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        s = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + s)


def torch_resnet_encoder(in_ch):
    enc = tnn.Module()
    enc.fc0 = tnn.Conv2d(in_ch, 3, 1, padding=1)
    enc.bn0 = tnn.BatchNorm2d(3)
    core = tnn.Module()
    core.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    core.bn1 = tnn.BatchNorm2d(64)
    core.layer1 = tnn.Sequential(TorchBlock(64, 64, 1))
    core.layer2 = tnn.Sequential(TorchBlock(64, 128, 2))
    core.layer3 = tnn.Sequential(TorchBlock(128, 256, 2))
    core.layer4 = tnn.Sequential(TorchBlock(256, 512, 2))
    core.fc = tnn.Linear(512, 128)
    enc.model = core

    def forward(x):
        x = torch.relu(enc.bn0(enc.fc0(x)))
        x = torch.relu(core.bn1(core.conv1(x)))
        x = tnn.functional.max_pool2d(x, 3, stride=2, padding=1)
        for stage in (core.layer1, core.layer2, core.layer3, core.layer4):
            x = stage(x)
        x = x.mean(dim=(2, 3))
        return core.fc(x)

    enc.forward = forward
    return enc


def to_torch_input(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


# ---------------------------------------------------------------- tests


def cnn_expected_params(in_ch):
    return (
        (in_ch * 8 * 25 + 8)
        + (8 * 32 * 25 + 32)
        + (32 * 64 * 9 + 64)
        + (64 * 128 * 9 + 128)
        + (128 * 128 * 9 + 128)
        + (128 * 128 + 128)
    )


def resnet_expected_params(in_ch):
    stem = (in_ch * 3 + 3) + 2 * 3
    core = 3 * 64 * 49 + 2 * 64  # conv1 + bn1
    core += 2 * (64 * 64 * 9) + 2 * (2 * 64)  # layer1
    for cin, cout in ((64, 128), (128, 256), (256, 512)):
        core += cin * cout * 9 + cout * cout * 9 + cin * cout  # convs + proj
        core += 3 * (2 * cout)  # bn1, bn2, downsample bn
    core += 512 * 128 + 128  # fc
    return stem + core


@pytest.mark.parametrize("pos_embed", [False, True])
def test_param_counts(pos_embed):
    in_ch = 2 if pos_embed else 1
    for model_id, expect in [
        (0, cnn_expected_params(in_ch)),
        (1, resnet_expected_params(in_ch)),
    ]:
        model = create_model(model_id, pos_embed)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, in_ch)), train=False
        )
        assert param_count(variables["params"]) == expect


@pytest.mark.parametrize("pos_embed", [False, True])
def test_cnn_forward_matches_torch(pos_embed):
    in_ch = 2 if pos_embed else 1
    model = CNNEncoder(pos_embed=pos_embed)
    x = np.random.default_rng(0).standard_normal((4, 16, 16, in_ch)).astype(
        np.float32
    )
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    oracle = torch_cnn(in_ch)
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_state_dict(variables).items()}
    oracle.load_state_dict(sd)
    with torch.no_grad():
        theirs = oracle.forward(to_torch_input(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_resnet_forward_matches_torch_eval_and_train():
    model = ResNetEncoder(pos_embed=False)
    x = np.random.default_rng(2).standard_normal((8, 16, 16, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)

    oracle = torch_resnet_encoder(1)
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_state_dict(variables).items()}
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)

    # eval mode: running stats
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    oracle.eval()
    with torch.no_grad():
        theirs = oracle.forward(to_torch_input(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-5)

    # train mode: batch stats + running-stat updates must match
    ours_train, mutated = model.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    oracle.train()
    with torch.no_grad():
        theirs_train = oracle.forward(to_torch_input(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours_train), theirs_train, rtol=5e-3, atol=5e-4)

    new_mean = np.asarray(mutated["batch_stats"]["bn0"]["mean"])
    np.testing.assert_allclose(
        new_mean, oracle.bn0.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )


def test_state_dict_roundtrip():
    model = ResNetEncoder(pos_embed=True)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 2)), train=False
    )
    back = import_state_dict(export_state_dict(variables))
    flat_a = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    flat_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(back)
    }
    assert set(flat_a) == set(flat_b)
    for key in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[key]), np.asarray(flat_b[key]))


def test_dataparallel_prefix_stripped():
    model = CNNEncoder(pos_embed=False)
    variables = model.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 16, 16, 1)), train=False
    )
    sd = {f"module.{k}": v for k, v in export_state_dict(variables).items()}
    back = import_state_dict(sd)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]),
    )


def test_s2d_stem_matches_plain_conv():
    """StemConv's space-to-depth path must be mathematically identical to
    the plain 7x7/stride-2 conv (same params, same output, same gradients),
    and must fall back to the plain conv for odd spatial sizes."""
    import jax
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.models.resnet import StemConv

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 18, 18, 3)).astype(np.float32))

    plain = StemConv(width=64, s2d=False)
    fast = StemConv(width=64, s2d=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (checkpoint/interchange compatibility)
    assert jax.tree_util.tree_structure(
        params
    ) == jax.tree_util.tree_structure(fast.init(jax.random.PRNGKey(0), x))
    assert params["params"]["kernel"].shape == (7, 7, 3, 64)

    y0 = plain.apply(params, x)
    y1 = fast.apply(params, x)
    assert y0.shape == y1.shape == (4, 9, 9, 64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-5)

    def loss(fn, p):
        return jnp.sum(jnp.sin(fn.apply(p, x)))

    g0 = jax.grad(lambda p: loss(plain, p))(params)["params"]["kernel"]
    g1 = jax.grad(lambda p: loss(fast, p))(params)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-4, atol=1e-5)

    # odd spatial size: falls back to the plain conv path
    xo = jnp.asarray(rng.standard_normal((2, 17, 17, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fast.apply(params, xo)),
        np.asarray(plain.apply(params, xo)),
        rtol=1e-6,
    )


def test_resnet_encoder_s2d_flag_full_model():
    """ResNetEncoder(s2d_stem=True) == (False) end-to-end on CPU."""
    import jax
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.models import create_model

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((5, 16, 16, 1)).astype(np.float32))
    m0 = create_model(1, False, s2d_stem=False)
    m1 = create_model(1, False, s2d_stem=True)
    v = m0.init(jax.random.PRNGKey(3), x, train=False)
    y0 = m0.apply(v, x, train=False)
    y1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4)

"""Torch-free .pt IO (data/torch_pt.py): round-trips against real torch,
restricted-unpickler safety, and the torch-BLOCKED end-to-end data path
(VERDICT r3 #4 done-criterion: a subprocess that cannot import torch still
loads a real-layout .pt radargram through create_dataset)."""

import os
import pickle
import subprocess
import sys
import zipfile

import numpy as np
import pytest
import torch

from radar_sounder_crw_tpu.data import load_pt, save_pt

FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "data_root"
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the import blocker every torch-free subprocess below runs under
_BLOCK_TORCH = """
import sys

class _Block:
    def find_module(self, name, path=None):
        return self if name == "torch" or name.startswith("torch.") else None
    def load_module(self, name):
        raise ImportError(f"torch is blocked in this subprocess ({name})")

sys.meta_path.insert(0, _Block())
sys.modules.pop("torch", None)
"""


def _run_torch_free(body: str, env_extra=None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(RSCRW_FORCE_CPU="1", JAX_PLATFORMS="")
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-c", _BLOCK_TORCH + body],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )


def test_zip_tensor_roundtrip(tmp_path):
    for t in (
        torch.arange(24, dtype=torch.float32).reshape(2, 3, 4) * 1.5,
        torch.arange(40, dtype=torch.float64).reshape(5, 8)[:, ::2],  # strided
        torch.tensor(7, dtype=torch.int64),  # 0-dim
        torch.tensor([True, False, True]),
        torch.randn(6).half(),
    ):
        p = tmp_path / "t.pt"
        torch.save(t, str(p))
        got = load_pt(p)
        assert np.array_equal(got, t.numpy()) and got.shape == tuple(t.shape)


def test_zip_state_dict_roundtrip(tmp_path):
    m = torch.nn.Sequential(torch.nn.Conv2d(1, 4, 3), torch.nn.BatchNorm2d(4))
    p = tmp_path / "sd.pt"
    torch.save(m.state_dict(), str(p))
    got = load_pt(p)
    for k, v in m.state_dict().items():
        assert np.array_equal(np.asarray(got[k]), v.numpy()), k
        assert np.asarray(got[k]).shape == tuple(v.shape), k


def test_legacy_format_roundtrip(tmp_path):
    base = torch.arange(20, dtype=torch.float32)
    obj = {
        "t": torch.randn(3, 5),
        "v1": base[2:8],  # storage view with offset
        "v2": base.reshape(4, 5)[1:3],
        "n": 5,
    }
    p = tmp_path / "legacy.pt"
    torch.save(obj, str(p), _use_new_zipfile_serialization=False)
    got = load_pt(p)
    assert np.array_equal(got["t"], obj["t"].numpy())
    assert np.array_equal(got["v1"], obj["v1"].numpy())
    assert np.array_equal(got["v2"], obj["v2"].numpy())
    assert got["n"] == 5


def test_writer_torch_reads_and_self_roundtrip(tmp_path):
    obj = {
        "a": np.random.default_rng(3).standard_normal((4, 7)).astype(np.float32),
        "i8": np.arange(5, dtype=np.int8),
        "big": np.full((3,), 2**40, np.int64),
        "zero_d": np.float64(2.5),
        "k": 3, "f": 2.5, "s": "hi", "neg": -(2**40), "none": None,
        "lst": [1, 2.0, "three"], "tup": (4, 5),
    }
    p = tmp_path / "w.pt"
    save_pt(p, obj)
    # real torch opens it (weights_only — the strictest loader)
    sd = torch.load(str(p), weights_only=True)
    assert np.array_equal(sd["a"].numpy(), obj["a"])
    assert sd["big"][0].item() == 2**40 and sd["neg"] == -(2**40)
    assert float(sd["zero_d"]) == 2.5 and sd["s"] == "hi"
    # and our own reader round-trips it
    got = load_pt(p)
    assert np.array_equal(got["a"], obj["a"]) and got["tup"] == (4, 5)


def test_restricted_unpickler_refuses_arbitrary_globals(tmp_path):
    evil = tmp_path / "evil.pt"
    with zipfile.ZipFile(str(evil), "w") as z:
        z.writestr("archive/data.pkl", pickle.dumps(os.system))
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_pt(evil)


def test_load_radargram_pt_is_torch_free(tmp_path):
    """load_radargram on a committed real-layout .pt works with torch
    import-blocked (in-process check via the restricted reader)."""
    body = """
import numpy as np
from radar_sounder_crw_tpu.data import load_radargram
rg = load_radargram(
    "tests/fixtures/data_root/MCoRDS1_2010_DC8/RG2_MCoRDS1_2010_DC8.pt"
)
assert rg.shape == (64, 1024) and rg.dtype == np.float32
print("OK", rg.shape)
"""
    proc = _run_torch_free(body)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout


def test_create_dataset_end_to_end_without_torch():
    """VERDICT r3 #4 done-criterion: block `import torch`, then load a
    real-layout .pt radargram end-to-end through create_dataset +
    get_reference and serve a window."""
    body = """
import numpy as np
from radar_sounder_crw_tpu.data import create_dataset, get_reference
ds = create_dataset(id=0, length=6, dim=(16, 16), overlap=(8, 0), full=True)
assert ds.rg.shape == (64, 1024)
item = ds[0]
assert item.shape == (6, 7, 16, 16) and item.dtype == np.float32
n, seg = get_reference(id=0, h=64, w=0)
assert n == 4 and seg.shape == (64, 1024)
print("OK", item.shape)
"""
    proc = _run_torch_free(body, env_extra={"RSCRW_DATA_ROOT": FIXTURE_ROOT})
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout
    assert "using synthetic" not in proc.stdout


def test_checkpoint_interchange_without_torch(tmp_path):
    """save_encoder_torch -> load_torch_checkpoint round-trips with torch
    blocked: the .pt interchange no longer needs the optional dep at all."""
    body = f"""
import numpy as np
import jax, jax.numpy as jnp
# force the CPU backend BEFORE any device use: with JAX_PLATFORMS unset,
# auto-detection initializes the axon TPU tunnel, which can hang
# indefinitely when the tunnel session is unhealthy (observed) — this
# test is about torch-free IO, not the accelerator
jax.config.update("jax_platforms", "cpu")
from radar_sounder_crw_tpu.models import create_model, load_torch_checkpoint
from radar_sounder_crw_tpu.train.checkpoint import save_encoder_torch
model = create_model(0, False)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False)
path = {str(tmp_path / "enc.pt")!r}
save_encoder_torch(dict(variables), path)
back = load_torch_checkpoint(path)
flat_a = jax.tree_util.tree_leaves_with_path(dict(variables))
flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
assert len(flat_a) == len(flat_b)
for k, v in flat_a:
    np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[k]), err_msg=str(k))
print("OK", len(flat_a), "leaves")
"""
    proc = _run_torch_free(body)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout


def test_exported_checkpoint_loads_in_real_torch(tmp_path):
    """The torch-free writer's state_dict is accepted by real torch.load
    AND matches export_state_dict exactly."""
    import jax
    import jax.numpy as jnp

    from radar_sounder_crw_tpu.models import create_model
    from radar_sounder_crw_tpu.models.torch_import import export_state_dict
    from radar_sounder_crw_tpu.train.checkpoint import save_encoder_torch

    model = create_model(0, False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False
    )
    path = str(tmp_path / "enc.pt")
    save_encoder_torch(dict(variables), path)
    sd = torch.load(path, weights_only=True)
    want = export_state_dict(
        jax.tree.map(np.asarray, dict(variables))
    )
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k].numpy(), want[k], err_msg=k)


def test_legacy_framing_pickles_are_restricted(tmp_path):
    """The legacy format's framing pickles (magic/protocol/sys_info/keys)
    run BEFORE any format check — they must refuse globals too, not just
    the main pickle (review finding: stock pickle.load there would execute
    a malicious reduce payload)."""
    evil = tmp_path / "evil_legacy.bin"  # not a zipfile -> legacy path
    evil.write_bytes(pickle.dumps(os.system))
    with pytest.raises(pickle.UnpicklingError, match="framing"):
        load_pt(evil)


def test_rebuild_tensor_rejects_out_of_bounds_views():
    """offset/size/stride come straight from the (untrusted) pickle and
    as_strided performs no bounds checking — every geometry that could read
    outside the storage must raise, not return heap garbage (advisor
    finding, round 4)."""
    from radar_sounder_crw_tpu.data.torch_pt import _rebuild_tensor

    storage = np.arange(4, dtype=np.float32)
    # in-bounds views still work
    np.testing.assert_array_equal(
        _rebuild_tensor(storage, 1, (3,), (1,)), storage[1:]
    )
    np.testing.assert_array_equal(
        _rebuild_tensor(storage, 0, (2, 2), (2, 1)), storage.reshape(2, 2)
    )
    # empty tensors are fine even at the storage edge
    assert _rebuild_tensor(storage, 4, (0,), (1,)).shape == (0,)
    for offset, size, stride in (
        (0, (64,), (1,)),      # size overruns
        (2, (3,), (1,)),       # offset + span overruns
        (1, (2,), (3,)),       # stride reaches past the end
        (5, (0,), (1,)),       # even empty: offset beyond storage
        (-1, (2,), (1,)),      # negative offset
        (0, (2,), (-1,)),      # negative stride (reads before the base)
        (0, (-2,), (1,)),      # negative size
        (0, (2, 2), (1,)),     # rank mismatch
    ):
        with pytest.raises(ValueError, match="torch-free .pt reader"):
            _rebuild_tensor(storage, offset, size, stride)


def test_crafted_overrun_zip_pt_is_refused(tmp_path):
    """End-to-end: a zip .pt whose pickle declares a tensor view larger
    than its storage must raise, not read out-of-bounds memory."""
    from collections import OrderedDict as OD

    class _Marker:
        pass

    marker = _Marker()

    class _Evil:
        def __reduce__(self):
            return (
                torch._utils._rebuild_tensor_v2,
                (marker, 0, (64,), (1,), False, OD()),
            )

    import io

    buf = io.BytesIO()

    class _P(pickle.Pickler):
        def persistent_id(self, obj):
            if obj is marker:
                # storage of only 4 elements
                return ("storage", torch.FloatStorage, "0", "cpu", 4)
            return None

    _P(buf, protocol=2).dump(_Evil())
    evil = tmp_path / "overrun.pt"
    with zipfile.ZipFile(str(evil), "w") as z:
        z.writestr("archive/data.pkl", buf.getvalue())
        z.writestr(
            "archive/data/0", np.arange(4, dtype=np.float32).tobytes()
        )
    with pytest.raises(ValueError, match="overruns its storage"):
        load_pt(evil)


def test_radargram_unsafe_fallback_requires_opt_in(tmp_path, monkeypatch):
    """A .pt both the torch-free reader AND torch.load(weights_only=True)
    refuse is only fully unpickled with RSCRW_ALLOW_UNSAFE_PT=1 (advisor
    finding, round 4: the fallback used to go straight to
    weights_only=False)."""
    from radar_sounder_crw_tpu.data import load_radargram

    class _TensorMaker:
        def __reduce__(self):
            # benign, but references a global outside both allowlists
            return (torch.ones, ((2, 3),))

    p = tmp_path / "maker.pt"
    torch.save(_TensorMaker(), str(p))
    monkeypatch.delenv("RSCRW_ALLOW_UNSAFE_PT", raising=False)
    with pytest.raises(ValueError, match="RSCRW_ALLOW_UNSAFE_PT"):
        load_radargram(str(p))
    monkeypatch.setenv("RSCRW_ALLOW_UNSAFE_PT", "1")
    rg = load_radargram(str(p))
    np.testing.assert_array_equal(rg, np.ones((2, 3), np.float32))


def test_checkpoint_unsafe_fallback_requires_opt_in(tmp_path, monkeypatch):
    """Same opt-in gate on the checkpoint reader: a whole pickled nn.Module
    (the documented use for the torch fallback) is refused without the env
    var and converted with it."""
    from radar_sounder_crw_tpu.models.torch_import import (
        load_torch_checkpoint,
    )

    seq = torch.nn.Sequential(torch.nn.Conv2d(1, 4, 3))
    p = tmp_path / "module.pt"
    torch.save(seq, str(p))
    monkeypatch.delenv("RSCRW_ALLOW_UNSAFE_PT", raising=False)
    with pytest.raises(ValueError, match="RSCRW_ALLOW_UNSAFE_PT"):
        load_torch_checkpoint(str(p))
    monkeypatch.setenv("RSCRW_ALLOW_UNSAFE_PT", "1")
    variables = load_torch_checkpoint(str(p))
    np.testing.assert_array_equal(
        variables["params"]["0"]["kernel"],
        seq[0].weight.detach().numpy().transpose(2, 3, 1, 0),
    )


def test_legacy_raw_storage_resolves_without_desync(tmp_path):
    """A legacy .pt holding a raw torch.Storage (no rebuilt tensor) must
    not desync the payload stream (the pid carries the dtype, so the byte
    advance is exact); the storage resolves to its flat array and LATER
    tensors still read correctly."""
    s = torch.arange(6, dtype=torch.float32).storage()
    t2 = torch.arange(12, dtype=torch.float64).reshape(3, 4)
    p = tmp_path / "raw_storage.pt"
    torch.save({"s": s, "t2": t2}, str(p), _use_new_zipfile_serialization=False)
    got = load_pt(p)
    np.testing.assert_array_equal(
        np.asarray(got["s"]), np.arange(6, dtype=np.float32)
    )
    np.testing.assert_array_equal(got["t2"], t2.numpy())

def test_fallback_error_carries_both_refusal_reasons(tmp_path, monkeypatch):
    """The shared torch_fallback_load policy (one helper for both .pt entry
    points) must surface BOTH refusal diagnostics: the torch-free reader's
    reason in the message and torch's weights_only=True exception as the
    chained __cause__ — so a user with a trusted-but-exotic file can see
    which global needs allowlisting (round-5 review finding: the old inline
    copies discarded torch's reason)."""
    from radar_sounder_crw_tpu.data import load_radargram

    class _TensorMaker:
        def __reduce__(self):
            return (torch.ones, ((2, 3),))

    p = tmp_path / "maker2.pt"
    torch.save(_TensorMaker(), str(p))
    monkeypatch.delenv("RSCRW_ALLOW_UNSAFE_PT", raising=False)
    with pytest.raises(ValueError) as ei:
        load_radargram(str(p))
    msg = str(ei.value)
    # our reader's reason (it names the refused global) is in the message
    assert "torch-free reader" in msg and "getattr" in msg
    assert "weights_only=True" in msg
    # torch's own refusal is the direct cause, not swallowed
    assert "Weights only load failed" in str(ei.value.__cause__)

"""Device-resident windowing: on-device gathers must be bit-identical to the
host windowing path, and resident training must match host-path training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radar_sounder_crw_tpu.data import RGWindows
from radar_sounder_crw_tpu.data.device_windows import (
    gather_windows,
    resident_source,
)
from radar_sounder_crw_tpu.data.patchify import extract_window, window_geometry
from radar_sounder_crw_tpu.data.registry import SubsetWindows
from radar_sounder_crw_tpu.data.synthetic import synthetic_radargram


@pytest.mark.parametrize(
    "shape,dim,overlap,length",
    [
        ((96, 400), (16, 16), (8, 0), 5),  # reference train geometry
        ((70, 300), (12, 10), (4, 3), 4),  # both-axis overlap
        ((64, 200), (16, 8), (0, 0), 3),  # no overlap
    ],
)
def test_gather_matches_host_windowing(shape, dim, overlap, length):
    rng = np.random.default_rng(3)
    rg = rng.standard_normal(shape).astype(np.float32)
    geo = window_geometry(shape, dim, overlap, length)
    idxs = np.array([0, 1, geo.nw // 2, geo.nw - 1], np.int32)
    got = np.asarray(gather_windows(jnp.asarray(rg), jnp.asarray(idxs), geo))
    want = np.stack([extract_window(rg, geo, int(i)) for i in idxs])
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_gather_shorter_length():
    rng = np.random.default_rng(4)
    rg = rng.standard_normal((96, 400)).astype(np.float32)
    geo = window_geometry(rg.shape, (16, 16), (8, 0), 8)
    got = np.asarray(
        gather_windows(jnp.asarray(rg), jnp.asarray([2], np.int32), geo, length=3)
    )
    want = extract_window(rg, geo, 2, length=3)
    np.testing.assert_array_equal(got[0], want)


def test_gather_rejects_out_of_range_indices():
    """The host path raises IndexError for out-of-range windows; the gather
    path must fail the same way for concrete indices instead of silently
    clamping to the edge column (jnp.take's default)."""
    rng = np.random.default_rng(5)
    rg = rng.standard_normal((96, 400)).astype(np.float32)
    geo = window_geometry(rg.shape, (16, 16), (8, 0), 5)
    for bad in ([geo.nw], [-1]):
        with pytest.raises(IndexError, match="window index"):
            gather_windows(jnp.asarray(rg), np.asarray(bad, np.int32), geo)

    ds = RGWindows(rg, length=5, dim=(16, 16), overlap=(8, 0))
    sub = SubsetWindows(ds, [0, geo.nw])  # stale index past the last window
    with pytest.raises(ValueError, match="index map"):
        resident_source(sub)


def test_resident_source_unwraps_subsets():
    rg, _ = synthetic_radargram(H=96, W=600, nclasses=4, seed=0)
    ds = RGWindows(rg, length=4, dim=(16, 16), overlap=(8, 0))
    src = resident_source(ds)
    assert src is not None and src[0] is ds.rg
    np.testing.assert_array_equal(src[2], np.arange(len(ds)))

    sub = SubsetWindows(ds, [0, 3, 5])
    rg2, geo2, imap = resident_source(sub)
    assert rg2 is ds.rg and geo2 == ds.geo
    np.testing.assert_array_equal(imap, [0, 3, 5])

    class NotResident:
        pass

    assert resident_source(NotResident()) is None


def _concat_sets(widths=(400, 260, 330), length=4, dim=(16, 16),
                 overlap=(8, 0), H=64):
    from radar_sounder_crw_tpu.data import ConcatWindows

    sets = [
        RGWindows(
            synthetic_radargram(H=H, W=w, nclasses=4, seed=10 + i)[0],
            length=length, dim=dim, overlap=overlap,
        )
        for i, w in enumerate(widths)
    ]
    return ConcatWindows(sets), sets


def test_concat_resident_gather_matches_host_windowing():
    """Multi-radargram stack gather (segments of different trace widths,
    zero-padded) must be bit-identical to ConcatWindows' host windowing."""
    cat, sets = _concat_sets()
    rg_stack, geo, imap = resident_source(cat)
    assert rg_stack.shape[0] == 3 and imap.shape == (len(cat), 2)
    # every dataset position, in one gather
    got = np.asarray(
        gather_windows(jnp.asarray(rg_stack), jnp.asarray(imap), geo)
    )
    want = np.stack([cat[i] for i in range(len(cat))])
    np.testing.assert_array_equal(got, want)

    # memoized: a second call serves the SAME host stack (the trainer's
    # device-upload cache is keyed on host-array identity)
    rg_stack2, _, _ = resident_source(cat)
    assert rg_stack2 is rg_stack

    # subset over the concat
    pos = [0, len(sets[0]) + 1, len(cat) - 1]
    sub = SubsetWindows(cat, pos)
    rg3, geo3, imap3 = resident_source(sub)
    assert rg3 is rg_stack
    np.testing.assert_array_equal(imap3, imap[pos])

    stale = SubsetWindows(cat, [0, len(cat)])
    with pytest.raises(ValueError, match="index map"):
        resident_source(stale)


def test_concat_resident_rejects_mismatched_windowing():
    """Same item shape but different overlap math cannot share one gather
    geometry — must fall back to the host path (None), not mis-gather."""
    from radar_sounder_crw_tpu.data import ConcatWindows

    rg_a, _ = synthetic_radargram(H=64, W=300, nclasses=4, seed=1)
    rg_b, _ = synthetic_radargram(H=56, W=300, nclasses=4, seed=2)
    a = RGWindows(rg_a, length=4, dim=(16, 16), overlap=(8, 0))  # nh=7
    b = RGWindows(rg_b, length=4, dim=(16, 16), overlap=(8, 0))  # nh=6
    with pytest.raises(ValueError, match="item shapes"):
        ConcatWindows([a, b])  # still rejected upstream

    # engineer identical item shapes with different oh: (16,16) oh=8 on H=64
    # gives nh=7; dim (16,16) oh=8 vs (16,16) oh=8 ... use ow instead
    c = RGWindows(rg_a, length=4, dim=(16, 16), overlap=(8, 4))
    d = RGWindows(rg_a, length=4, dim=(16, 16), overlap=(8, 0))
    if tuple(c.item_shape) == tuple(d.item_shape):
        cat = ConcatWindows([c, d])
        assert resident_source(cat) is None


@pytest.mark.parametrize("batch_size", [8, 3])
def test_concat_resident_training_matches_host_path(batch_size):
    """Batched multi-radargram training (BASELINE.json config 4) through the
    resident stack must produce the same losses as the host windowing path
    (sharded full batches at 8; replicated partial batches at 3)."""
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    cat, _ = _concat_sets(widths=(300, 220), length=4)
    base = dict(
        model=0, patch_size=(16, 16), seq_length=4, overlap=(8, 0),
        batch_size=batch_size, epochs=2, lr=1e-3, tau=0.05, seed=11,
    )
    losses = {}
    for mode in (False, True):
        trainer = CRWTrainer(CRWTrainConfig(**base, device_resident=mode))
        losses[mode] = trainer.fit(cat, log=lambda s: None)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("batch_size", [8, 3])
def test_resident_training_matches_host_path(batch_size):
    """batch_size=8 runs the sharded resident step on the 8-device mesh;
    batch_size=3 runs the replicated (partial-batch) resident step."""
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    rg, _ = synthetic_radargram(H=64, W=700, nclasses=4, seed=1)
    ds = RGWindows(rg, length=4, dim=(16, 16), overlap=(8, 0))
    base = dict(
        model=0, patch_size=(16, 16), seq_length=4, overlap=(8, 0),
        batch_size=batch_size, epochs=2, lr=1e-3, tau=0.05, seed=11,
    )
    losses = {}
    for mode in (False, True):
        trainer = CRWTrainer(CRWTrainConfig(**base, device_resident=mode))
        losses[mode] = trainer.fit(ds, log=lambda s: None)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6, atol=1e-7)


def test_resident_true_rejects_non_resident_dataset():
    from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer

    class HostOnly:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((4, 3, 16, 16), np.float32)

    trainer = CRWTrainer(
        CRWTrainConfig(model=0, epochs=1, batch_size=2, device_resident=True)
    )
    with pytest.raises(ValueError, match="device_resident"):
        trainer.fit(HostOnly(), log=lambda s: None)

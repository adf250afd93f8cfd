"""Analysis subsystem: horizontality xent metric (vs torch oracle), PELT
change-point detection on synthetic signals, metrics vs sklearn."""

import numpy as np
import pytest
import torch

from radar_sounder_crw_tpu.ops import (
    classification_report,
    column_diffs,
    confusion_matrix,
    detect_change_point,
    horizontality_xent,
    miou,
    pelt_rbf,
    per_class_stats,
)
from radar_sounder_crw_tpu.utils.ndiag import ndiag_matrix


def normed(rng, shape):
    e = rng.standard_normal(shape).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_xent_matches_torch_oracle():
    """Intended semantics: consecutive-frame affinity, CE of transposed A
    against identity targets with reduction='none'."""
    rng = np.random.default_rng(0)
    emb = normed(rng, (7, 10, 16))
    tau = 0.1
    got = np.asarray(horizontality_xent(emb, tau))

    e = torch.tensor(emb)
    A = torch.einsum("tnc,tmc->tnm", e[:-1], e[1:]) / tau
    I = torch.tensor(ndiag_matrix(10, 1))
    want = np.stack(
        [
            torch.nn.functional.cross_entropy(
                A[t].transpose(0, 1), I, reduction="none"
            ).numpy()
            for t in range(6)
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_xent_quirk_mode_matches_reference_literal():
    """Quirk mode reproduces the channel-shifted computation verbatim."""
    rng = np.random.default_rng(1)
    emb = normed(rng, (5, 8, 12))
    got = np.asarray(horizontality_xent(emb, 0.1, quirk_channel_shift=True))
    e = torch.tensor(emb)
    A = torch.einsum("tnc,tmc->tnm", e[:, :, :-1], e[:, :, 1:]) / 0.1
    I = torch.tensor(ndiag_matrix(8, 1))
    want = np.stack(
        [
            torch.nn.functional.cross_entropy(
                A[t].transpose(0, 1), I, reduction="none"
            ).numpy()
            for t in range(4)
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_xent_row_softmax_matches_reference_heatmap_direction():
    """row_softmax=True = the reference heatmap's UNtransposed CE
    (reference: scripts/test/heatmap.py:55)."""
    rng = np.random.default_rng(6)
    emb = normed(rng, (5, 9, 12))
    got = np.asarray(
        horizontality_xent(emb, 0.1, quirk_channel_shift=True, row_softmax=True)
    )
    e = torch.tensor(emb)
    A = torch.einsum("tnc,tmc->tnm", e[:, :, :-1], e[:, :, 1:]) / 0.1
    I = torch.tensor(ndiag_matrix(9, 1))
    want = np.stack(
        [
            torch.nn.functional.cross_entropy(A[t], I, reduction="none").numpy()
            for t in range(4)
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_column_diffs():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    got = np.asarray(column_diffs(x))
    want = [np.abs(x[:, i] - x[:, i + 1]).sum() for i in range(3)]
    np.testing.assert_allclose(got, want)


def test_pelt_finds_planted_change():
    rng = np.random.default_rng(2)
    sig = np.concatenate(
        [rng.normal(0, 0.3, 60), rng.normal(4.0, 0.3, 40)]
    )
    bkps = pelt_rbf(sig, pen=5.0)
    assert bkps[-1] == 100
    interior = bkps[:-1]
    assert len(interior) >= 1
    assert any(abs(b - 60) <= 5 for b in interior), f"breakpoints {bkps}"

    idx = detect_change_point(sig, pen=5.0)
    assert idx is not None and abs(idx - 65) <= 10  # reference adds +5


def test_pelt_no_change_returns_none():
    rng = np.random.default_rng(3)
    sig = rng.normal(0, 0.2, 80)
    idx = detect_change_point(sig, pen=50.0)
    assert idx is None or idx >= 0  # typically None; never negative
    assert detect_change_point(np.zeros(2), pen=5.0) is None  # too short


def test_metrics_match_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(4)
    t = rng.integers(0, 5, 1000)
    p = np.where(rng.random(1000) < 0.7, t, rng.integers(0, 5, 1000))
    cm = confusion_matrix(t, p, 5)
    np.testing.assert_array_equal(cm, sklearn.confusion_matrix(t, p, labels=range(5)))
    precision, recall, f1, support = per_class_stats(cm)
    sp, sr, sf, ss = sklearn.precision_recall_fscore_support(t, p, labels=range(5))
    np.testing.assert_allclose(precision, sp, rtol=1e-9)
    np.testing.assert_allclose(recall, sr, rtol=1e-9)
    np.testing.assert_allclose(f1, sf, rtol=1e-9)
    np.testing.assert_array_equal(support, ss)
    assert "weighted avg" in classification_report(t, p, 5)
    # mIoU via jaccard
    sj = sklearn.jaccard_score(t, p, average=None, labels=range(5))
    np.testing.assert_allclose(miou(cm), sj.mean(), rtol=1e-9)


def test_ndiag_matrix():
    m = ndiag_matrix(5, 1)
    np.testing.assert_array_equal(m, np.eye(5, dtype=np.float32))
    m3 = ndiag_matrix(5, 3)  # reference comment: n=3 is tridiagonal
    assert m3[0, 0] > 0 and m3[0, 1] > 0 and m3[0, 2] == 0
    np.testing.assert_allclose(m3.sum(1), 1.0, rtol=1e-6)

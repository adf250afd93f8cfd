"""Change-point correction behavior: the corrected tail must be a
high-quality segmentation in its own right, and the splice must leave the
untouched head region bit-identical.

(Whether correction beats the uncorrected forward pass depends on how badly
the forward pass degraded after the change — on easy synthetic lines both are
accurate; the reference applies it selectively for the same reason,
reference: scripts/test/test_all.py:103-122.)"""

import numpy as np

from radar_sounder_crw_tpu.data import RGWindows, synthetic_radargram
from radar_sounder_crw_tpu.infer import (
    PropagationPipeline,
    correction_pixel_offset,
    splice_correction,
)
from radar_sounder_crw_tpu.ops import LabelPropConfig
from radar_sounder_crw_tpu.train import CRWTrainConfig, CRWTrainer


def test_correction_tail_quality_and_splice_exactness():
    rg, seg = synthetic_radargram(H=128, W=1300, nclasses=4, seed=44, change_point=0.55)
    T = 24
    ds = RGWindows(rg, length=T, dim=(16, 16), overlap=(8, 0))
    geo = ds.geo

    cfg = CRWTrainConfig(model=0, batch_size=8, epochs=2, lr=1e-3, tau=0.05)
    trainer = CRWTrainer(cfg)
    short = RGWindows(rg, length=6, dim=(16, 16), overlap=(8, 0))
    trainer.fit(short, log=lambda s: None)

    pipe = PropagationPipeline(
        trainer.model,
        trainer.variables(),
        LabelPropConfig(cxt_size=24, radius=6, temperature=0.05, knn=5),
        nclasses=4,
    )
    seq = ds[0]
    rg_len, rg_h = geo.rg_len(), geo.rg_h()
    res = pipe(seq, seg[:rg_h, : geo.w])
    pred_px = pipe.prediction_to_pixels(res.prediction, (seg.shape[0], rg_len))

    change_idx = T // 2
    small_length = T - change_idx
    off = correction_pixel_offset(small_length, geo.w, geo.ow)
    seg_ref2 = seg[:, rg_len - off : rg_len - off + geo.w]
    corrected = pipe(ds.get_smaller_item(0, small_length), seg_ref2)
    fixed_px = splice_correction(pred_px, corrected.prediction, off)

    gt = seg[:, :rg_len]
    tail = slice(rg_len - off, rg_len)
    acc_tail = (fixed_px[:, tail] == gt[:, tail]).mean()
    assert acc_tail > 0.7, f"corrected tail accuracy {acc_tail}"
    # head region untouched by the splice
    np.testing.assert_array_equal(fixed_px[:, : rg_len - off], pred_px[:, : rg_len - off])
    # corrected window really is re-seeded from seg_ref2: its frame-0
    # labels must equal the downsampled second seed, not the original one
    from radar_sounder_crw_tpu.infer.propagate import (
        seed_onehot_from_segmentation,
    )

    _, seed2_labels = seed_onehot_from_segmentation(seg_ref2, geo.nh, 4)
    np.testing.assert_array_equal(corrected.prediction[:, 0], seed2_labels)
    assert corrected.prediction.shape == (geo.nh, small_length)

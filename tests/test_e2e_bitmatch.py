"""END-TO-END bit-match: the reference's composed inference pipeline vs ours.

Every op is equivalence-tested elsewhere; these tests compose them. The
UPSTREAM encoders (reference src/encoder.py:9-89 — the real classes, not
oracles) and the UPSTREAM full propagate() (src/utils.py:93-161) run on CPU
torch with shared weights exported via models/torch_import, against
PropagationPipeline — asserting IDENTICAL argmax segmentation maps
(BASELINE.json's "bit-matched segmentation maps" promise), plus xent / soft-
label agreement to float tolerance.

Pinned flag combination that reproduces the reference byte-for-byte:
  * xent_quirk=True        (the reference's channel-shift einsum, utils.py:118)
  * bn_train_mode=True     for test_all.py-style runs (the reference never
                           calls .train(False) there, scripts/test/test_all.py:49-54)
  * bn_train_mode=False    for test.py-style runs (it does, scripts/test/test.py:42)
  * row_softmax=False      (propagate() transposes A before CE, utils.py:123)
  * T <= cxt_size+1        (beyond that the reference hits its ctx-trim label
                           misalignment bug, which we intentionally fix —
                           ops/labelprop.py module docstring)

The second test composes the ENTIRE scripts/test/test.py flow (dataset
windowing -> propagate -> pixel upsample -> change-point fallback ->
get_smaller_item re-propagation -> correction splice) on a synthetic
radargram saved as a real .pt file, reference RGDataset vs our RGWindows,
and asserts the final pixel maps are identical.
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


def _make_lp(cxt, radius, temp, knn):
    lp_mod = import_reference("imported.labelprop")
    return lp_mod.LabelPropVOS_CRW(
        {"CXT_SIZE": cxt, "RADIUS": radius, "TEMP": temp, "KNN": knn}
    )


def _reference_propagate(seq_np, seg_np, encoder, lp, nclasses, pos_embed, use_last):
    import torch

    utils = import_reference("utils")
    with cuda_neutralized(), torch.no_grad():
        pred, xent, change_idx = utils.propagate(
            torch.tensor(seq_np),
            torch.tensor(seg_np),
            encoder,
            lp,
            nclasses,
            pos_embed,
            use_last,
        )
    return (
        pred.numpy().astype(np.int32),
        xent.numpy(),
        change_idx,
    )


def _our_pipeline(model_id, pos_embed, variables, cfg_tuple, nclasses, bn_train):
    from radar_sounder_crw_tpu.infer import PropagationPipeline
    from radar_sounder_crw_tpu.models import create_model
    from radar_sounder_crw_tpu.ops import LabelPropConfig

    cxt, radius, temp, knn = cfg_tuple
    model = create_model(model_id, pos_embed)
    return PropagationPipeline(
        model,
        variables,
        LabelPropConfig(cxt, radius, temp, knn),
        nclasses=nclasses,
        use_pos_embed=pos_embed,
        bn_train_mode=bn_train,
        xent_quirk=True,  # reference utils.py:118 channel-shift einsum
    )


@pytest.mark.parametrize(
    "model_id,bn_train,pos_embed,use_last",
    [
        (0, False, False, False),  # CNN (no BN), first-frame seed
        (0, False, True, False),  # CNN + positional-embedding channel
        (0, False, False, True),  # CNN, last-frame seed (time flip)
        (1, False, False, False),  # ResNet, eval BN (test.py:42 semantics)
        (1, True, False, False),  # ResNet, train BN (test_all.py semantics)
        (1, False, False, True),  # ResNet, last-frame seed (reverse pass)
    ],
)
def test_propagate_pipeline_bitmatch(model_id, bn_train, pos_embed, use_last):
    import torch

    from radar_sounder_crw_tpu.models.torch_import import import_state_dict

    utils = import_reference("utils")
    torch.manual_seed(11)
    encoder = utils.create_model(model_id, pos_embed)
    encoder.train(bn_train)
    variables = import_state_dict(
        {k: v.numpy() for k, v in encoder.state_dict().items()}
    )

    T, N, H, W = 8, 12, 16, 16
    nclasses = 4
    cfg = (12, 6.0, 0.05, 5)  # cxt, radius, temp, knn; T <= cxt+1
    rng = np.random.default_rng(3)
    seq = rng.standard_normal((T, N, H, W)).astype(np.float32)
    # seed segmentation patch covering the first frame's pixels: horizontal
    # class bands + speckle, all labels within [0, nclasses)
    seg = (np.arange(N * H)[:, None] * nclasses // (N * H)) * np.ones(
        (1, W), np.int64
    )
    speckle = rng.random(seg.shape) < 0.07
    seg[speckle] = rng.integers(0, nclasses, size=int(speckle.sum()))

    lp = _make_lp(*cfg)
    want_pred, want_xent, want_change = _reference_propagate(
        seq, seg, encoder, lp, nclasses, pos_embed, use_last
    )

    pipe = _our_pipeline(model_id, pos_embed, variables, cfg, nclasses, bn_train)
    res = pipe(seq, seg, use_last=use_last)

    np.testing.assert_array_equal(res.prediction, want_pred)
    np.testing.assert_allclose(res.xent, want_xent, rtol=2e-3, atol=2e-4)
    assert want_change is None  # stubbed ruptures raises -> reference None


def test_full_test_script_flow_bitmatch(tmp_path):
    """Compose the ENTIRE reference scripts/test/test.py:34-85 flow against
    our scripts/test.py flow (same library calls the CLI makes), including the
    correction re-propagation and pixel splice."""
    import torch

    from radar_sounder_crw_tpu.data import RGWindows
    from radar_sounder_crw_tpu.infer import (
        correction_pixel_offset,
        splice_correction,
    )
    from radar_sounder_crw_tpu.models.torch_import import import_state_dict

    utils, dataset_mod = import_reference("utils", "dataset")
    from torchvision.transforms import InterpolationMode, Resize  # stubbed
    from torchvision.transforms.functional import resize as tv_resize

    # --- shared inputs: synthetic radargram saved as a real .pt file -------
    torch.manual_seed(11)
    rng = np.random.default_rng(4)
    Hpx, Wpx = 130, 200
    rg = rng.standard_normal((Hpx, Wpx)).astype(np.float32)
    rg_path = tmp_path / "rg.pt"
    torch.save(torch.tensor(rg), str(rg_path))

    seq_length, patch, overlap = 10, (16, 16), (8, 0)
    nclasses = 4
    cfg = (12, 6.0, 0.05, 5)

    encoder = utils.create_model(0, False)  # CNN: deterministic, no BN
    encoder.train(False)
    variables = import_state_dict(
        {k: v.numpy() for k, v in encoder.state_dict().items()}
    )

    # --- reference side: scripts/test/test.py:44-85 ------------------------
    ref_ds = dataset_mod.RGDataset(
        filepath=str(rg_path), length=seq_length, dim=patch, overlap=overlap
    )
    seq_t = ref_ds[0]
    T, N, H, W = seq_t.shape
    rg_len = T * (W - overlap[-1]) + overlap[-1]
    rg_h = N * (H - overlap[0]) + overlap[0]
    seg_full = (np.arange(Hpx)[:, None] * nclasses // Hpx) * np.ones(
        (1, Wpx), np.int64
    )
    speckle = rng.random(seg_full.shape) < 0.05
    seg_full[speckle] = rng.integers(0, nclasses, size=int(speckle.sum()))
    seg_t = torch.tensor(seg_full)

    lp = _make_lp(*cfg)
    with cuda_neutralized(), torch.no_grad():
        want, _, change_idx = utils.propagate(
            seq_t, seg_t[:rg_h, :W], encoder, lp, nclasses, False, False
        )
        up = Resize((seg_t.shape[0], rg_len), InterpolationMode.NEAREST)
        want_px = up(want[None]).squeeze()

        assert change_idx is None
        change_idx = seq_length - 2  # fallback (scripts/test/test.py:73-74)
        small_length = seq_length - change_idx
        pixel_offset = small_length * (patch[-1] - overlap[-1])
        small_seq = ref_ds.get_smaller_item(0, small_length)
        seg_ref2 = seg_t[:, rg_len - pixel_offset : rg_len - pixel_offset + W]
        corr, _, _ = utils.propagate(
            small_seq, seg_ref2, encoder, lp, nclasses, False, False
        )
        want_px[:, rg_len - pixel_offset :] = tv_resize(
            corr[None],
            size=(seg_t.shape[0], pixel_offset),
            interpolation=InterpolationMode.NEAREST,
        ).squeeze()
    want_px = want_px.numpy().astype(np.int32)

    # --- our side: scripts/test.py:51-90 flow -------------------------------
    ours_ds = RGWindows(rg, length=seq_length, dim=patch, overlap=overlap)
    pipe = _our_pipeline(0, False, variables, cfg, nclasses, bn_train=False)
    res = pipe(ours_ds[0], seg_full[:rg_h, :W])
    pred_px = pipe.prediction_to_pixels(
        res.prediction, (seg_full.shape[0], rg_len)
    )
    offset = correction_pixel_offset(small_length, patch[1], overlap[1])
    assert offset == pixel_offset
    corrected = pipe(
        ours_ds.get_smaller_item(0, small_length),
        seg_full[:, rg_len - offset : rg_len - offset + W],
    )
    got_px = splice_correction(pred_px, corrected.prediction, offset)

    np.testing.assert_array_equal(got_px, want_px)

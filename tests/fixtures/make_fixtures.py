"""Generate the committed real-format data fixtures.

Produces a tiny MCoRDS1-style crop in the exact on-disk layout the dataset
registry expects under a data root (reference paths: src/utils.py:32,57,66),
saved in the reference's real format (torch .pt tensors) plus an .npy twin:

  data_root/MCoRDS1_2010_DC8/RG2_MCoRDS1_2010_DC8.pt   float32 (64, 1024)
  data_root/MCoRDS1_2010_DC8/SG2_MCoRDS1_2010_DC8.pt   uint8 GT, 4 classes
  data_root/MCoRDS1_2010_DC8/SG3_MCoRDS1_2010_DC8.pt   SG2 + uncertain label 4
  rg_crop.npy                                           .npy twin of the RG

Run from the repo root: python tests/fixtures/make_fixtures.py
Deterministic (seed 21) — regenerating must reproduce the committed bytes.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from radar_sounder_crw_tpu.data.registry import _with_uncertain_band  # noqa: E402
from radar_sounder_crw_tpu.data.synthetic import synthetic_radargram  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    rg, seg = synthetic_radargram(H=64, W=1024, nclasses=4, seed=21)
    d = os.path.join(HERE, "data_root", "MCoRDS1_2010_DC8")
    os.makedirs(d, exist_ok=True)
    torch.save(
        torch.from_numpy(rg.astype(np.float32)),
        os.path.join(d, "RG2_MCoRDS1_2010_DC8.pt"),
    )
    torch.save(
        torch.from_numpy(seg.astype(np.uint8)),
        os.path.join(d, "SG2_MCoRDS1_2010_DC8.pt"),
    )
    sg3 = _with_uncertain_band(seg.astype(np.uint8), uncertain_label=4)
    torch.save(torch.from_numpy(sg3), os.path.join(d, "SG3_MCoRDS1_2010_DC8.pt"))
    np.save(os.path.join(HERE, "rg_crop.npy"), rg.astype(np.float32))
    print("fixtures written under", os.path.join(HERE, "data_root"))


if __name__ == "__main__":
    main()

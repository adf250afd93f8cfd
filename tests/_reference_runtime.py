"""Run the UPSTREAM reference code (/root/reference/src) on CPU torch.

Shared harness for the cross-implementation equivalence tests: installs
working stand-ins for the reference's deps that this image doesn't ship
(ruptures, torchvision) and neutralizes its hardcoded 'cuda' strings
(src/model.py:36, src/utils.py:90,119,137,141,143), so the reference's own
propagate()/CRW/encoders can be executed read-only and compared against this
framework.

The torchvision Resize stand-in is NOT a re-implementation: it delegates to
torch.nn.functional.interpolate(mode='nearest'), which is exactly what
torchvision's Resize(InterpolationMode.NEAREST) does on tensors — so the
reference side's resize semantics stay genuinely torch's own.
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

REF = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REF)


class _TorchNearestResize:
    """torchvision.transforms.Resize(size, NEAREST) for tensors: delegates to
    F.interpolate(mode='nearest') (what torchvision does internally)."""

    def __init__(self, size, interpolation=None, **kw):
        self.size = tuple(int(s) for s in size)

    def __call__(self, img):
        import torch
        import torch.nn.functional as F

        nd = img.ndim
        x = img[None] if nd == 3 else img  # -> (B, C, H, W)
        dtype = x.dtype
        xf = x if x.is_floating_point() else x.float()
        y = F.interpolate(xf, size=self.size, mode="nearest")
        if not torch.is_floating_point(img):
            y = y.to(dtype)
        return y[0] if nd == 3 else y


class _RaisingPelt:
    """ruptures.Pelt stand-in that always raises: the reference wraps change
    detection in try/except and falls back to change_idx=None
    (src/utils.py:126-132)."""

    def __init__(self, *a, **kw):
        pass

    def fit(self, *a, **kw):
        raise RuntimeError("ruptures not available in this environment")


class _FunctionalPelt:
    """ruptures.Pelt stand-in that WORKS: delegates to this framework's own
    PELT (ops/pelt.pelt_rbf, proven optimal against exhaustive enumeration in
    tests/test_analysis.py), so the reference's change-point detection runs
    for real in the composed-equivalence tests — both sides then detect from
    their own xent signals through identical segmentation code."""

    def __init__(self, model="rbf", min_size=2, jump=5, **kw):
        if model != "rbf":
            raise ValueError(f"only the rbf cost is stubbed, got {model!r}")
        self.min_size, self.jump = min_size, jump
        self._signal = None

    def fit(self, signal):
        import numpy as np

        self._signal = np.asarray(signal, dtype=np.float64)
        return self

    def predict(self, pen):
        from radar_sounder_crw_tpu.ops.pelt import pelt_rbf

        return pelt_rbf(
            self._signal, pen=pen, min_size=self.min_size, jump=self.jump
        )


def install_stubs(functional_pelt: bool = False) -> None:
    """(Re)install functional stubs for ruptures/torchvision. Overwrites any
    earlier minimal stubs so the order tests run in doesn't matter."""
    rpt = types.ModuleType("ruptures")
    rpt.Pelt = _FunctionalPelt if functional_pelt else _RaisingPelt
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Resize = _TorchNearestResize
    tvt.InterpolationMode = types.SimpleNamespace(NEAREST="nearest")
    tvf = types.ModuleType("torchvision.transforms.functional")

    def _resize(img, size, interpolation=None, **kw):
        return _TorchNearestResize(size)(img)

    tvf.resize = _resize
    tvt.functional = tvf
    tv = types.ModuleType("torchvision")
    tv.transforms = tvt
    sys.modules["ruptures"] = rpt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf


@contextlib.contextmanager
def cuda_neutralized():
    """Patch torch so the reference's hardcoded 'cuda' targets land on CPU."""
    import torch

    orig_to = torch.Tensor.to
    orig_cuda = torch.Tensor.cuda
    orig_zeros = torch.zeros

    def patched_to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    def patched_cuda(self, *args, **kwargs):
        return self

    def patched_zeros(*args, **kwargs):
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_zeros(*args, **kwargs)

    torch.Tensor.to = patched_to
    torch.Tensor.cuda = patched_cuda
    torch.zeros = patched_zeros
    try:
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.Tensor.cuda = orig_cuda
        torch.zeros = orig_zeros


def import_reference(*names: str, functional_pelt: bool = False):
    """Import reference modules by their flat names ('utils', 'model',
    'encoder', 'dataset', 'imported.labelprop'), purging cached copies so each
    test gets a clean import against the current stubs.

    Imports run under cuda_neutralized() so `from torch import zeros`-style
    bindings (reference src/model.py:3) capture the neutralized functions;
    attribute-style uses (torch.zeros in utils.py) still need the caller to
    wrap the *call* in cuda_neutralized()."""
    install_stubs(functional_pelt=functional_pelt)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for mod in ("model", "utils", "dataset", "encoder", "unet", "imported",
                "imported.labelprop", "imported.maskedatt", "imported.crw"):
        sys.modules.pop(mod, None)
    out = []
    with cuda_neutralized():
        for name in names:
            out.append(__import__(name, fromlist=["_"] if "." in name else []))
    return out[0] if len(out) == 1 else tuple(out)

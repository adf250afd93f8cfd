"""Import PyTorch state_dicts into flax param/batch_stats pytrees.

Lets encoders trained with the reference (or any torch checkpoint with the
same architecture) run in this framework bit-for-bit — required for
segmentation-map parity checks. Handles:
  * conv weights: torch OIHW -> flax HWIO
  * linear weights: torch (out, in) -> flax (in, out)
  * BatchNorm: weight/bias -> scale/bias; running_mean/var -> batch_stats
  * the reference's module names (conv1, bn0, model.layer2.0.downsample.0, fc)
  * optional DataParallel "module." prefixes (the reference sometimes saves
    wrapped state dicts; reference: scripts/train.py:45-47,92)

The flax modules in this package name their submodules to make this mapping
structural: torch "layerS.B" == flax "layerS_B", torch "downsample.0/.1" ==
flax "downsample_conv"/"downsample_bn". The reference UNet's nn.Sequential
naming (reference src/unet.py: "inc.double_conv.0", "down1.maxpool_conv.1.
double_conv.3", "up1.conv.double_conv.1", "up1.up", "outc.conv") maps to
this package's flat DoubleConv names ("inc"/"downN"/"upN" + conv1/bn1/
conv2/bn2, "upN_up", "outc").
"""

from __future__ import annotations

import numpy as np

_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# torch Sequential index inside DoubleConv -> flax submodule name
# (2 and 5 are the parameterless ReLUs)
_DC_IDX = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}
_DC_IDX_REV = {v: k for k, v in _DC_IDX.items()}
_UNET_DC_PARENTS = {"inc", "down1", "down2", "down3", "up1", "up2", "up3"}


def _strip_prefix(sd: dict) -> dict:
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _module_path(torch_mod: str) -> tuple[str, ...]:
    """Translate a dotted torch module path to the flax module path."""
    parts = torch_mod.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "downsample":
            idx = parts[i + 1]
            out.append("downsample_conv" if idx == "0" else "downsample_bn")
            i += 2
        elif p == "double_conv" and i + 1 < len(parts) and parts[i + 1] in _DC_IDX:
            out.append(_DC_IDX[parts[i + 1]])
            i += 2
        elif p == "maxpool_conv" and i + 1 < len(parts) and parts[i + 1] == "1":
            i += 2  # MaxPool2d holds no params; the DoubleConv keeps the parent name
        elif p == "conv" and out and (out[-1].startswith("up") or out[-1] == "outc"):
            i += 1  # Up.conv / OutConv.conv wrappers have no flax counterpart
        elif p == "up" and out and out[-1].startswith("up"):
            out[-1] = out[-1] + "_up"  # ConvTranspose branch of Up
            i += 1
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _assign(tree: dict, path: tuple[str, ...], value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def import_state_dict(state_dict: dict) -> dict:
    """torch state_dict -> {'params': ..., 'batch_stats': ...} pytree.

    Accepts tensors or numpy arrays as values. The result's tree structure
    matches this package's CNNEncoder / ResNetEncoder / UNet modules.
    """
    sd = _strip_prefix(dict(state_dict))
    variables: dict = {"params": {}, "batch_stats": {}}
    # group keys by module path to classify conv/linear vs batchnorm
    by_module: dict[str, dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        mod, _, leaf = key.rpartition(".")
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        by_module.setdefault(mod, {})[leaf] = arr

    for mod, leaves in by_module.items():
        path = _module_path(mod)
        is_bn = "running_mean" in leaves or "running_var" in leaves
        for leaf, arr in leaves.items():
            if is_bn:
                coll, name = _BN_MAP[leaf]
                _assign(variables[coll], path + (name,), arr)
            elif leaf == "weight":
                if arr.ndim == 4 and path and path[-1].endswith("_up"):
                    # ConvTranspose2d (in,out,kH,kW) -> flax (kH,kW,in,out),
                    # PLUS a spatial flip: flax nn.ConvTranspose (default
                    # transpose_kernel=False) is a fractionally-strided
                    # cross-correlation y[si+k] += x[i]*w[K-1-k], while torch
                    # ConvTranspose2d uses w[k] — verified numerically
                    _assign(
                        variables["params"],
                        path + ("kernel",),
                        np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1],
                    )
                elif arr.ndim == 4:  # conv OIHW -> HWIO
                    _assign(
                        variables["params"],
                        path + ("kernel",),
                        np.transpose(arr, (2, 3, 1, 0)),
                    )
                elif arr.ndim == 2:  # linear (out,in) -> (in,out)
                    _assign(variables["params"], path + ("kernel",), arr.T)
                else:
                    raise ValueError(f"unexpected weight rank for {mod}: {arr.shape}")
            elif leaf == "bias":
                _assign(variables["params"], path + ("bias",), arr)
            else:
                raise ValueError(f"unrecognized leaf '{leaf}' in module '{mod}'")
    if not variables["batch_stats"]:
        del variables["batch_stats"]
    return variables


def load_torch_checkpoint(path: str) -> dict:
    """Read a torch .pt state_dict file and convert (host-side IO only).

    Goes through the TORCH-FREE restricted reader first (data/torch_pt.py),
    so reference-trained checkpoints load on a torch-less TPU VM; an
    installed torch is only the fallback for layouts the restricted reader
    refuses (e.g. a pickled nn.Module instead of a state_dict)."""
    from ..data.torch_pt import load_pt, torch_fallback_load

    try:
        sd = load_pt(path)
    except Exception as e:
        sd = torch_fallback_load(
            path, e,
            hint=" (e.g. a whole pickled nn.Module — re-save as a state_dict)",
        )
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_state_dict(sd)


def export_state_dict(variables: dict) -> dict:
    """Inverse mapping: flax variables -> a torch-style state_dict (numpy).

    Useful for checking round-trips and for handing weights back to the
    reference implementation.
    """
    out: dict[str, np.ndarray] = {}

    def walk(node, path, coll):
        for key, val in node.items():
            if isinstance(val, dict):
                walk(val, path + (key,), coll)
            else:
                out_key = _to_torch_name(path + (key,), coll)
                arr = np.asarray(val)
                if key == "kernel":
                    if arr.ndim == 4 and path and path[-1].endswith("_up"):
                        # flax ConvTranspose (kH,kW,in,out) -> torch
                        # (in,out,kH,kW); undo the import-side spatial flip
                        arr = np.transpose(arr[::-1, ::-1], (2, 3, 0, 1))
                    elif arr.ndim == 4:
                        arr = np.transpose(arr, (3, 2, 0, 1))
                    else:
                        arr = arr.T
                out[out_key] = arr

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return out


def _to_torch_name(path: tuple[str, ...], coll: str) -> str:
    mods, leaf = path[:-1], path[-1]
    parts: list[str] = []
    for m in mods:
        if m == "downsample_conv":
            parts += ["downsample", "0"]
        elif m == "downsample_bn":
            parts += ["downsample", "1"]
        elif "_" in m and m.startswith("layer") and m.split("_")[-1].isdigit():
            stage, block = m.rsplit("_", 1)
            parts += [stage, block]
        elif m in _DC_IDX_REV and parts and parts[-1] in _UNET_DC_PARENTS:
            # reference UNet Sequential wrappers (src/unet.py): Down wraps
            # its DoubleConv behind maxpool_conv.1, Up behind .conv
            parent = parts[-1]
            if parent.startswith("down"):
                parts += ["maxpool_conv", "1", "double_conv", _DC_IDX_REV[m]]
            elif parent.startswith("up"):
                parts += ["conv", "double_conv", _DC_IDX_REV[m]]
            else:  # inc
                parts += ["double_conv", _DC_IDX_REV[m]]
        elif m == "outc":
            parts += ["outc", "conv"]
        elif m.startswith("up") and m.endswith("_up"):
            parts += [m[: -len("_up")], "up"]
        else:
            parts.append(m)
    leaf_map = {
        ("params", "kernel"): "weight",
        ("params", "scale"): "weight",
        ("params", "bias"): "bias",
        ("batch_stats", "mean"): "running_mean",
        ("batch_stats", "var"): "running_var",
    }
    return ".".join(parts + [leaf_map[(coll, leaf)]])

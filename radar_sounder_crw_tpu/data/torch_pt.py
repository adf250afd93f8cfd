"""Torch-free reader/writer for PyTorch ``.pt`` tensor files.

The reference's data products are torch-saved tensors — radargrams,
segmentation maps, encoder state_dicts (reference: src/utils.py:28-43 loads
them with ``torch.load``; scripts/train.py:92 writes state_dicts). This
framework's deployment target is a TPU VM with no torch install, so the
data path cannot import torch: this module reads (and writes) the torch
serialization formats directly.

Reading uses a RESTRICTED unpickler — only the symbols torch's tensor
serialization actually emits are resolvable (``_rebuild_tensor[_v2]``,
``_rebuild_parameter``, the typed-storage classes, ``OrderedDict``,
``torch.Size``); anything else raises. This is both the torch-free property
and a safety property: a ``.pt`` from an untrusted source cannot execute
arbitrary reduce payloads through this loader.

Supported layouts:
  * the zipfile format (torch >= 1.6 default): ``archive/data.pkl`` +
    ``archive/data/<key>`` raw little-endian storages;
  * the legacy monolithic pickle format (torch < 1.6 / ``_use_new_zipfile_
    serialization=False``): magic + protocol + sys_info pickles, the main
    pickle with deferred storages, then the storage payloads.

Tensors deserialize to numpy arrays (bfloat16 via ml_dtypes, which JAX
ships). ``save_pt`` writes the zip layout with a hand-emitted protocol-2
pickle so no torch (or sys.modules games) is needed on the writing side;
real torch loads the result (round-trip tested in tests/test_data_io.py).
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict

import numpy as np

__all__ = ["load_pt", "save_pt"]

# torch typed-storage class name <-> numpy dtype. BFloat16 resolves lazily
# through ml_dtypes (a JAX dependency) so plain numpy hosts still import.
_STORAGE_DTYPES = {
    "DoubleStorage": "float64",
    "FloatStorage": "float32",
    "HalfStorage": "float16",
    "LongStorage": "int64",
    "IntStorage": "int32",
    "ShortStorage": "int16",
    "CharStorage": "int8",
    "ByteStorage": "uint8",
    "BoolStorage": "bool",
    "ComplexFloatStorage": "complex64",
    "ComplexDoubleStorage": "complex128",
    "BFloat16Storage": "bfloat16",
}


def _np_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class _StorageType:
    """Stand-in for the pickled ``torch.FloatStorage``-style classes."""

    def __init__(self, dtype_name: str):
        self.dtype = _np_dtype(_STORAGE_DTYPES[dtype_name])


def _rebuild_tensor(storage: np.ndarray, offset, size, stride):
    """numpy equivalent of torch._utils._rebuild_tensor: view the flat
    storage at (element) offset with the given shape/strides.

    offset/size/stride come from the (untrusted) pickle, and as_strided
    performs no bounds checking — so every element the view can touch is
    proven inside the storage FIRST, otherwise a crafted .pt would read
    out-of-bounds process memory into the returned array."""
    offset = int(offset)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if offset < 0 or any(s < 0 for s in size) or any(s < 0 for s in stride):
        raise ValueError(
            "torch-free .pt reader: tensor with negative offset/size/stride "
            f"(offset={offset}, size={size}, stride={stride})"
        )
    if len(stride) != len(size):
        raise ValueError(
            f"torch-free .pt reader: stride rank {len(stride)} != size rank "
            f"{len(size)}"
        )
    # highest element index the strided view can reach (empty tensors touch
    # no elements, but the offset itself must still be within the storage)
    span = 0 if any(s == 0 for s in size) else (
        1 + sum((sz - 1) * st for sz, st in zip(size, stride))
    )
    if offset + span > storage.size:
        raise ValueError(
            f"torch-free .pt reader: tensor view (offset={offset}, "
            f"size={size}, stride={stride}) overruns its storage of "
            f"{storage.size} elements"
        )
    itemsize = storage.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        storage[offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    # copy: detach from the (possibly shared, read-only) storage buffer.
    # (.copy(), not ascontiguousarray — the latter promotes 0-d to 1-d)
    return arr.copy()


def _rebuild_tensor_v2(
    storage, offset, size, stride, requires_grad=False, hooks=None, metadata=None
):
    return _rebuild_tensor(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, hooks=None):
    return data


class _Pending:
    """Deferred tensor for the legacy format: the main pickle runs before
    the storage payloads appear in the stream."""

    def __init__(self, dtype, root_key, args):
        self.dtype = dtype
        self.root_key = root_key
        self.args = args  # (offset, size, stride)

    def resolve(self, storages: dict) -> np.ndarray:
        return _rebuild_tensor(storages[self.root_key], *self.args)


class _RestrictedUnpickler(pickle.Unpickler):
    """Resolves ONLY the globals torch tensor files contain."""

    _ALLOWED = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        ("torch", "Size"): tuple,
    }

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        try:
            return self._ALLOWED[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"torch-free .pt reader: global '{module}.{name}' is not a "
                f"tensor-serialization symbol (refusing to resolve it)"
            ) from None


class _ZipUnpickler(_RestrictedUnpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._cache: dict[str, np.ndarray] = {}

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, stype, key, _location, _numel = pid
        if key not in self._cache:
            raw = self._zf.read(f"{self._prefix}/data/{key}")
            self._cache[key] = np.frombuffer(raw, dtype=stype.dtype)
        return self._cache[key]


class _StorageDesc:
    """Deferred storage reference in the legacy format (the payload bytes
    come AFTER the main pickle). Unambiguous — plain tuples in user data
    could collide with a tuple-shaped descriptor."""

    __slots__ = ("dtype", "key", "offset", "numel")

    def __init__(self, dtype, key, offset, numel):
        self.dtype = dtype
        self.key = key
        self.offset = offset
        self.numel = numel  # -1 = whole storage

    def resolve(self, storages: dict) -> np.ndarray:
        arr = storages[self.key]
        if self.numel < 0:
            return arr[self.offset :]
        return arr[self.offset : self.offset + self.numel]


class _LegacyUnpickler(_RestrictedUnpickler):
    def __init__(self, file):
        super().__init__(file)
        self.pendings: list[_Pending] = []
        self.key_dtypes: dict[str, np.dtype] = {}

    def persistent_load(self, pid):
        # ('storage', storage_type, root_key, location, numel, view_metadata)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, stype, root_key, _location, _numel = pid[:5]
        # every storage key passes through here, so the payload reader can
        # advance the byte stream by the RIGHT element width even for
        # storages no rebuilt tensor references (raw torch.Storage objects)
        self.key_dtypes[root_key] = stype.dtype
        view = pid[5] if len(pid) > 5 else None
        if view:
            # (view_key, storage_offset, numel) slice of the root storage
            _vkey, voff, vnum = view
            return _StorageDesc(stype.dtype, root_key, int(voff), int(vnum))
        return _StorageDesc(stype.dtype, root_key, 0, -1)


def _legacy_rebuild_factory(unpickler: _LegacyUnpickler):
    """Legacy rebuilds get storage *descriptors*, not arrays — wrap them in
    _Pending cells resolved once the payloads are read."""

    def rebuild(storage_desc, offset, size, stride, *rest):
        p = _Pending(
            storage_desc.dtype,
            storage_desc.key,
            (int(offset) + storage_desc.offset, size, stride),
        )
        unpickler.pendings.append(p)
        return p

    return rebuild


def _resolve_pendings(obj, storages: dict):
    if isinstance(obj, (_Pending, _StorageDesc)):
        # raw torch.Storage objects resolve to their flat numpy arrays
        return obj.resolve(storages)
    if isinstance(obj, dict):
        return type(obj)(
            (k, _resolve_pendings(v, storages)) for k, v in obj.items()
        )
    if isinstance(obj, (list, tuple)):
        vals = [_resolve_pendings(v, storages) for v in obj]
        return vals if isinstance(obj, list) else tuple(vals)
    return obj


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _PlainUnpickler(pickle.Unpickler):
    """For the legacy format's framing pickles (magic number, protocol,
    sys_info, storage-key list): plain ints/strings/dicts only — resolving
    ANY global would be an attack surface, so find_class always raises.
    (The stock pickle.load here would defeat the module's restricted-loader
    safety property: the framing pickles run BEFORE any format check.)"""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"torch-free .pt reader: the legacy framing pickles must not "
            f"reference globals (found '{module}.{name}')"
        )

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "torch-free .pt reader: unexpected persistent id in a legacy "
            "framing pickle"
        )


def _load_legacy(f) -> object:
    magic = _PlainUnpickler(f).load()
    if magic != _LEGACY_MAGIC:
        raise ValueError(
            "not a torch .pt file (bad magic; the ancient tar format is not "
            "supported — re-save with a modern torch)"
        )
    _protocol = _PlainUnpickler(f).load()
    _sys_info = _PlainUnpickler(f).load()
    up = _LegacyUnpickler(f)
    # route _rebuild_tensor[_v2] through the deferred-storage factory
    rebuild = _legacy_rebuild_factory(up)
    up._ALLOWED = dict(_RestrictedUnpickler._ALLOWED)
    up._ALLOWED[("torch._utils", "_rebuild_tensor_v2")] = rebuild
    up._ALLOWED[("torch._utils", "_rebuild_tensor")] = (
        lambda s, o, sz, st: rebuild(s, o, sz, st)
    )
    result = up.load()
    keys = _PlainUnpickler(f).load()  # deserialized_storage_keys (str list)
    storages: dict[str, np.ndarray] = {}
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        if key not in up.key_dtypes:
            # every storage key must have appeared through a persistent id;
            # without its dtype the byte stream cannot be advanced reliably
            # (guessing would silently desync every later storage)
            raise ValueError(
                f"legacy .pt declares a storage ('{key}') with no "
                f"persistent-id record — unsupported layout for the "
                f"torch-free reader"
            )
        dtype = up.key_dtypes[key]
        raw = f.read(numel * dtype.itemsize)
        storages[key] = np.frombuffer(raw, dtype=dtype)
    return _resolve_pendings(result, storages)


def load_pt(path: str | os.PathLike):
    """Load a torch-saved ``.pt`` file WITHOUT torch.

    Tensors come back as numpy arrays; dict/OrderedDict/list/tuple
    containers and scalars are preserved. Raises UnpicklingError for
    pickles that reference anything beyond tensor serialization.
    """
    path = os.fspath(path)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            pkl = [n for n in zf.namelist() if n.endswith("/data.pkl")]
            if not pkl:
                raise ValueError(f"{path}: zip archive without a data.pkl")
            prefix = pkl[0][: -len("/data.pkl")]
            byteorder = f"{prefix}/byteorder"
            if byteorder in zf.namelist():
                bo = zf.read(byteorder).decode().strip()
                if bo != "little":
                    raise ValueError(f"{path}: unsupported byte order {bo!r}")
            with zf.open(pkl[0]) as f:
                return _ZipUnpickler(f, zf, prefix).load()
    with open(path, "rb") as f:
        return _load_legacy(f)


def torch_fallback_load(path: str, restricted_err: Exception, hint: str = ""):
    """The ONE fallback policy for ``.pt`` files the restricted reader
    refuses, shared by every .pt entry point (data/radargram.py,
    models/torch_import.py) so the security gate cannot drift between them:

    1. require an installed torch (else ValueError chaining the restricted
       reader's refusal);
    2. try ``torch.load(weights_only=True)`` — torch's own restricted
       unpickler stays in the loop;
    3. full unpickling (arbitrary code execution on a crafted file) only
       with the explicit ``RSCRW_ALLOW_UNSAFE_PT=1`` opt-in; otherwise
       raise a ValueError that carries BOTH refusal reasons (ours in the
       message, torch's chained as ``__cause__``) so the user can see which
       global to allowlist for a trusted-but-exotic file.
    """
    try:
        import torch
    except ImportError:
        raise ValueError(
            f"{path}: the torch-free .pt reader failed ({restricted_err}) "
            f"and torch is not installed to fall back on{hint}"
        ) from restricted_err
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as torch_err:
        if os.environ.get("RSCRW_ALLOW_UNSAFE_PT") != "1":
            raise ValueError(
                f"{path}: both the torch-free reader ({restricted_err}) and "
                f"torch.load(weights_only=True) ({torch_err}) refused this "
                f"file; set RSCRW_ALLOW_UNSAFE_PT=1 to permit full "
                f"unpickling of a TRUSTED file{hint}"
            ) from torch_err
        return torch.load(path, map_location="cpu", weights_only=False)


# --------------------------------------------------------------------------
# Writer: hand-emitted protocol-2 pickle + zip layout (torch.load-compatible)
# --------------------------------------------------------------------------

_DTYPE_STORAGE = {
    np.dtype(v) if v != "bfloat16" else "bfloat16": k
    for k, v in _STORAGE_DTYPES.items()
}


def _storage_name(dtype: np.dtype) -> str:
    try:
        import ml_dtypes

        if dtype == np.dtype(ml_dtypes.bfloat16):
            return "BFloat16Storage"
    except ImportError:
        pass
    name = _DTYPE_STORAGE.get(np.dtype(dtype))
    if name is None:
        raise TypeError(f"no torch storage type for dtype {dtype}")
    return name


class _PickleEmitter:
    """Minimal protocol-2 pickle writer for the object shapes .pt files
    hold: containers, scalars, strings, and tensors (numpy arrays). Emitting
    by hand avoids needing importable torch modules for the GLOBAL opcodes."""

    def __init__(self):
        self.out = io.BytesIO()
        self.storages: list[tuple[str, bytes]] = []  # (key, raw bytes)

    def _w(self, b: bytes):
        self.out.write(b)

    def _global(self, module: str, name: str):
        self._w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def _unicode(self, s: str):
        b = s.encode("utf-8")
        self._w(b"X" + struct.pack("<I", len(b)) + b)

    def _int(self, v: int):
        if 0 <= v < 256:
            self._w(b"K" + struct.pack("<B", v))
        elif 0 <= v < 65536:
            self._w(b"M" + struct.pack("<H", v))
        elif -(2**31) <= v < 2**31:
            self._w(b"J" + struct.pack("<i", v))
        else:
            enc = v.to_bytes((v.bit_length() + 8) // 8 or 1, "little", signed=True)
            self._w(b"\x8a" + struct.pack("<B", len(enc)) + enc)

    def _tuple(self, items, emit_item):
        n = len(items)
        if n == 0:
            self._w(b")")
            return
        if n <= 3:
            for it in items:
                emit_item(it)
            self._w({1: b"\x85", 2: b"\x86", 3: b"\x87"}[n])
            return
        self._w(b"(")
        for it in items:
            emit_item(it)
        self._w(b"t")

    def _tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        key = str(len(self.storages))
        self.storages.append((key, arr.tobytes()))
        self._global("torch._utils", "_rebuild_tensor_v2")
        self._w(b"(")
        # persistent id: ('storage', <StorageType>, key, 'cpu', numel)
        self._w(b"(")
        self._unicode("storage")
        self._global("torch", _storage_name(arr.dtype))
        self._unicode(key)
        self._unicode("cpu")
        self._int(arr.size)
        self._w(b"t")
        self._w(b"Q")  # BINPERSID
        self._int(0)  # storage offset
        self._tuple(arr.shape, self._int)
        strides = tuple(s // arr.itemsize for s in arr.strides)
        self._tuple(strides, self._int)
        self._w(b"\x89")  # requires_grad = False
        self._global("collections", "OrderedDict")
        self._w(b")R")  # OrderedDict() — empty backward hooks
        self._w(b"t")
        self._w(b"R")  # REDUCE -> the tensor

    def emit(self, obj):
        if isinstance(obj, np.ndarray):
            self._tensor(obj)
        elif isinstance(obj, (np.generic,)):
            self.emit(obj.item())
        elif obj is None:
            self._w(b"N")
        elif isinstance(obj, bool):
            self._w(b"\x88" if obj else b"\x89")
        elif isinstance(obj, int):
            self._int(obj)
        elif isinstance(obj, float):
            self._w(b"G" + struct.pack(">d", obj))
        elif isinstance(obj, str):
            self._unicode(obj)
        elif isinstance(obj, bytes):
            if len(obj) < 256:
                self._w(b"C" + struct.pack("<B", len(obj)) + obj)
            else:
                self._w(b"B" + struct.pack("<I", len(obj)) + obj)
        elif isinstance(obj, dict):
            self._w(b"}(")
            for k, v in obj.items():
                self.emit(k)
                self.emit(v)
            self._w(b"u")
        elif isinstance(obj, (list,)):
            self._w(b"](")
            for v in obj:
                self.emit(v)
            self._w(b"e")
        elif isinstance(obj, tuple):
            self._tuple(obj, self.emit)
        else:
            raise TypeError(f"save_pt cannot serialize {type(obj)}")

    def finish(self) -> bytes:
        self._w(b".")
        return b"\x80\x02" + self.out.getvalue()


def save_pt(path: str | os.PathLike, obj) -> None:
    """Write ``obj`` (numpy arrays / containers / scalars) as a torch
    zip-format ``.pt`` that real torch.load opens — WITHOUT torch. The
    inverse of load_pt; tensors are written as their numpy dtypes."""
    em = _PickleEmitter()
    em.emit(obj)
    data_pkl = em.finish()
    with zipfile.ZipFile(os.fspath(path), "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", data_pkl)
        zf.writestr("archive/byteorder", "little")
        for key, raw in em.storages:
            zf.writestr(f"archive/data/{key}", raw)
        zf.writestr("archive/version", "3\n")

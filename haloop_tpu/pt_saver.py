"""Torch ``.pt`` (zip-serialization) EXPORT without a hard torch
dependency — the write-side counterpart of pt_loader.py.

Emits the exact layout ``torch.save`` produces: a zip archive holding
``archive/data.pkl`` (a protocol-2 pickle whose tensors are
``persistent_id`` references), one raw little-endian blob per storage
under ``archive/data/{key}``, and ``archive/version``. The pickle
references ``torch._utils._rebuild_tensor_v2`` and the
``torch.*Storage`` classes by name; when torch is importable (test
hosts) the real objects are used, otherwise stub modules are installed
in ``sys.modules`` for the duration of the dump so the standard
pickler can emit the same global references on torch-free TPU hosts.

The output loads with ``torch.load(weights_only=True)`` (only tensor
rebuilds, OrderedDict, and primitives are emitted) and round-trips
through our own ``pt_loader.load_pt``. Tensors that share one numpy
array share one storage, so weight tying (reference GPT
ha/attention.py:203) survives export.
"""

import collections
import io
import pickle
import sys
import types
import zipfile
from pathlib import Path

import numpy as np

_STORAGE_NAMES = {
    "float32": "FloatStorage",
    "float64": "DoubleStorage",
    "float16": "HalfStorage",
    "bfloat16": "BFloat16Storage",
    "int64": "LongStorage",
    "int32": "IntStorage",
    "int16": "ShortStorage",
    "int8": "CharStorage",
    "uint8": "ByteStorage",
    "bool": "BoolStorage",
}


def _lookup(module, name):
    """Resolve ``module.name`` against real torch if importable, else
    install a picklable stub with the right __module__/__qualname__."""
    try:
        __import__(module)
        if not getattr(sys.modules[module], "__haloop_stub__", False):
            return getattr(sys.modules[module], name)
    except ImportError:
        pass
    mod = sys.modules.get(module)
    if mod is None or not getattr(mod, "__haloop_stub__", False):
        mod = types.ModuleType(module)
        mod.__haloop_stub__ = True
        sys.modules[module] = mod
        parent, _, child = module.rpartition(".")
        if parent:
            _lookup(parent, child)  # ensure parent stub exists
            setattr(sys.modules[parent], child, mod)
    obj = getattr(mod, name, None)
    if obj is None:
        if name[:1] == "_" or name[:1].islower():
            def obj(*a, **k):  # function stub (never called on export)
                raise RuntimeError(f"{module}.{name} stub called")
        else:
            obj = type(name, (), {})
        obj.__module__ = module
        obj.__qualname__ = obj.__name__ = name
        setattr(mod, name, obj)
    return obj


def _cleanup_stubs():
    for m in [m for m, v in sys.modules.items()
              if getattr(v, "__haloop_stub__", False)]:
        del sys.modules[m]


class _TensorOut:
    """Pickles as torch._utils._rebuild_tensor_v2(storage, ...)."""

    def __init__(self, arr, key):
        self.arr = np.ascontiguousarray(arr)
        self.key = key

    def __reduce__(self):
        strides = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (_lookup("torch._utils", "_rebuild_tensor_v2"),
                (_StorageRef(self), 0, self.arr.shape, strides, False,
                 collections.OrderedDict()))


class _StorageRef:
    def __init__(self, tensor):
        self.tensor = tensor


class _Pickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageRef):
            t = obj.tensor
            name = _STORAGE_NAMES[str(t.arr.dtype)]
            return ("storage", _lookup("torch", name), t.key, "cpu",
                    int(t.arr.size))
        return None


def _is_array(x):
    if not (hasattr(x, "shape") and hasattr(x, "dtype")):
        return False
    if str(x.dtype) in _STORAGE_NAMES:
        return True
    # an array dtype torch has no storage class for (uint32 PRNG keys,
    # complex, ...) would silently fall through to a raw numpy pickle,
    # breaking the torch.load(weights_only=True) contract only at LOAD
    # time — fail at save time instead
    raise TypeError(
        f"cannot write dtype {x.dtype} into a torch .pt archive; "
        f"convert to one of {sorted(_STORAGE_NAMES)} first")


def _convert(obj, storages, by_id):
    """Replace arrays with _TensorOut stubs; identical array objects
    share one storage key (weight tying)."""
    if isinstance(obj, np.generic):     # 0-d numpy scalar, not a tensor
        return obj.item()
    if _is_array(obj):
        key = by_id.get(id(obj))
        if key is None:
            key = str(len(storages))
            t = _TensorOut(np.asarray(obj), key)
            storages[key] = t
            by_id[id(obj)] = key
            return t
        return storages[key]
    if isinstance(obj, collections.OrderedDict):
        return collections.OrderedDict(
            (k, _convert(v, storages, by_id)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _convert(v, storages, by_id) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_convert(v, storages, by_id) for v in obj)
    return obj


def save_pt(path, obj, prefix="archive"):
    """Write ``obj`` (a pytree of numpy/jax arrays, dicts, lists, and
    primitives) as a torch-zip checkpoint loadable by ``torch.load``
    (weights_only-safe) and by ``pt_loader.load_pt``."""
    storages, by_id = {}, {}
    obj = _convert(obj, storages, by_id)
    try:
        buf = io.BytesIO()
        _Pickler(buf, protocol=2).dump(obj)
    finally:
        _cleanup_stubs()
    path = Path(path)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{prefix}/data.pkl", buf.getvalue())
        zf.writestr(f"{prefix}/byteorder", "little")
        for key, t in storages.items():
            zf.writestr(f"{prefix}/data/{key}", t.arr.tobytes())
        zf.writestr(f"{prefix}/version", "3\n")
    return path

"""Reference ``.pt`` (torch zip-serialization) ingestion without a hard
torch dependency.

Torch checkpoints are zip archives holding a pickle whose tensors are
``persistent_id`` references into per-storage binary blobs. We decode
them with a custom Unpickler that materializes numpy arrays — no torch
import needed on TPU hosts (torch-cpu, when present, is only used by
tests as an oracle). Handles the reference quirks from SURVEY.md §5.4:
``_orig_mod.`` compile prefixes and GPT weight-name remapping are
applied by ``state_dict_to_*`` helpers in init.py.
"""

import pickle
import zipfile
from pathlib import Path

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,     # handled specially (numpy has no bf16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, data, dtype_name):
        self.data = data
        self.dtype_name = dtype_name


class _TensorStub:
    """Minimal stand-in for torch.Tensor rebuilt by _rebuild_tensor_v2."""

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def to_numpy(self):
        dt = _DTYPES[self.storage.dtype_name]
        if dt is None:  # bfloat16: upcast via uint16 bit fiddling
            raw = np.frombuffer(self.storage.data, dtype=np.uint16)
            arr32 = (raw.astype(np.uint32) << 16).view(np.float32)
            base, itemsize = arr32, 1
        else:
            base = np.frombuffer(self.storage.data, dtype=dt)
        if not self.size:
            return base[self.offset:self.offset + 1].reshape(())[()]
        strides = tuple(s * base.itemsize for s in self.stride)
        return np.lib.stride_tricks.as_strided(
            base[self.offset:], shape=tuple(self.size), strides=strides).copy()


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad,
                       backward_hooks, *extra):
    return _TensorStub(storage, offset, size, stride)


def _rebuild_parameter(tensor, requires_grad, backward_hooks):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf, prefix):
        super().__init__(file)
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if name.endswith("Storage"):
            return name                      # marker string
        if (module, name) == ("collections", "OrderedDict"):
            import collections
            return collections.OrderedDict
        if module.startswith("torch"):
            # argparse.Namespace / dataclass configs pickled inside ckpts
            return lambda *a, **k: {"__class__": f"{module}.{name}",
                                    "args": a, "kwargs": k}
        return super().find_class(module, name)

    def persistent_load(self, pid):
        typename, storage_type, key, location, numel = pid[:5]
        assert typename == "storage"
        name = storage_type if isinstance(storage_type, str) else \
            storage_type.__name__
        data = self.zf.read(f"{self.prefix}/data/{key}")
        return _Storage(data, name)


def _tensors_to_numpy(obj):
    if isinstance(obj, _TensorStub):
        return obj.to_numpy()
    if isinstance(obj, dict):
        return {k: _tensors_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_tensors_to_numpy(v) for v in obj)
    return obj


def load_pt(path):
    """Load a torch-serialized checkpoint into numpy pytrees."""
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl[:-len("/data.pkl")]
        with zf.open(pkl) as f:
            obj = _Unpickler(f, zf, prefix).load()
    return _tensors_to_numpy(obj)

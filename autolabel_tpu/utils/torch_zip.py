"""Torch-free reader for torch.save zip checkpoints.

The reference ecosystem ships model state as `torch.save` archives
(autolabel/model_utils.py:9-18 loads nerf/ workspace checkpoints;
torch-ngp's Trainer writes them). TPU hosts running this framework have
no torch, so this module parses the format directly:

  - a `.pth`/`.ckpt` file is a zip archive holding `<root>/data.pkl`
    (a pickle of the object graph where every tensor is a
    `torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)`
    call with the storage payload replaced by a pickle persistent id
    `('storage', StorageType, key, location, numel)`) plus one raw
    little-endian buffer per storage under `<root>/data/<key>`;
  - the legacy (pre-zip) format is a plain pickle stream with the same
    rebuild calls, followed by the storage payloads — also handled.

Unpickling is restricted (weights_only semantics): only the rebuild
helpers, container types, and storage classes named below are allowed;
anything else raises. Tensors come back as numpy arrays (bfloat16 via
ml_dtypes, which jax always ships).
"""
import collections
import io
import pickle
import struct
import zipfile

import numpy as np

_STORAGE_DTYPES = {
    'FloatStorage': np.dtype('<f4'),
    'DoubleStorage': np.dtype('<f8'),
    'HalfStorage': np.dtype('<f2'),
    'LongStorage': np.dtype('<i8'),
    'IntStorage': np.dtype('<i4'),
    'ShortStorage': np.dtype('<i2'),
    'CharStorage': np.dtype('<i1'),
    'ByteStorage': np.dtype('<u1'),
    'BoolStorage': np.dtype('?'),
}


def _bfloat16_dtype():
    import ml_dtypes
    return np.dtype(ml_dtypes.bfloat16)


class _StorageType:
    def __init__(self, name):
        self.name = name

    @property
    def dtype(self):
        if self.name == 'BFloat16Storage':
            return _bfloat16_dtype()
        try:
            return _STORAGE_DTYPES[self.name]
        except KeyError:
            raise pickle.UnpicklingError(
                f'unsupported torch storage type {self.name}')


class _Deferred:
    """Tensor whose storage bytes arrive after the pickle stream (legacy
    format): holds the rebuild args until materialization."""

    def __init__(self, holder, offset, size, stride):
        self.holder = holder
        self.offset = offset
        self.size = size
        self.stride = stride

    def materialize(self):
        return _build_array(self.holder[0], self.holder[1], self.offset,
                            self.size, self.stride)


def _build_array(dtype, buf, storage_offset, size, stride):
    flat = np.frombuffer(buf, dtype=dtype)
    if not size:
        return flat[storage_offset].copy()
    strides = tuple(s * dtype.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:], shape=tuple(size), strides=strides)
    return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    dtype, buf = storage
    if buf is None:
        return _Deferred(storage, storage_offset, size, stride)
    return _build_array(dtype, buf, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


_ALLOWED = {
    ('torch._utils', '_rebuild_tensor_v2'): _rebuild_tensor_v2,
    ('torch._utils', '_rebuild_parameter'): _rebuild_parameter,
    ('collections', 'OrderedDict'): collections.OrderedDict,
    ('torch', 'Size'): tuple,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module, name):
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        if module == 'torch' and name.endswith('Storage'):
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f'{module}.{name} is not allowed in a weights-only torch '
            'checkpoint read')

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == 'storage'):
            raise pickle.UnpicklingError(f'unknown persistent id {pid!r}')
        # zip: ('storage', type, key, location, numel)
        # legacy: ('storage', type, root_key, location, numel, view_meta)
        storage_type, key, _location, numel = pid[1:5]
        if len(pid) > 5 and pid[5]:
            raise pickle.UnpicklingError(
                'legacy torch checkpoints with storage view metadata are '
                'not supported')
        return self._load_storage(storage_type.dtype, str(key), int(numel))


def _read_zip(path):
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith('/data.pkl'))
        root = pkl[:-len('data.pkl')]

        def load_storage(dtype, key, numel):
            data = zf.read(f'{root}data/{key}')
            return dtype, data[:numel * dtype.itemsize]

        with zf.open(pkl) as f:
            return _Unpickler(io.BytesIO(f.read()), load_storage).load()


def _read_legacy(path):
    """Pre-zip torch.save: magic/protocol/sys-info pickles, the object
    graph, the storage-key order, then each storage as
    <int64 numel><raw bytes>."""
    with open(path, 'rb') as f:
        magic = pickle.load(f)
        if magic != 0x1950a86a20f9469cfc6c:
            raise ValueError(f'{path}: not a legacy torch checkpoint')
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        pending = {}

        def load_storage(dtype, key, numel):
            return pending.setdefault(key, [dtype, None])

        result = _Unpickler(f, load_storage).load()
        keys = pickle.load(f)
        for key in keys:
            numel, = struct.unpack('<q', f.read(8))
            dtype = pending[str(key)][0]
            pending[str(key)][1] = f.read(numel * dtype.itemsize)
        return _materialize(result)


def _materialize(obj):
    if isinstance(obj, _Deferred):
        return obj.materialize()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def load_torch_file(path):
    """torch.load(map_location='cpu'), without torch: returns the
    checkpoint object graph with every tensor as a numpy array."""
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    return _read_legacy(path)

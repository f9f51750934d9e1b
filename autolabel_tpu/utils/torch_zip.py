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


# -- writer ---------------------------------------------------------------------

_DTYPE_STORAGES = {np.dtype(k): v for k, v in {
    'float32': 'FloatStorage',
    'float64': 'DoubleStorage',
    'float16': 'HalfStorage',
    'int64': 'LongStorage',
    'int32': 'IntStorage',
    'int16': 'ShortStorage',
    'int8': 'CharStorage',
    'uint8': 'ByteStorage',
    'bool': 'BoolStorage',
}.items()}


class _PickleWriter:
    """Hand-rolled protocol-2 pickler emitting exactly the object graph
    torch.save produces (GLOBAL torch._utils._rebuild_tensor_v2 calls
    over persistent-id storages), so torch.load — including its
    weights_only unpickler — reads the result as native tensors. No
    torch needed on the writing host."""

    def __init__(self):
        self.out = io.BytesIO()
        self.out.write(b'\x80\x02')  # PROTO 2
        self.storages = []  # (key, raw little-endian bytes)

    def dumps(self, obj):
        self._save(obj)
        self.out.write(b'.')  # STOP
        return self.out.getvalue()

    def _global(self, module, name):
        self.out.write(b'c' + module.encode('ascii') + b'\n'
                       + name.encode('ascii') + b'\n')

    def _save(self, obj):
        w = self.out.write
        if obj is None:
            w(b'N')
        elif obj is True:
            w(b'\x88')
        elif obj is False:
            w(b'\x89')
        elif isinstance(obj, (np.ndarray, np.generic)):
            self._save_tensor(np.asarray(obj))
        elif isinstance(obj, int):
            if 0 <= obj < 256:
                w(b'K' + struct.pack('<B', obj))
            elif -2 ** 31 <= obj < 2 ** 31:
                w(b'J' + struct.pack('<i', obj))
            else:
                enc = pickle.encode_long(obj)
                w(b'\x8a' + struct.pack('<B', len(enc)) + enc)
        elif isinstance(obj, float):
            w(b'G' + struct.pack('>d', obj))
        elif isinstance(obj, str):
            data = obj.encode('utf-8')
            w(b'X' + struct.pack('<I', len(data)) + data)
        elif isinstance(obj, collections.OrderedDict):
            self._global('collections', 'OrderedDict')
            w(b')R')  # empty-args REDUCE
            w(b'(')
            for k, v in obj.items():
                self._save(k)
                self._save(v)
            w(b'u')  # SETITEMS
        elif isinstance(obj, dict):
            w(b'}(')
            for k, v in obj.items():
                self._save(k)
                self._save(v)
            w(b'u')
        elif isinstance(obj, (list,)):
            w(b'](')
            for v in obj:
                self._save(v)
            w(b'e')  # APPENDS
        elif isinstance(obj, tuple):
            w(b'(')
            for v in obj:
                self._save(v)
            w(b't')
        else:
            raise TypeError(
                f'cannot write {type(obj).__name__} into a torch '
                'checkpoint (supported: tensors/ndarrays, dicts, lists, '
                'tuples, str/int/float/bool/None)')

    def _save_tensor(self, arr):
        if arr.dtype in _DTYPE_STORAGES:
            storage = _DTYPE_STORAGES[arr.dtype]
        elif arr.dtype == _bfloat16_dtype():
            storage = 'BFloat16Storage'
        else:
            raise TypeError(f'no torch storage for dtype {arr.dtype}')
        arr = np.ascontiguousarray(arr)
        key = str(len(self.storages))
        self.storages.append((key, arr.tobytes()))
        w = self.out.write
        # _rebuild_tensor_v2(storage_pid, 0, size, stride, False, OrderedDict())
        self._global('torch._utils', '_rebuild_tensor_v2')
        w(b'(')
        # persistent id tuple ('storage', torch.XStorage, key, 'cpu', numel)
        w(b'(')
        self._save('storage')
        self._global('torch', storage)
        self._save(key)
        self._save('cpu')
        self._save(int(arr.size))
        w(b'tQ')  # TUPLE, BINPERSID
        self._save(0)
        self._save(tuple(int(s) for s in arr.shape))
        if arr.size and arr.ndim:
            stride = tuple(int(s // arr.itemsize) for s in arr.strides)
        else:
            stride = tuple([1] * arr.ndim)
        self._save(stride)
        self._save(False)
        self._global('collections', 'OrderedDict')
        w(b')R')
        w(b'tR')  # close args tuple, REDUCE


def save_torch_file(obj, path):
    """torch.save, without torch: writes a zip archive torch.load (and
    load_torch_file) reads back with every numpy array as a tensor.
    Inverse of load_torch_file for the supported container types."""
    import os
    writer = _PickleWriter()
    data_pkl = writer.dumps(obj)
    root = os.path.splitext(os.path.basename(path))[0] or 'archive'
    tmp = str(path) + '.tmp'
    with zipfile.ZipFile(tmp, 'w', zipfile.ZIP_STORED) as zf:
        zf.writestr(f'{root}/data.pkl', data_pkl)
        zf.writestr(f'{root}/byteorder', 'little')
        for key, data in writer.storages:
            zf.writestr(f'{root}/data/{key}', data)
        zf.writestr(f'{root}/version', '3\n')
    os.replace(tmp, str(path))

"""Torch-free loader for the official LPIPS weight files.

The reference evaluates LPIPS by downloading two torch checkpoints at
runtime (`/root/reference/utils/lpipsPyTorch/modules/lpips.py`,
`modules/utils.py::get_state_dict`): the torchvision VGG16 backbone
(`vgg16-397923af.pth`) and the richzhang LPIPS v0.1 linear calibration
(`vgg.pth`). This image has no torchvision and no egress, so this module
parses those files with NUMPY ONLY (zipfile + a restricted pickle
unpickler) and converts them to the npz layout `eval/metrics.py::Lpips`
executes. Drop the two untouched upstream files in one directory and pass
it as `weights_path` (or `BAGS_TPU_LPIPS_WEIGHTS`):

    some_dir/
      vgg16-397923af.pth   # torchvision backbone (any vgg16*.pth)
      vgg.pth              # LPIPS v0.1 linear weights

Both torch serialization formats are supported:
  * zip format (torch >= 1.6): archive with `<root>/data.pkl` + raw
    storage files under `<root>/data/<key>`;
  * legacy format (torch < 1.6 — the 2017-era torchvision/LPIPS release
    files): magic + protocol + sys_info pickles, the payload pickle with
    persistent ids, a pickled list of storage keys, then 8-byte-count
    prefixed raw storage blobs.

The unpickler is restricted: only the handful of classes torch state
dicts need (OrderedDict, the storage type tags, `_rebuild_tensor_v2`,
`_rebuild_parameter`) are constructible; anything else raises.
"""

from __future__ import annotations

import collections
import io
import os
import pickle
import struct
import zipfile

import numpy as np

_MAGIC_NUMBER = 0x1950A86A20F9469CFC6C

# torch storage tag -> numpy dtype (bf16 handled specially).
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": np.dtype("<u2"),  # decoded to f32 below
}


class _StorageTag:
    """Stand-in for torch.FloatStorage & co. — records the dtype name."""

    def __init__(self, name: str):
        self.name = name


class _Storage:
    """Mutable holder: the raw bytes may be back-filled after the payload
    pickle (legacy format appends them at the end of the stream)."""

    def __init__(self, key, numel, dtype_name):
        self.key = key
        self.numel = numel
        self.dtype_name = dtype_name
        self.buf = None


class _Deferred:
    """A tensor whose numpy materialization waits for storage bytes."""

    def __init__(self, storage: _Storage, args: tuple):
        self.storage = storage
        self.args = args

    def materialize(self) -> np.ndarray:
        storage_offset, size, stride = self.args[:3]
        dtype = _STORAGE_DTYPES[self.storage.dtype_name]
        arr = np.frombuffer(self.storage.buf, dtype=dtype)
        if self.storage.dtype_name == "BFloat16Storage":
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        if not size:
            return arr[storage_offset].copy()
        itemsize = arr.dtype.itemsize
        view = np.lib.stride_tricks.as_strided(
            arr[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * itemsize for s in stride))
        return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    holder, _ = storage
    return _Deferred(holder, (storage_offset, tuple(size), tuple(stride)))


def _rebuild_parameter(tensor, requires_grad=False, backward_hooks=None):
    return tensor


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler resolving torch pickles to deferred tensors."""

    def __init__(self, file):
        super().__init__(file, encoding="latin1")
        self.storages: dict = {}

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES and module in ("torch", "torch.storage"):
            return _StorageTag(name)
        allowed = {
            ("collections", "OrderedDict"): collections.OrderedDict,
            ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
            ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        }
        try:
            return allowed[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"refusing to unpickle {module}.{name} — not part of a "
                "plain torch state dict")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        # zip: ('storage', tag, key, location, numel)
        # legacy: ('storage', tag, root_key, location, numel, view_metadata)
        tag, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = tag.name if isinstance(tag, _StorageTag) else str(tag)
        if name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        holder = self.storages.setdefault(key, _Storage(key, numel, name))
        return (holder, name)


def _materialize(obj):
    if isinstance(obj, _Deferred):
        return obj.materialize()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _load_zip(path: str) -> dict:
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: no data.pkl — not a torch zip file")
        root = pkl_names[0][: -len("/data.pkl")]
        up = _Unpickler(io.BytesIO(zf.read(pkl_names[0])))
        obj = up.load()
        for key, st in up.storages.items():
            st.buf = zf.read(f"{root}/data/{key}")
    return _materialize(obj)


def _load_legacy(path: str) -> dict:
    with open(path, "rb") as f:
        if pickle.load(f) != _MAGIC_NUMBER:
            raise ValueError(f"{path}: bad legacy-torch magic number")
        pickle.load(f)  # protocol version
        pickle.load(f)  # sys info
        up = _Unpickler(f)
        obj = up.load()
        keys = pickle.load(f)  # storage keys, in stream order
        for key in keys:
            numel, = struct.unpack("<q", f.read(8))
            st = up.storages[key]
            itemsize = _STORAGE_DTYPES[st.dtype_name].itemsize
            st.buf = f.read(numel * itemsize)
    return _materialize(obj)


def load_torch_object(path: str):
    """Load ANY plain torch .pth pickle (nested dicts/lists/tuples of
    tensors and scalars) as numpy-backed Python structures, without torch.
    Supports zip (>=1.6) and legacy formats. Classes beyond what a plain
    checkpoint needs are refused (restricted unpickler)."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    return _load_legacy(path)


def load_torch_pth(path: str) -> dict:
    """Load a torch .pth checkpoint (state dict of tensors) as a flat dict
    of numpy arrays, without torch. Supports zip (>=1.6) and legacy
    formats."""
    obj = load_torch_object(path)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(obj)}")
    return {str(k): v for k, v in obj.items() if isinstance(v, np.ndarray)}


# --------------------------------------------------------------------------
# Backbone structure tables (static — mirror torchvision's vgg16().features
# and alexnet().features, as instantiated by the reference's LPIPS module,
# /root/reference/utils/lpipsPyTorch/modules/networks.py:76-96):
#   VGG16: 13 3x3/s1/p1 convs, 2x2/s2 max-pools, taps at the five ReLUs
#     conv1_2, 2_2, 3_3, 4_3, 5_3 (target_layers [4,9,16,23,30]);
#   AlexNet-OWT: 5 convs (11x11/s4/p2, 5x5/s1/p2, then 3x3/s1/p1), 3x3/s2
#     max-pools after the first two ReLUs, ALL five ReLUs tapped
#     (target_layers [2,5,8,10,12]) — the reference's in-loop DEFAULT
#     (lpipsPyTorch/__init__.py:8).
# --------------------------------------------------------------------------

VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_AFTER_CONV = [1, 3, 6, 9]          # pool before conv i+1
_TAPS = {1: 0, 3: 1, 6: 2, 9: 3, 12: 4}  # conv_i -> lpips layer k

ALEX_CONV_IDX = [0, 3, 6, 8, 10]
ALEX_STRIDES = [4, 1, 1, 1, 1]
ALEX_PADS = [2, 2, 1, 1, 1]
_ALEX_POOL_AFTER_CONV = [0, 1]           # MaxPool(3, 2) after these ReLUs


def convert_state_dicts(backbone_sd: dict, lin_sd: dict,
                        net: str = "vgg") -> dict:
    """(backbone state dict, lpips-linear state dict) -> the npz layout
    `eval/metrics.py::Lpips` consumes. `net` selects the backbone
    structure table ('vgg' = torchvision vgg16, 'alex' = alexnet-owt)."""
    if net == "vgg":
        conv_idx, pools, taps = VGG16_CONV_IDX, _POOL_AFTER_CONV, _TAPS
    elif net == "alex":
        conv_idx = ALEX_CONV_IDX
        pools = _ALEX_POOL_AFTER_CONV
        taps = {i: i for i in range(5)}
    else:
        raise ValueError(f"net must be 'vgg' or 'alex', got {net!r}")
    arrays = {}
    for conv_i, feat_idx in enumerate(conv_idx):
        for suffix, out in (("weight", "w"), ("bias", "b")):
            key = f"features.{feat_idx}.{suffix}"
            if key not in backbone_sd:
                raise KeyError(f"backbone file lacks {key} — not a "
                               f"torchvision {net} checkpoint?")
            arrays[f"conv{conv_i}_{out}"] = np.asarray(
                backbone_sd[key], np.float32)
        if net == "alex":
            # non-default conv geometry is carried in the bundle so the
            # executor stays architecture-agnostic (absent keys mean the
            # VGG defaults: stride 1, SAME padding, 2x2/s2 pools).
            arrays[f"conv{conv_i}_stride"] = np.asarray(ALEX_STRIDES[conv_i])
            arrays[f"conv{conv_i}_pad"] = np.asarray(ALEX_PADS[conv_i])
    for conv_i in pools:
        if net == "alex":
            arrays[f"pool_after_{conv_i}_k"] = np.asarray(3)
            arrays[f"pool_after_{conv_i}_s"] = np.asarray(2)
        else:
            arrays[f"pool_after_{conv_i}"] = np.asarray(1)
    for conv_i, k in taps.items():
        arrays[f"tap_{conv_i}"] = np.asarray(k)
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lin.{k}.model.1.weight",
                    f"{k}.1.weight"):
            if key in lin_sd:
                break
        else:
            raise KeyError(
                f"no linear weight for tap {k} in {sorted(lin_sd)[:6]} — "
                f"not an LPIPS v0.1 {net}.pth?")
        arrays[f"lin{k}_w"] = np.asarray(lin_sd[key],
                                         np.float32).reshape(-1)
    return arrays


def load_official_dir(path: str, net: str = None) -> dict:
    """Resolve a directory holding the two untouched upstream files into
    the npz-layout dict: a torchvision backbone (`vgg16*.pth` or
    `alexnet*.pth`) plus the matching LPIPS v0.1 linear file (`vgg.pth` /
    `alex.pth`). `net` picks the pair when both are present; when None,
    prefers alex (the reference's in-loop default) if its files exist."""
    files = sorted(f for f in os.listdir(path) if f.endswith(".pth"))
    pairs = {
        "alex": (next((f for f in files if f.startswith("alexnet")), None),
                 "alex.pth" if "alex.pth" in files else None),
        "vgg": (next((f for f in files if f.startswith("vgg16")), None),
                next((f for f in files
                      if f == "vgg.pth" or
                      (not f.startswith(("vgg16", "alexnet"))
                       and f != "alex.pth")), None)),
    }
    order = ["alex", "vgg"]
    if net in pairs:
        # preference, not a hard requirement: fall back to the other pair
        # if the preferred one is incomplete
        order.remove(net)
        order.insert(0, net)
    for cand in order:
        backbone, lin = pairs.get(cand, (None, None))
        if backbone and lin:
            return convert_state_dicts(
                load_torch_pth(os.path.join(path, backbone)),
                load_torch_pth(os.path.join(path, lin)), net=cand)
    raise FileNotFoundError(
        f"{path}: need a torchvision backbone (vgg16*.pth / alexnet*.pth) "
        f"plus its LPIPS v0.1 linear file (vgg.pth / alex.pth); "
        f"found {files}" + (f" for net={net}" if net else ""))

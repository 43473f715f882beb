"""Native (C++) dataset cache: writer, ctypes bindings, loader.

``pack_dataset`` converts the reference's 6-pickle layout into a flat
``.seldpak`` container once; :class:`PakReader` then memory-maps it (O(1)
startup vs full-pickle deserialization, reference train.py:226-237) and
gathers shuffled batches in C++ (``seldio_gather_rows``).

The shared library is built on demand with g++ (no pip deps); if the
toolchain is unavailable the reader transparently falls back to a pure-numpy
mmap path with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import pickle
import struct
import subprocess
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"SELDPAK1"
_ALIGN = 64
_SRC = os.path.join(os.path.dirname(__file__), "loader.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libseldio.so")


def build_library(force: bool = False) -> Optional[str]:
    """Compile loader.cc -> libseldio.so; returns the path or None."""
    if os.path.exists(_LIB) and not force:
        if not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


_lib_handle = None


def _load_lib():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    path = build_library()
    if path is None:
        _lib_handle = False
        return False
    lib = ctypes.CDLL(path)
    lib.seldio_open.restype = ctypes.c_void_p
    lib.seldio_open.argtypes = [ctypes.c_char_p]
    lib.seldio_close.argtypes = [ctypes.c_void_p]
    lib.seldio_num_tensors.restype = ctypes.c_int64
    lib.seldio_num_tensors.argtypes = [ctypes.c_void_p]
    lib.seldio_tensor_info.restype = ctypes.c_int
    lib.seldio_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.seldio_tensor_data.restype = ctypes.c_void_p
    lib.seldio_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.seldio_gather_rows.restype = ctypes.c_int
    lib.seldio_gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_void_p,
    ]
    _lib_handle = lib
    return lib


def write_pak(path: str, tensors: Sequence[np.ndarray]) -> None:
    """Write float32 tensors into the .seldpak container format."""
    tensors = [np.ascontiguousarray(t, dtype=np.float32) for t in tensors]
    header = bytearray()
    header += _MAGIC
    header += struct.pack("<q", len(tensors))
    # compute header size first (fixed per-tensor record size)
    record = lambda t: 8 + 8 * t.ndim + 8 * 3
    offset = len(header) + sum(record(t) for t in tensors)
    entries = []
    for t in tensors:
        offset = (offset + _ALIGN - 1) // _ALIGN * _ALIGN
        entries.append(offset)
        offset += t.nbytes
    for t, off in zip(tensors, entries):
        header += struct.pack("<q", t.ndim)
        for d in t.shape:
            header += struct.pack("<q", d)
        header += struct.pack("<qqq", 0, off, t.nbytes)
    with open(path, "wb") as f:
        f.write(header)
        for t, off in zip(tensors, entries):
            f.seek(off)
            f.write(t.tobytes())


def pack_dataset(cfg, out_path: str) -> str:
    """Convert the 6-pickle Task-2 layout into one .seldpak file.

    Tensor order: train_x, train_y, val_x, val_y, test_x, test_y.
    """
    paths = [
        cfg.training_predictors_path, cfg.training_target_path,
        cfg.validation_predictors_path, cfg.validation_target_path,
        cfg.test_predictors_path, cfg.test_target_path,
    ]
    tensors = []
    for p in paths:
        with open(p, "rb") as f:
            tensors.append(np.asarray(pickle.load(f), dtype=np.float32))
    write_pak(out_path, tensors)
    return out_path


class PakReader:
    """mmap-backed reader with native batch gather (numpy fallback)."""

    SPLITS = {"train": (0, 1), "val": (2, 3), "test": (4, 5)}

    def __init__(self, path: str):
        self.path = path
        self._lib = _load_lib()
        self._handle = None
        if self._lib:
            self._handle = self._lib.seldio_open(path.encode())
            if not self._handle:
                self._lib = False
        if not self._lib:
            self._np_tensors = self._read_numpy(path)

    @staticmethod
    def _read_numpy(path: str):
        with open(path, "rb") as f:
            data = f.read(8 + 8)
            assert data[:8] == _MAGIC, "not a seldpak file"
            (n,) = struct.unpack("<q", data[8:])
            tensors = []
            metas = []
            for _ in range(n):
                (ndim,) = struct.unpack("<q", f.read(8))
                shape = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
                dtype, off, nbytes = struct.unpack("<qqq", f.read(24))
                metas.append((shape, off, nbytes))
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        for shape, off, nbytes in metas:
            arr = mm[off : off + nbytes].view(np.float32).reshape(shape)
            tensors.append(arr)
        return tensors

    @property
    def native(self) -> bool:
        return bool(self._lib)

    def num_tensors(self) -> int:
        if self._lib:
            return int(self._lib.seldio_num_tensors(self._handle))
        return len(self._np_tensors)

    def shape(self, idx: int) -> Tuple[int, ...]:
        if self._lib:
            ndim = ctypes.c_int64()
            shape = (ctypes.c_int64 * 8)()
            dtype = ctypes.c_int64()
            rc = self._lib.seldio_tensor_info(
                self._handle, idx, ctypes.byref(ndim), shape, ctypes.byref(dtype)
            )
            assert rc == 0, rc
            return tuple(shape[i] for i in range(ndim.value))
        return tuple(self._np_tensors[idx].shape)

    def tensor(self, idx: int) -> np.ndarray:
        """Zero-copy view of a whole tensor.

        The view is only valid while this reader is open — copy
        (``np.array``) anything that must outlive it."""
        shape = self.shape(idx)
        if self._lib:
            ptr = self._lib.seldio_tensor_data(self._handle, idx)
            n = int(np.prod(shape))
            buf = (ctypes.c_float * n).from_address(ptr)
            return np.frombuffer(buf, dtype=np.float32).reshape(shape)
        return self._np_tensors[idx]

    def gather(self, idx: int, indices: np.ndarray) -> np.ndarray:
        """Batch gather: rows `indices` of tensor `idx` into a fresh buffer."""
        shape = self.shape(idx)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(indices), *shape[1:]), dtype=np.float32)
        if self._lib:
            rc = self._lib.seldio_gather_rows(
                self._handle, idx,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(indices),
                out.ctypes.data_as(ctypes.c_void_p),
            )
            assert rc == 0, f"seldio_gather_rows failed: {rc}"
            return out
        np.take(self._np_tensors[idx], indices, axis=0, out=out)
        return out

    def split(self, name: str) -> Tuple[np.ndarray, np.ndarray]:
        xi, yi = self.SPLITS[name]
        return self.tensor(xi), self.tensor(yi)

    def close(self):
        if self._lib and self._handle:
            self._lib.seldio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

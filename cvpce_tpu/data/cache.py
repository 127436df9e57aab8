"""Record-cache dataset wrapper over the native reader.

First pass decodes + transforms each item once (Python/PIL/cv2) and
appends the fixed-shape arrays to a flat binary cache; afterwards batches
come from the C++ mmap reader (native/record_cache.cpp) — no image
decode, threaded copies, no per-item Python. This replaces the epoch-on-
epoch decode work the reference pays inside torch DataLoader workers.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from os import path
from typing import Callable, Dict, Sequence, Tuple

import numpy as np

_REPO_ROOT = path.dirname(path.dirname(path.dirname(path.abspath(__file__))))
_SRC = path.join(_REPO_ROOT, "native", "record_cache.cpp")
_BUILD_DIR = path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = path.join(_BUILD_DIR, "librecordcache.so")
_HEADER_BYTES = 24

_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not path.exists(_LIB_PATH) or \
            path.getmtime(_LIB_PATH) < path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               "-o", _LIB_PATH, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"record cache build failed: {e}")
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rc_open.restype = ctypes.c_void_p
    lib.rc_open.argtypes = [ctypes.c_char_p]
    lib.rc_num_records.restype = ctypes.c_int64
    lib.rc_num_records.argtypes = [ctypes.c_void_p]
    lib.rc_record_bytes.restype = ctypes.c_int64
    lib.rc_record_bytes.argtypes = [ctypes.c_void_p]
    lib.rc_read_batch.restype = ctypes.c_int32
    lib.rc_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.rc_close.argtypes = [ctypes.c_void_p]
    lib.rc_write_header.restype = ctypes.c_int32
    lib.rc_write_header.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class RecordCache:
    """Fixed-shape record store. Records are dicts of arrays with a
    static spec {name: (shape, dtype)} packed back-to-back."""

    def __init__(self, cache_path: str, spec: Dict[str, Tuple]):
        self.path = cache_path
        self.spec = {k: (tuple(s), np.dtype(d)) for k, (s, d) in spec.items()}
        self._offsets = {}
        off = 0
        for k, (shape, dt) in self.spec.items():
            nbytes = int(np.prod(shape)) * dt.itemsize
            self._offsets[k] = (off, nbytes)
            off += nbytes
        self.record_bytes = off
        self._handle = None

    # -- writing -----------------------------------------------------
    def build(self, dataset, extract: Callable[[int], Dict[str, np.ndarray]],
              verbose: bool = True) -> None:
        n = len(dataset)
        lib = _load_lib()
        with open(self.path, "wb") as f:
            f.write(b"\0" * _HEADER_BYTES)
            for i in range(n):
                rec = extract(i)
                for k, (shape, dt) in self.spec.items():
                    arr = np.ascontiguousarray(rec[k], dtype=dt)
                    assert arr.shape == shape, (k, arr.shape, shape)
                    f.write(arr.tobytes())
                if verbose and i % 200 == 0:
                    print(f"cache {i}/{n}")
        if lib is not None:
            lib.rc_write_header(self.path.encode(), self.record_bytes, n)
        else:  # pure-python fallback header
            with open(self.path, "r+b") as f:
                f.write(struct.pack("<QQQ", 0x43564345435F5243,
                                    self.record_bytes, n))

    # -- reading -----------------------------------------------------
    def open(self) -> None:
        lib = _load_lib()
        if lib is not None:
            self._handle = lib.rc_open(self.path.encode())
            assert self._handle, f"cannot open cache {self.path}"
            self._n = int(lib.rc_num_records(self._handle))
            assert int(lib.rc_record_bytes(self._handle)) == \
                self.record_bytes
        else:
            with open(self.path, "rb") as f:
                magic, rb, n = struct.unpack("<QQQ", f.read(_HEADER_BYTES))
            assert rb == self.record_bytes
            self._n = int(n)
            self._mm = np.memmap(self.path, np.uint8, "r",
                                 offset=_HEADER_BYTES)

    def __len__(self) -> int:
        return self._n

    def read_batch(self, indices: Sequence[int],
                   threads: int = 8) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices, np.int64)
        out = np.empty(len(idx) * self.record_bytes, np.uint8)
        lib = _load_lib()
        if lib is not None and self._handle:
            rc = lib.rc_read_batch(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                threads)
            assert rc == 0, f"rc_read_batch failed: {rc}"
        else:
            for k, i in enumerate(idx):
                start = i * self.record_bytes
                out[k * self.record_bytes:(k + 1) * self.record_bytes] = \
                    self._mm[start:start + self.record_bytes]
        batch = {}
        recs = out.reshape(len(idx), self.record_bytes)
        for k, (shape, dt) in self.spec.items():
            off, nbytes = self._offsets[k]
            flat = recs[:, off:off + nbytes].copy()
            batch[k] = flat.view(dt).reshape((len(idx), *shape))
        return batch

    def close(self) -> None:
        lib = _load_lib()
        if lib is not None and self._handle:
            lib.rc_close(self._handle)
            self._handle = None


class CachedDetectionDataset:
    """SKU110K-style detection dataset served from a record cache.

    Build once from any dataset yielding canvas items (data/sku110k.py
    item dicts); then __getitem__ is a pure cache read. Augmentation note:
    caching freezes the hflip draw — cache the unflipped canvas and flip
    on device for training if exact reference augmentation is needed.
    """

    def __init__(self, base, cache_path: str, box_bucket: int = 768,
                 rebuild: bool = False, verbose: bool = True):
        item = base[0]
        h, w, c = item["image"].shape
        self.box_bucket = box_bucket
        spec = {
            "image": ((h, w, c), np.float32),
            "boxes": ((box_bucket, 4), np.float32),
            "box_valid": ((box_bucket,), np.bool_),
            "image_size": ((2,), np.int32),
            "scale": ((1,), np.float32),
        }
        self.cache = RecordCache(cache_path, spec)
        if rebuild or not path.exists(cache_path):
            from .sku110k import pad_boxes

            def extract(i):
                it = base[i]
                boxes, valid = pad_boxes(it["boxes"], box_bucket)
                return {
                    "image": it["image"],
                    "boxes": boxes[:box_bucket],
                    "box_valid": valid[:box_bucket],
                    "image_size": it["image_size"],
                    "scale": np.full((1,), it["scale"], np.float32),
                }

            self.cache.build(base, extract, verbose=verbose)
        self.cache.open()

    def __len__(self):
        return len(self.cache)

    def read_batch(self, indices, threads: int = 8) -> Dict[str, np.ndarray]:
        b = self.cache.read_batch(indices, threads=threads)
        return {
            "images": b["image"],
            "boxes": b["boxes"],
            "box_valid": b["box_valid"],
            "image_sizes": b["image_size"],
        }

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        b = self.read_batch([i])
        return {k: v[0] for k, v in b.items()}

"""Native record cache: convert-once HDF5 -> flat binary, mmap'd multithreaded
gather from C++ (native/record_cache.cpp, bound via ctypes).

The lazy families (LEMURS, CaloHadronic) read shuffled event batches from
multi-file HDF5 every step; h5py serializes those reads behind the GIL. This
cache flattens each event into one fixed-size float32 record; the C++ side
mmaps the file and gathers arbitrary index sets with a thread pool while the
GIL is released, so batch assembly runs at page-cache speed and fully overlaps
with device compute (the train loop's prefetch thread).

Fields are stored in SORTED key order (normalize_spec canonicalizes), so the
on-disk layout never depends on dict insertion order.

Usage:
    spec = {"showers": (4, 3, 5), "incident_energy": (1,), ...}
    build_cache(path, iter_of_field_dicts, spec)         # one-time
    cache = NativeRecordCache(path, spec)
    batch = cache.gather(indices)                        # dict of np arrays
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from pathlib import Path

import numpy as np

from vit4hep_tpu.utils.logger import LOGGER

_MAGIC = 0x56344845503
_VERSION = 2  # v2: fields in sorted key order
_HEADER = struct.Struct("<QQQQ")

_SRC = Path(__file__).resolve().parents[2] / "native" / "record_cache.cpp"
_LIB_PATH = _SRC.with_name("librecord_cache.so")
_lib = None


def _load_lib():
    """Compile (once) and load the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(_LIB_PATH), str(_SRC), "-lpthread",
        ]
        LOGGER.info(f"Building native record cache: {' '.join(cmd)}")
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError as e:
            LOGGER.error(
                "native cache build failed:\n%s", e.stderr.decode(errors="replace")
            )
            raise
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cache_open.restype = ctypes.c_void_p
    lib.cache_open.argtypes = [ctypes.c_char_p]
    lib.cache_close.argtypes = [ctypes.c_void_p]
    lib.cache_num_records.restype = ctypes.c_int64
    lib.cache_num_records.argtypes = [ctypes.c_void_p]
    lib.cache_record_size.restype = ctypes.c_int64
    lib.cache_record_size.argtypes = [ctypes.c_void_p]
    lib.cache_gather.restype = ctypes.c_int
    lib.cache_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


def normalize_spec(spec: dict) -> dict:
    """Normalize a spec to {field: shape-tuple}. Accepts plain shapes
    (``{"showers": (30, 30, 48)}``, scalars as ``()`` or ``(1,)``) and the
    easy-to-write ``(shape, dtype)`` pairs (dtype must be float32 — the
    cache stores flat f32 records)."""
    out = {}
    for key, val in spec.items():
        if (isinstance(val, tuple) and len(val) == 2
                and isinstance(val[0], (tuple, list))):
            shape, dtype = val
            if np.dtype(dtype) != np.float32:
                raise ValueError(
                    f"native cache field '{key}': only float32 is supported, got {dtype}"
                )
            val = shape
        try:
            out[key] = tuple(int(s) for s in val)
        except (TypeError, ValueError):
            raise ValueError(
                f"native cache spec for '{key}' must be a shape tuple "
                f"(or (shape, float32)), got {val!r}"
            ) from None
    # canonical field order: the file format stores no field names, so build
    # and read must agree independently of dict insertion order
    return {k: out[k] for k in sorted(out)}


def record_size_of(spec: dict) -> int:
    """Bytes per record for a {field: shape} spec (float32 fields)."""
    return 4 * sum(int(np.prod(shape)) for shape in normalize_spec(spec).values())


def build_cache(path, batches, spec: dict):
    """Write a cache file from an iterable of {field: (N, *shape)} dicts.

    Fields are flattened and concatenated per record in ``spec`` key order.
    """
    path = Path(path)
    spec = normalize_spec(spec)
    rec_size = record_size_of(spec)
    n_total = 0
    with open(path, "wb") as f:
        f.write(_HEADER.pack(_MAGIC, _VERSION, 0, rec_size))
        for batch in batches:
            n = len(next(iter(batch.values())))
            cols = []
            for k, shape in spec.items():
                arr = np.asarray(batch[k], np.float32).reshape(n, -1)
                want = int(np.prod(shape))
                if arr.shape[1] != want:
                    raise ValueError(
                        f"native cache field '{k}': batch has {arr.shape[1]} "
                        f"elements per record, spec says {want}"
                    )
                cols.append(arr)
            flat = np.concatenate(cols, axis=1)
            f.write(np.ascontiguousarray(flat).tobytes())
            n_total += n
        f.seek(0)
        f.write(_HEADER.pack(_MAGIC, _VERSION, n_total, rec_size))
    LOGGER.info(f"Wrote native cache {path}: {n_total} records x {rec_size} B")
    return path


class NativeRecordCache:
    """mmap'd record file with a GIL-free multithreaded gather."""

    def __init__(self, path, spec: dict, n_threads: int | None = None):
        self.spec = normalize_spec(spec)
        self.lib = _load_lib()
        self.handle = self.lib.cache_open(str(path).encode())
        if not self.handle:
            raise OSError(f"cannot open record cache {path}")
        self.n_records = int(self.lib.cache_num_records(self.handle))
        self.record_size = int(self.lib.cache_record_size(self.handle))
        expected = record_size_of(self.spec)
        if self.record_size != expected:
            raise ValueError(
                f"cache record size {self.record_size} != spec {expected}"
            )
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)

    def __len__(self):
        return self.n_records

    def gather(self, indices) -> dict:
        """Gather records -> {field: (n, *shape) float32} in spec order."""
        if not self.handle:
            raise ValueError("record cache is closed")
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        out = np.empty(n * self.record_size // 4, np.float32)
        rc = self.lib.cache_gather(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            out.ctypes.data_as(ctypes.c_char_p),
            self.n_threads,
        )
        if rc != 0:
            raise IndexError("record index out of range")
        out = out.reshape(n, self.record_size // 4)
        result, start = {}, 0
        for key, shape in self.spec.items():
            size = int(np.prod(shape))
            result[key] = out[:, start : start + size].reshape(n, *shape)
            start += size
        return result

    def close(self):
        if self.handle:
            self.lib.cache_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter shutdown
            pass

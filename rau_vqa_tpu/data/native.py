"""ctypes binding for the native (C++) feature-loader core.

``NativePackedFeatureStore`` is a drop-in ``FeatureSource`` over the same
packed shard layout as the Python ``PackedFeatureStore``, but the batch
gather runs in the C++ worker pool (native/feature_loader.cpp) — the role
torch-threads + torch .t7 deserialization play in the reference
(vqa_prepro_loader.lua:66-80, 931-958).

The shared library auto-builds on first use (``make -C native``); when the
toolchain is unavailable the caller should fall back to the Python store.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from rau_vqa_tpu.data.features import FeatureSource

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfeature_loader.so")
_lib = None

import threading

_load_lock = threading.Lock()   # one builder: concurrent `make` runs would
                                # rewrite the .so under a CDLL mmap


class NativeUnavailable(RuntimeError):
    """The native library cannot be built/loaded on this host (no
    toolchain, missing shared deps).  Callers fall back to pure Python —
    and should REMEMBER the failure rather than re-running `make` per
    batch."""


_lib_error: "Exception | None" = None


def _build_error_message(e: Exception) -> str:
    """Build-failure message INCLUDING the captured compiler output —
    ``subprocess.run(capture_output=True)`` means ``str(CalledProcessError)``
    alone carries no diagnostics."""
    msg = str(e)
    stderr = getattr(e, "stderr", None)
    if stderr:
        if isinstance(stderr, bytes):
            stderr = stderr.decode("utf-8", "replace")
        msg = f"{msg}\n--- make stderr ---\n{stderr.strip()}"
    return msg


def load_library(build: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native loader library.  Raises
    :class:`NativeUnavailable` — and keeps raising it WITHOUT re-running
    `make` — when this host cannot build/load it (same contract as
    :func:`load_image_library`)."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    with _load_lock:
        if _lib is not None:
            return _lib
        if _lib_error is not None:
            raise NativeUnavailable(str(_lib_error))
        try:
            src = os.path.join(_NATIVE_DIR, "feature_loader.cpp")
            needs_build = (not os.path.exists(_LIB_PATH)
                           or (os.path.exists(src)
                               and os.path.getmtime(src)
                               > os.path.getmtime(_LIB_PATH)))
            if needs_build and build:
                # target ONLY this library: the default `all` also builds
                # libimage_decode.so, whose missing libjpeg/libpng dev deps
                # would otherwise permanently disable THIS loader too
                subprocess.run(["make", "-C", _NATIVE_DIR,
                                os.path.basename(_LIB_PATH)], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as e:  # noqa: BLE001 — toolchain/deps absent
            msg = _build_error_message(e)
            _lib_error = RuntimeError(msg)
            raise NativeUnavailable(msg) from e
        # prototypes + the global publish stay INSIDE the lock: releasing
        # before `_lib = lib` would let a second thread dlopen a second
        # CDLL and configure prototypes concurrently (load_image_library
        # already follows this discipline)
        lib.fl_open.restype = ctypes.c_void_p
        lib.fl_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                ctypes.c_uint64, ctypes.c_uint64]
        lib.fl_close.argtypes = [ctypes.c_void_p]
        lib.fl_gather.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_uint64, ctypes.c_char_p]
        lib.fl_ring_create.restype = ctypes.c_void_p
        lib.fl_ring_create.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                       ctypes.c_uint64, ctypes.c_int]
        lib.fl_ring_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.c_uint64]
        lib.fl_ring_wait.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.fl_ring_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fl_ring_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _npy_data_layout(path: str):
    """(data_offset, shape, dtype) of a .npy file — public numpy.lib.format
    API only (the private _read_array_header can move between releases)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        elif version == (2, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        else:
            raise ValueError(f"{path}: unsupported .npy format version "
                             f"{version}")
        if fortran:
            raise ValueError(f"{path}: fortran-order npy not supported")
        return f.tell(), shape, dtype


class NativePackedFeatureStore(FeatureSource):
    """Packed shard reader with native multi-threaded gather + prefetch ring."""

    def __init__(self, shard_dir: str, *, n_threads: int = 4,
                 ring_slots: int = 3, batch_rows: Optional[int] = None):
        self.lib = load_library()
        with open(os.path.join(shard_dir, "index.json")) as f:
            meta = json.load(f)
        self.index = meta["index"]
        self.dim = int(meta["dim"])
        self.spat = int(meta["spat"])
        self.dtype = np.dtype(meta.get("dtype", "float32"))
        path = os.path.join(shard_dir, "features.npy")
        offset, shape, dtype = _npy_data_layout(path)
        if dtype != self.dtype or shape[1:] != (self.spat, self.dim):
            raise ValueError(f"{path}: layout {shape}/{dtype} disagrees with "
                             f"index.json")
        if self.index:
            # the C++ gather trusts row indices (no per-row bounds check on
            # the hot path): a stale index.json pointing past features.npy
            # would read beyond the mmap and SIGSEGV the process
            bad = max(self.index.values())
            if bad >= shape[0] or min(self.index.values()) < 0:
                raise ValueError(
                    f"{shard_dir}: index.json rows span "
                    f"[{min(self.index.values())}, {bad}] but features.npy "
                    f"has {shape[0]} rows — stale/mismatched shard")
        self.scales = None
        scales_path = os.path.join(shard_dir, "scales.npy")
        if os.path.exists(scales_path):
            self.scales = np.load(scales_path)
        self.row_bytes = self.spat * self.dim * self.dtype.itemsize
        self.handle = self.lib.fl_open(path.encode(), offset,
                                       self.row_bytes, shape[0])
        if not self.handle:
            raise OSError(f"fl_open failed for {path}")
        self.n_threads = n_threads
        self._ring = None
        self._ring_rows = 0
        self._ring_slots = ring_slots
        self._seq = 0
        if batch_rows:
            self._ensure_ring(batch_rows)

    def _ensure_ring(self, batch_rows: int) -> None:
        if self._ring is not None and self._ring_rows == batch_rows:
            return
        if self._ring is not None:
            self.lib.fl_ring_destroy(self._ring)
        self._ring = self.lib.fl_ring_create(self.handle, batch_rows,
                                             self._ring_slots, self.n_threads)
        self._ring_rows = batch_rows
        self._seq = 0

    def _rows_for(self, names: Sequence[str]) -> np.ndarray:
        return np.fromiter((self.index[n] for n in names), np.int64,
                           len(names))

    def get_batch(self, names: Sequence[str], datatypes: Sequence[int]
                  ) -> np.ndarray:
        rows = self._rows_for(names)
        self._ensure_ring(len(rows))
        rows_p = rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        seq = self._seq
        self._seq += 1
        self.lib.fl_ring_submit(self._ring, seq, rows_p, len(rows))
        ptr = self.lib.fl_ring_wait(self._ring, seq)
        buf = ctypes.cast(ptr, ctypes.POINTER(
            ctypes.c_uint8 * (len(rows) * self.row_bytes))).contents
        arr = np.frombuffer(buf, dtype=self.dtype).reshape(
            len(rows), self.spat, self.dim)
        # MUST copy: the ring slot is reused after n_slots more batches
        # (np.asarray would alias the slot when dtypes already match)
        out = arr.astype(np.float32, copy=True)
        if self.scales is not None:
            out *= self.scales[rows][:, None, None]
        return out

    def close(self) -> None:
        if self._ring is not None:
            self.lib.fl_ring_destroy(self._ring)
            self._ring = None
        if self.handle:
            self.lib.fl_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

# ---------------------------------------------------------------------------
# Native image decode (the torch-image role, vqa_prepro_loader.lua:1045-1068)
# ---------------------------------------------------------------------------

_IMG_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_decode.so")
_img_lib = None
_img_lib_error: "Exception | None" = None


def load_image_library(build: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native image decode library.  Raises
    :class:`NativeUnavailable` — and keeps raising it WITHOUT re-running
    `make` — when this host cannot build/load it."""
    global _img_lib, _img_lib_error
    if _img_lib is not None:
        return _img_lib
    with _load_lock:
        if _img_lib is not None:
            return _img_lib
        if _img_lib_error is not None:
            raise NativeUnavailable(str(_img_lib_error))
        try:
            src = os.path.join(_NATIVE_DIR, "image_decode.cpp")
            needs_build = (not os.path.exists(_IMG_LIB_PATH)
                           or (os.path.exists(src) and os.path.getmtime(src)
                               > os.path.getmtime(_IMG_LIB_PATH)))
            if needs_build and build:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libimage_decode.so"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_IMG_LIB_PATH)
        except Exception as e:  # noqa: BLE001 — toolchain/deps absent
            msg = _build_error_message(e)
            _img_lib_error = RuntimeError(msg)
            raise NativeUnavailable(msg) from e
        lib.id_decode_batch.restype = ctypes.c_int64
        lib.id_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8)]
        _img_lib = lib
        return lib


def decode_image_batch_status(paths: Sequence[str], size: int, *,
                              n_threads: int = 8):
    """JPEG/PNG paths -> (uint8 [N, size, size, 3], ok [N] bool) via the
    C++ pool: decode + fused Catmull-Rom shorter-side resize + center crop
    (the same sampling kernel as ops/transforms._cubic_sample, so host and
    device resizes share one semantics).  Successes keep their pixels even
    when other items fail — callers re-decode only the failures."""
    lib = load_image_library()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.id_decode_batch(
        arr, n, size, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, status.astype(bool)


def decode_image_batch(paths: Sequence[str], size: int, *,
                       n_threads: int = 8) -> np.ndarray:
    """Like :func:`decode_image_batch_status` but raises on the first
    undecodable file."""
    out, ok = decode_image_batch_status(paths, size, n_threads=n_threads)
    if not ok.all():
        bad = int(np.argmin(ok))
        raise OSError(f"native decode failed for {paths[bad]!r}")
    return out


# Concurrency contract: one NativePackedFeatureStore instance serves one
# consumer stream — ring slots are recycled strictly in sequence order
# (submit(seq) may overwrite slot seq % n_slots only after wait(seq -
# n_slots) returned and its copy was taken).  SplitData.batches' single
# prefetch worker and RAUService's lock both satisfy this; for concurrent
# streams, open one store per stream (mmap pages are shared by the OS).

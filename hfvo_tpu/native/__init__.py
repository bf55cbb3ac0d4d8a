"""ctypes bindings for the native C++ sequence loader.

Builds `libhfvo_loader.so` from `loader.cpp` on first use (g++, libpng,
zlib, pthreads) and exposes `NativeSequenceLoader`. Falls back cleanly:
`native_available()` gates usage, and `hfvo_tpu.io.tum.iterate_sequence`
remains the pure-Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "libhfvo_loader.so")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the loader if needed. Returns an error string or None."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-lz", "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:  # toolchain missing
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    _build_error = _build()
    if _build_error:
        return None
    lib = ctypes.CDLL(_SO)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_frame_count.restype = ctypes.c_int
    lib.loader_frame_count.argtypes = [ctypes.c_void_p]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeSequenceLoader:
    """Prefetching RGB-D sequence iterator backed by the C++ worker pool."""

    def __init__(
        self,
        seq_dir: str,
        assoc_path: str,
        depth_factor: float = 5000.0,
        n_workers: int = 3,
        queue_cap: int = 8,
        max_hw: Tuple[int, int] = (480, 640),
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.loader_create(
            seq_dir.encode(), assoc_path.encode(),
            ctypes.c_double(depth_factor), n_workers, queue_cap,
        )
        if not self._h:
            raise RuntimeError(f"failed to open association file {assoc_path}")
        self._hw = max_hw

    def __len__(self) -> int:
        return self._lib.loader_frame_count(self._h)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
        H, W = self._hw
        gray = np.empty((H, W), np.float32)
        depth = np.empty((H, W), np.float32)
        ts = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        while True:
            r = self._lib.loader_next(
                self._h,
                gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(ts), ctypes.byref(w), ctypes.byref(h),
            )
            if r == 0:
                return
            if r < 0:
                continue  # undecodable frame: skip (reference aborts instead)
            hh, ww = h.value, w.value
            yield ts.value, gray[:hh, :ww].copy(), depth[:hh, :ww].copy()

    def close(self) -> None:
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

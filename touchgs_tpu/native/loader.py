"""ctypes bindings for the native data loader (libtouchgs_native.so).

Builds lazily via `make` on first use (no pybind11 in this image — plain
C ABI + ctypes per the environment constraints).  Falls back to PIL decoding
if the toolchain is unavailable, so the Python pipeline never hard-depends on
the native layer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_SO_PATH = _NATIVE_DIR / "build" / "libtouchgs_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "-j2",
                 "build/libtouchgs_native.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        _build_failed = True
        return None
    lib.tgs_loader_create.restype = ctypes.c_void_p
    lib.tgs_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ]
    lib.tgs_loader_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tgs_loader_get.restype = ctypes.c_int
    lib.tgs_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int),
    ]
    lib.tgs_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.tgs_decode_png.restype = ctypes.c_int
    lib.tgs_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _ensure_built() is not None


def decode_png(path: str | os.PathLike, max_pixels: int = 64 << 20) -> np.ndarray:
    """Decode a PNG via the native codec → float32 (H, W, C) normalized
    (8-bit ÷255, 16-bit ÷1000).  PIL fallback when native is unavailable."""
    lib = _ensure_built()
    if lib is None:
        from PIL import Image

        img = np.asarray(Image.open(path))
        if img.dtype == np.uint8:
            out = img.astype(np.float32) / 255.0
        else:
            out = img.astype(np.float32) / 1000.0
        return out if out.ndim == 3 else out[..., None]
    buf = np.empty((max_pixels,), np.float32)
    shape = (ctypes.c_int * 3)()
    n = lib.tgs_decode_png(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, shape,
    )
    if n < 0:
        raise IOError(f"native png decode failed ({n}) for {path}")
    h, w, c = shape[0], shape[1], shape[2]
    return buf[:n].reshape(h, w, c).copy()


class NativeLoader:
    """Threaded prefetching loader over a fixed file list."""

    def __init__(self, paths: Sequence[str | os.PathLike], n_threads: int = 2,
                 max_pixels: int = 64 << 20):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._handle = lib.tgs_loader_create(arr, len(self._paths), n_threads)
        self._buf = np.empty((max_pixels,), np.float32)

    def prefetch(self, idx: int) -> None:
        self._lib.tgs_loader_prefetch(self._handle, idx)

    def get(self, idx: int) -> np.ndarray:
        shape = (ctypes.c_int * 3)()
        n = self._lib.tgs_loader_get(
            self._handle, idx,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._buf.size, shape,
        )
        if n < 0:
            raise IOError(f"native load failed ({n}) for {self._paths[idx]}")
        return self._buf[:n].reshape(shape[0], shape[1], shape[2]).copy()

    def __len__(self) -> int:
        return len(self._paths)

    def close(self) -> None:
        if self._handle:
            self._lib.tgs_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

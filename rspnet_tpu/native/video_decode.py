"""ctypes binding for the C++ FFmpeg decoder (librspnet_video.so).

Builds the shared library on first use if a compiler is available; falls
back cleanly (is_available() -> False) so the OpenCV backend takes over.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librspnet_video.so")
_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        logger.warning("native decoder build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("native decoder load failed: %s", e)
            return None
        lib.vr_open.restype = ctypes.c_void_p
        lib.vr_open.argtypes = [ctypes.c_char_p]
        lib.vr_error.restype = ctypes.c_char_p
        lib.vr_error.argtypes = [ctypes.c_void_p]
        lib.vr_num_frames.restype = ctypes.c_long
        lib.vr_num_frames.argtypes = [ctypes.c_void_p]
        lib.vr_fps.restype = ctypes.c_double
        lib.vr_fps.argtypes = [ctypes.c_void_p]
        lib.vr_width.restype = ctypes.c_int
        lib.vr_width.argtypes = [ctypes.c_void_p]
        lib.vr_height.restype = ctypes.c_int
        lib.vr_height.argtypes = [ctypes.c_void_p]
        lib.vr_get_batch.restype = ctypes.c_int
        lib.vr_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.vr_get_batch_scaled.restype = ctypes.c_int
        lib.vr_get_batch_scaled.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
        lib.vr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class RspVideoReader:
    """decord-contract reader backed by the C++ extension."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder unavailable")
        self._lib = lib
        self._h = lib.vr_open(path.encode())
        if not self._h:
            raise IOError(f"vr_open returned null for {path}")
        err = lib.vr_error(self._h)
        if err:
            msg = err.decode()
            lib.vr_close(self._h)
            self._h = None
            raise IOError(f"Cannot open video {path}: {msg}")
        self.path = path
        self.num_frames = int(lib.vr_num_frames(self._h))
        self.fps = float(lib.vr_fps(self._h))
        self.width = int(lib.vr_width(self._h))
        self.height = int(lib.vr_height(self._h))

    def get_batch(self, indices: Sequence[int],
                  out_wh: Optional[tuple] = None) -> np.ndarray:
        """Decode frames; with ``out_wh=(w, h)`` the sws_scale pass that
        already converts YUV->RGB also resizes (bilinear) — no extra cost,
        and no per-frame host cv2 resize downstream."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(idx)
        if out_wh is None:
            out = np.empty((n, self.height, self.width, 3), np.uint8)
            ret = self._lib.vr_get_batch(
                self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        else:
            w, h = int(out_wh[0]), int(out_wh[1])
            out = np.empty((n, h, w, 3), np.uint8)
            ret = self._lib.vr_get_batch_scaled(
                self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h)
        if ret != 0:
            err = self._lib.vr_error(self._h)
            raise IOError(f"decode failed for {self.path}: "
                          f"{err.decode() if err else 'unknown'}")
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vr_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

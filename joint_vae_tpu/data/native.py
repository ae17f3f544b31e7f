"""ctypes binding for the native C++ batcher (native/batcher.cpp).

Builds the shared library on first use (make, falling back to a direct g++
invocation) and exposes :class:`NativeBatcher`, a drop-in batch source used
by ``DataLoader(use_native=True)``.  Everything degrades gracefully to the
numpy path when no compiler is available.
"""

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libjvtbatcher.so')
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        r = subprocess.run(['make', '-C', _NATIVE_DIR], capture_output=True,
                           text=True, timeout=120)
        if r.returncode == 0:
            return True
        logging.debug('make failed: %s', r.stderr)
        r = subprocess.run(
            ['g++', '-O3', '-std=c++17', '-fPIC', '-shared', '-pthread',
             os.path.join(_NATIVE_DIR, 'batcher.cpp'), '-o', _LIB_PATH],
            capture_output=True, text=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired) as e:
        logging.debug('native build unavailable: %s', e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        _build_failed = True
        logging.info('native batcher unavailable - using the numpy loader')
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.jvt_batcher_create.restype = ctypes.c_void_p
    lib.jvt_batcher_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
    lib.jvt_batcher_create_v2.restype = ctypes.c_void_p
    lib.jvt_batcher_create_v2.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.jvt_batcher_destroy.argtypes = [ctypes.c_void_p]
    lib.jvt_batcher_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                            ctypes.c_int]
    lib.jvt_batcher_get_batch.restype = ctypes.c_int64
    lib.jvt_batcher_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


class NativeBatcher:
    """Owns a native handle over pinned dataset arrays.

    ``data`` may be float32 in [0,1] or uint8 (stored as-is; uint8 quarters
    host RAM for imagenet-scale sets and is scaled by 1/255 during
    assembly).  ``out_shape=(h, w)`` enables fused bilinear resize;
    ``mean``/``std`` (per channel) a fused normalize — both applied in the
    same multithreaded gather pass as shuffle/flip/crop."""

    def __init__(self, data: np.ndarray, labels: np.ndarray, seed: int = 0,
                 hflip: bool = False, crop_pad: int = 0,
                 out_shape: Optional[Tuple[int, int]] = None,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError('native batcher not available')
        self._lib = lib
        self.crop_pad = int(crop_pad)
        # keep references: the native side does not copy
        is_u8 = np.asarray(data).dtype == np.uint8
        self._data = np.ascontiguousarray(data,
                                          np.uint8 if is_u8 else np.float32)
        self._labels = np.ascontiguousarray(labels, np.int32)
        n, c, h, w = self._data.shape
        oh, ow = out_shape if out_shape else (h, w)
        self.shape = (c, oh, ow)
        self.n = n
        self._mean = (np.ascontiguousarray(mean, np.float32)
                      if mean is not None else None)
        self._std = (np.ascontiguousarray(std, np.float32)
                     if std is not None else None)

        def _ptr(a):
            return (a.ctypes.data_as(ctypes.c_void_p) if a is not None
                    else None)

        self._h = lib.jvt_batcher_create_v2(
            self._data.ctypes.data_as(ctypes.c_void_p), int(is_u8),
            self._labels.ctypes.data_as(ctypes.c_void_p),
            n, c, h, w, oh, ow, seed & 0xffffffffffffffff,
            int(bool(hflip)), int(crop_pad), _ptr(self._mean),
            _ptr(self._std))

    def start_epoch(self, epoch: int, shuffle: bool = True):
        self._lib.jvt_batcher_start_epoch(self._h, epoch, int(bool(shuffle)))

    def get_batch(self, index: int, batch_size: int,
                  out_x: Optional[np.ndarray] = None,
                  out_y: Optional[np.ndarray] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
        c, h, w = self.shape
        if out_x is None:
            out_x = np.empty((batch_size, c, h, w), np.float32)
        if out_y is None:
            out_y = np.empty((batch_size,), np.int32)
        bs = self._lib.jvt_batcher_get_batch(
            self._h, index, batch_size,
            out_x.ctypes.data_as(ctypes.c_void_p),
            out_y.ctypes.data_as(ctypes.c_void_p))
        if bs < 0:
            raise IndexError(index)
        return out_x[:bs], out_y[:bs]

    def __del__(self):
        try:
            if getattr(self, '_h', None):
                self._lib.jvt_batcher_destroy(self._h)
        except Exception:
            pass

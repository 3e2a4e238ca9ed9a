"""ctypes bindings for the native host data-pipeline kernels
(native/batch_ops.cpp), JIT-compiled on first use like the reference's
``torch.utils.cpp_extension.load`` (models/modules/op/upfirdn2d.py:10-16),
with a pure-numpy fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "batch_ops.cpp")
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "joligen_tpu")
_SO = os.path.join(_CACHE, "batch_ops.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build():
    os.makedirs(_CACHE, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded library or None (fallback to numpy)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.normalize_u8_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.pack_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64]
            lib.fill_mask_with_random_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
            lib.rasterize_box_mask.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32]
            lib.stack_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64]
            _lib = lib
        except Exception as e:  # no compiler / unwritable cache
            print(f"native batch_ops unavailable ({e}); using numpy fallback")
            _lib = None
    return _lib


def normalize_u8(img_u8):
    """uint8 (…,) -> float32 [-1,1]."""
    lib = get_lib()
    src = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if lib is None:
        return src.astype(np.float32) / 127.5 - 1.0
    dst = np.empty(src.shape, np.float32)
    lib.normalize_u8_to_f32(src.ctypes.data, dst.ctypes.data, src.size)
    return dst


def stack_f32(arrays):
    """Stack same-shape float32 arrays into (B, ...)."""
    lib = get_lib()
    if lib is None:
        return np.stack(arrays)
    arrays = [np.ascontiguousarray(a, np.float32) for a in arrays]
    b = len(arrays)
    numel = arrays[0].size
    dst = np.empty((b,) + arrays[0].shape, np.float32)
    ptrs = (ctypes.c_void_p * b)(*[a.ctypes.data for a in arrays])
    lib.stack_f32(ctypes.cast(ptrs, ctypes.c_void_p), dst.ctypes.data, b,
                  numel)
    return dst


def fill_mask_with_random(img, mask, seed=0):
    """In the masked region, replace pixels with uniform [-1,1] noise."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.float32).copy()
    m = np.ascontiguousarray(np.asarray(mask)[..., 0]
                             if np.asarray(mask).ndim == 3 else mask,
                             np.int32)
    if lib is None:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        noise = rng.uniform(-1, 1, img.shape).astype(np.float32)
        sel = m > 0
        img[sel] = noise[sel]
        return img
    h, w = m.shape
    c = img.shape[-1]
    lib.fill_mask_with_random_f32(img.ctypes.data, m.ctypes.data, h, w, c,
                                  seed)
    return img

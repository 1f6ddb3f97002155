"""ctypes bindings for the native IO library (native/vox_io.cc).

The training feeder's hot path -- seek into an ark, decode an FM/CM matrix
-- runs in C++ with the GIL released; pure-Python kaldi_io remains the
fallback (and the reference implementation for tests).  The library is
built on first use if a compiler is available (`make -C native/`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvox_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vox_read_mat.restype = ctypes.c_int
        lib.vox_read_mat.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_read_vec.restype = ctypes.c_int
        lib.vox_read_vec.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_read_wav.restype = ctypes.c_int
        lib.vox_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.vox_free.restype = None
        lib.vox_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _take(lib, ptr, shape) -> np.ndarray:
    """Copy a malloc'd C buffer into numpy and free it."""
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(shape).copy()
    lib.vox_free(ptr)
    return arr


def read_mat(path: str, offset: int = 0) -> np.ndarray:
    """Binary FM/DM/CM matrix at an ark byte offset -> (rows, cols) float32."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.vox_read_mat(path.encode(), offset,
                          ctypes.byref(out), ctypes.byref(rows),
                          ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"vox_read_mat({path}:{offset}) failed: {rc}")
    return _take(lib, out, (rows.value, cols.value))


def read_vec(path: str, offset: int = 0) -> np.ndarray:
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int32()
    rc = lib.vox_read_vec(path.encode(), offset, ctypes.byref(out),
                          ctypes.byref(n))
    if rc != 0:
        raise IOError(f"vox_read_vec({path}:{offset}) failed: {rc}")
    return _take(lib, out, (n.value,))


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """16-bit PCM wav -> (float32 samples in int16 scale, sample_rate)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.vox_read_wav(path.encode(), ctypes.byref(out), ctypes.byref(n),
                          ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"vox_read_wav({path}) failed: {rc}")
    return _take(lib, out, (n.value,)), sr.value

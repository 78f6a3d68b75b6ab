"""Loader for the native data-plane library (csrc/fastio.cc).

Compiles the C++ source with the system toolchain on first use (cached as a
shared object next to the source) and exposes it via ctypes.  Every caller
must tolerate ``lib() is None`` — environments without a compiler fall back
to the pure-numpy path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SRC = os.path.abspath(os.path.join(_CSRC, "fastio.cc"))
_SO = os.path.abspath(os.path.join(_CSRC, "libgmlfastio.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def lib():
    """Return the loaded ctypes library, building it if needed; None if the
    native path is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib_ = ctypes.CDLL(_SO)
            lib_.gml_collate_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int32,
            ]
            lib_.gml_gather_views_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int32,
            ]
            _lib = lib_
        except Exception as e:  # no compiler / load failure -> numpy fallback
            logger.info("native fastio unavailable (%s); using numpy path", e)
            _lib = None
        return _lib


def gather_views_u8(stack: np.ndarray, view_indices) -> np.ndarray | None:
    """Select rows of a (V, ...) uint8 view stack (csrc gml_gather_views_u8)
    with the GIL released; None when the native path is unavailable."""
    L = lib()
    if L is None or stack.dtype != np.uint8 or stack.ndim < 2 or not stack.flags["C_CONTIGUOUS"]:
        return None
    idx = np.ascontiguousarray(view_indices, np.int32)
    if idx.ndim != 1 or idx.size == 0 or idx.min() < 0 or idx.max() >= stack.shape[0]:
        return None
    view_bytes = stack[0].nbytes
    out = np.empty((idx.size,) + stack.shape[1:], np.uint8)
    ptrs = (ctypes.c_void_p * 1)()
    ptrs[0] = stack.ctypes.data
    L.gml_gather_views_u8(
        ptrs,
        np.int32(1),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(idx.size),
        np.int64(view_bytes),
        out.ctypes.data,
        np.int32(1),
    )
    return out


def collate_u8(samples, batch_size: int) -> np.ndarray | None:
    """Gather equal-shape uint8 sample arrays into a zero-padded
    (batch_size, *shape) batch with the GIL released.  Returns None when the
    native library is unavailable or inputs are unsuitable."""
    L = lib()
    if L is None or not samples:
        return None
    if len(samples) > batch_size:  # native memcpy loop writes len(samples)
        return None  # rows — more than batch_size would overflow `out`
    first = samples[0]
    if first.dtype != np.uint8:
        return None
    sample_bytes = first.nbytes
    out = np.empty((batch_size,) + first.shape, np.uint8)
    ptrs = (ctypes.c_void_p * len(samples))()
    for i, s in enumerate(samples):
        # every sample checked (same dtype+shape+layout): a float sample of
        # equal shape would otherwise memcpy garbage bytes silently
        if s.dtype != np.uint8 or not s.flags["C_CONTIGUOUS"] or s.shape != first.shape:
            return None
        ptrs[i] = s.ctypes.data
    L.gml_collate_u8(
        ptrs,
        np.int32(len(samples)),
        np.int64(sample_bytes),
        out.ctypes.data,
        np.int32(batch_size),
    )
    return out

"""ctypes loader for the native fastgeo library (on-demand g++ build).

The .so is compiled from native/fastgeo.cpp on first use and cached next to
the source (keyed by source mtime). Everything degrades gracefully: if no
compiler is available the callers fall back to the pure-python/numpy paths.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastgeo.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfastgeo.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The fastgeo CDLL, or None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SRC):
            _failed = True
            return None
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.dedup_grid.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.dedup_grid.restype = None
        lib.points_in_ring.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        lib.points_in_ring.restype = None
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dedup_grid_native(x: np.ndarray, y: np.ndarray, conf: np.ndarray,
                      radius: float) -> Optional[np.ndarray]:
    """Native confidence-greedy dedup; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    conf = np.ascontiguousarray(conf, dtype=np.float32)
    keep = np.zeros(len(x), dtype=np.uint8)
    lib.dedup_grid(_ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double),
                   _ptr(conf, ctypes.c_float), len(x), float(radius),
                   _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


# ----------------------------------------------------- fastdecode (libjpeg)

_DEC_SRC = os.path.join(_NATIVE_DIR, "fastdecode.cpp")
_DEC_SO = os.path.join(_NATIVE_DIR, "libfastdecode.so")
_dec_lib: Optional[ctypes.CDLL] = None
_dec_failed = False


def load_decode() -> Optional[ctypes.CDLL]:
    """The fastdecode CDLL (libjpeg-backed), or None if unavailable
    (no compiler / no libjpeg — callers fall back to PIL)."""
    global _dec_lib, _dec_failed
    if _dec_lib is not None or _dec_failed:
        return _dec_lib
    with _lock:
        if _dec_lib is not None or _dec_failed:
            return _dec_lib
        if not os.path.exists(_DEC_SRC):
            _dec_failed = True
            return None
        stale = (not os.path.exists(_DEC_SO)
                 or os.path.getmtime(_DEC_SO) < os.path.getmtime(_DEC_SRC))
        if stale:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   _DEC_SRC, "-ljpeg", "-o", _DEC_SO + ".tmp"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(_DEC_SO + ".tmp", _DEC_SO)
            except (OSError, subprocess.SubprocessError):
                _dec_failed = True
                return None
        try:
            lib = ctypes.CDLL(_DEC_SO)
        except OSError:
            _dec_failed = True
            return None
        lib.jpeg_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.jpeg_decode_rgb.restype = ctypes.c_int
        lib.pack_quad_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_void_p]
        lib.pack_quad_u8.restype = ctypes.c_int
        _dec_lib = lib
        return _dec_lib


def decode_jpeg_native(data: bytes,
                       scale_denom: int = 1) -> Optional[np.ndarray]:
    """JPEG bytes → uint8 [H, W, 3] RGB via libjpeg, decoded at
    1/scale_denom resolution. None if the native library is unavailable or
    the stream is not decodable (caller falls back to PIL)."""
    lib = load_decode()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.jpeg_decode_rgb(data, len(data), None, 0,
                             ctypes.byref(w), ctypes.byref(h), scale_denom)
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.jpeg_decode_rgb(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
                             ctypes.byref(w), ctypes.byref(h), scale_denom)
    if rc != 0:
        return None
    return out


def pack_quad_native(px: np.ndarray, out: np.ndarray) -> bool:
    """Quad-layout pack [H,W,3] u8 -> [H/4,W/4,48] u8 via the native
    12-byte-run copier (GIL released, so it parallelizes across ingest
    threads). False if the native library is unavailable or shapes don't
    qualify — caller falls back to the numpy strided copy."""
    lib = load_decode()
    if (lib is None or px.dtype != np.uint8 or out.dtype != np.uint8
            or px.ndim != 3 or px.shape[2] != 3 or (px.shape[0] % 4)
            or (px.shape[1] % 4)
            or not px.flags.c_contiguous or not out.flags.c_contiguous):
        return False
    rc = lib.pack_quad_u8(px.ctypes.data_as(ctypes.c_void_p),
                          px.shape[0], px.shape[1],
                          out.ctypes.data_as(ctypes.c_void_p))
    return rc == 0


def points_in_rings_native(points: np.ndarray, rings) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float64)
    px = np.ascontiguousarray(points[:, 0])
    py = np.ascontiguousarray(points[:, 1])
    inside = np.zeros(len(points), dtype=np.uint8)
    for ring in rings:
        ring = np.ascontiguousarray(np.asarray(ring, dtype=np.float64))
        rx = np.ascontiguousarray(ring[:, 0])
        ry = np.ascontiguousarray(ring[:, 1])
        lib.points_in_ring(_ptr(px, ctypes.c_double),
                           _ptr(py, ctypes.c_double), len(points),
                           _ptr(rx, ctypes.c_double),
                           _ptr(ry, ctypes.c_double), len(ring),
                           _ptr(inside, ctypes.c_uint8))
    return inside.astype(bool)

"""Native (C++) host-side components, loaded via ctypes with pure-python
fallbacks.  Built on first import with the system compiler and cached next to
the sources (no pybind11 / pip dependencies)."""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libhdr_codec.so')
_lib = None
_tried = False


def _build():
    src = os.path.join(_DIR, 'hdr_codec.cpp')
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-o', _LIB_PATH, src]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """The codec library or None when no toolchain is available."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_DIR, 'hdr_codec.cpp'))):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hdr_decode_scanlines.restype = ctypes.c_int
        lib.hdr_decode_scanlines.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.hdr_encode_scanlines.restype = ctypes.c_int64
        lib.hdr_encode_scanlines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception as e:  # no compiler / build failure -> python fallback
        print('nvdiffrecmc_tpu.native: using python fallback (%s)' % e)
        _lib = None
    return _lib


def hdr_decode_scanlines(payload: bytes, height: int, width: int):
    """RGBE scanline decode -> uint8 [H, W, 4], or None if native lib
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.hdr_decode_scanlines(
        payload, len(payload), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError('malformed HDR payload (code %d)' % rc)
    return out


def hdr_encode_scanlines(rgbe: np.ndarray):
    """uint8 [H, W, 4] -> RLE-encoded bytes, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = rgbe.shape[:2]
    if w < 8 or w > 32767:
        return None
    rgbe = np.ascontiguousarray(rgbe, np.uint8)
    out = np.empty(h * (4 + w * 8), np.uint8)
    n = lib.hdr_encode_scanlines(
        rgbe.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n < 0:
        return None
    return out[:n].tobytes()

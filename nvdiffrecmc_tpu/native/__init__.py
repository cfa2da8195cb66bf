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


_uv_lib = None
_uv_tried = False


def get_uv_lib():
    """The native UV unwrapper or None when no toolchain is available."""
    global _uv_lib, _uv_tried
    if _uv_lib is not None or _uv_tried:
        return _uv_lib
    _uv_tried = True
    src = os.path.join(_DIR, 'uv_unwrap.cpp')
    so = os.path.join(_DIR, 'libuv_unwrap.so')
    try:
        if not os.path.exists(so) or (os.path.getmtime(so)
                                      < os.path.getmtime(src)):
            subprocess.run(['g++', '-O2', '-shared', '-fPIC', '-o', so, src],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.uv_unwrap.restype = ctypes.c_int
        lib.uv_unwrap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _uv_lib = lib
    except Exception as e:
        print('nvdiffrecmc_tpu.native: uv_unwrap unavailable (%s)' % e)
        _uv_lib = None
    return _uv_lib


def uv_unwrap(v_pos: np.ndarray, t_pos_idx: np.ndarray, cone_cos=0.5,
              max_faces=10000, gutter=0.004):
    """Chart-grown orthographic UV atlas (the xatlas.parametrize role,
    reference train.py:112-114).  v_pos [V,3] float32; t_pos_idx [T,3]
    int32.  Returns (uvs [Vn,2] float32, t_tex_idx [T,3] int32) or None if
    the native toolchain is unavailable."""
    lib = get_uv_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(v_pos, np.float32)
    t = np.ascontiguousarray(t_pos_idx, np.int32)
    T = t.shape[0]
    out_uv = np.empty((3 * T, 2), np.float32)
    out_tidx = np.empty((T, 3), np.int32)
    out_n = ctypes.c_int(0)
    rc = lib.uv_unwrap(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), T,
        ctypes.c_float(cone_cos), int(max_faces), ctypes.c_float(gutter),
        out_uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_tidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(out_n))
    if rc != 0:
        return None
    return out_uv[:out_n.value].copy(), out_tidx


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

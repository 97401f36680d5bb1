"""ctypes bindings for the native host runtime (native/gen6d_native.cpp):
libjpeg/libpng decode, cv2-convention bilinear warps, threaded batch loading.

Falls back to PIL when the shared library hasn't been built
(``make -C native``); call ``available()`` to check. The build step also runs
automatically on first import if a compiler is present.
"""
import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_SO = os.path.join(_NATIVE_DIR, 'gen6d_native.so')


def _build():
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.decode_jpeg.restype = ctypes.c_int
    lib.decode_png.restype = ctypes.c_int
    lib.load_jpeg_batch.restype = ctypes.c_int
    _LIB = lib
    return lib


def available():
    return _load() is not None


def decode_jpeg(path, cap_hw=(1080, 1920)):
    """Decode a JPEG -> uint8 (h, w, 3) RGB, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    cap_h, cap_w = cap_hw
    buf = np.empty((cap_h, cap_w, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.decode_jpeg(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                         cap_h, cap_w, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    # rows are packed at stride w*3 from the start of the buffer
    return buf.reshape(-1)[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_png(path, cap_hw=(1080, 1920)):
    """Decode a PNG -> uint8 (h, w, c), or None on failure."""
    lib = _load()
    if lib is None:
        return None
    cap_h, cap_w = cap_hw
    buf = np.empty((cap_h, cap_w, 4), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.decode_png(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                        cap_h, cap_w, ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c))
    if rc != 0:
        return None
    n = h.value * w.value * c.value
    return buf.reshape(-1)[:n].reshape(h.value, w.value, c.value).copy()


def warp_affine_u8(src, M, out_hw):
    """cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) on uint8 HWC."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dh, dw = out_hw
    dst = np.empty((dh, dw, c), np.uint8)
    Mf = np.ascontiguousarray(M, np.float32)
    lib.warp_affine_u8(src.ctypes.data_as(ctypes.c_void_p), h, w, c,
                       Mf.ctypes.data_as(ctypes.c_void_p),
                       dst.ctypes.data_as(ctypes.c_void_p), dh, dw)
    return dst


def warp_perspective_u8(src, H, out_hw):
    """cv2.warpPerspective(INTER_LINEAR, BORDER_CONSTANT=0) on uint8 HWC."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    src = np.ascontiguousarray(src, np.uint8)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dh, dw = out_hw
    dst = np.empty((dh, dw, c), np.uint8)
    Hf = np.ascontiguousarray(H, np.float32)
    lib.warp_perspective_u8(src.ctypes.data_as(ctypes.c_void_p), h, w, c,
                            Hf.ctypes.data_as(ctypes.c_void_p),
                            dst.ctypes.data_as(ctypes.c_void_p), dh, dw)
    return dst


def load_jpeg_batch(paths, cap_hw=(1080, 1920), threads=None):
    """Threaded JPEG batch decode -> (packed uint8 (n, cap_h, cap_w, 3),
    hs, ws). Rows of image i are packed at stride ws[i]*3 within slot i."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    n = len(paths)
    cap_h, cap_w = cap_hw
    out = np.empty((n, cap_h, cap_w, 3), np.uint8)
    hs = np.empty(n, np.int32)
    ws = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = threads or min(8, os.cpu_count() or 1)
    fails = lib.load_jpeg_batch(arr, n, out.ctypes.data_as(ctypes.c_void_p),
                                cap_h, cap_w,
                                hs.ctypes.data_as(ctypes.c_void_p),
                                ws.ctypes.data_as(ctypes.c_void_p), threads)
    imgs = []
    for i in range(n):
        imgs.append(out[i].reshape(-1)[:hs[i] * ws[i] * 3]
                    .reshape(hs[i], ws[i], 3).copy())
    return imgs, int(fails)

"""ctypes binding for the native C++ decode/augment runtime.

``NativeBatchLoader`` decodes JPEG/PNG, crops, flips and normalizes a
whole batch into a single contiguous NHWC float32 buffer using C++
threads — one memcpy-free pass instead of PIL->numpy->stack. Falls back
gracefully (``available() == False``) when the shared library can't be
built; the pure-Python loader keeps working.

The library is built on demand with the checked-in Makefile (g++,
libjpeg, libpng — all in the base image).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdsgan_runtime.so")
_lib = None
_tried = False


def _build():
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.dsgan_load_batch.restype = ctypes.c_int
    lib.dsgan_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.dsgan_load_batch_u8.restype = ctypes.c_int
    lib.dsgan_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dsgan_probe.restype = ctypes.c_int
    lib.dsgan_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def probe(path):
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.dsgan_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return w.value, h.value
    return None


def load_batch_u8(paths, offs_y, offs_x, flips, crop_h, crop_w, num_threads=4):
    """Decode->crop->flip a batch as raw uint8 (n, crop_h, crop_w, 3) —
    the [-1,1] normalize runs on device (same f32 ops, bit-identical,
    quarter of the H2D bytes). Returns (batch, ok_count)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    n = len(paths)
    out = np.empty((n, crop_h, crop_w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_oy = (ctypes.c_int * n)(*[int(v) for v in offs_y])
    c_ox = (ctypes.c_int * n)(*[int(v) for v in offs_x])
    c_fl = (ctypes.c_int * n)(*[int(v) for v in flips])
    ok = lib.dsgan_load_batch_u8(
        c_paths, n, c_oy, c_ox, c_fl, crop_h, crop_w, int(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok


def load_batch(paths, offs_y, offs_x, flips, crop_h, crop_w, num_threads=4):
    """Decode->crop->flip->normalize a batch. Returns (n, crop_h, crop_w, 3)
    float32 in [-1,1], plus the count of successful decodes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    n = len(paths)
    out = np.empty((n, crop_h, crop_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_oy = (ctypes.c_int * n)(*[int(v) for v in offs_y])
    c_ox = (ctypes.c_int * n)(*[int(v) for v in offs_x])
    c_fl = (ctypes.c_int * n)(*[int(v) for v in flips])
    ok = lib.dsgan_load_batch(
        c_paths, n, c_oy, c_ox, c_fl, crop_h, crop_w, int(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, ok

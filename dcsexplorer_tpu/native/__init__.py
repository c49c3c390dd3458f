"""Native host runtime: C++ stream indexer / dense symbol decoder (ctypes).

Builds ``build/libdcsnative.so`` on demand from ``src/dcs_native.cpp`` with a
generated table header.  Python threads fan the (GIL-releasing) C calls out
across cores for batch workloads.  Falls back to None if no compiler is
available; callers then use the pure-Python prescan.
"""

import ctypes as C
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_BUILD = os.path.join(_REPO, "build")
_LIB_PATH = os.path.join(_BUILD, "libdcsnative.so")
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "src", "dcs_native.cpp")
    hdr = os.path.join(_BUILD, "native_inc", "dcs_tables.h")
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            from . import gen_tables
            gen_tables.emit(hdr)
            os.makedirs(_BUILD, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 f"-I{os.path.dirname(hdr)}", src, "-o", _LIB_PATH],
                check=True, capture_output=True, text=True)
        lib = C.CDLL(_LIB_PATH)
    except (subprocess.CalledProcessError, OSError):
        return None
    lib.dcs94_frame_count.restype = C.c_int
    lib.dcs94_frame_count.argtypes = [C.c_char_p, C.c_int, C.c_int]
    lib.dcs94_decode_dense.restype = C.c_int
    lib.dcs94_decode_dense.argtypes = [
        C.c_char_p, C.c_int, C.c_int,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p]
    _lib = lib
    return _lib


class NativeDecode:
    """Result arrays of a native dense decode."""

    __slots__ = ("n_frames", "header", "fmt_type", "sub_type", "error_frame",
                 "max_symbols", "start_bit", "end_bit", "band_type",
                 "band_type_prev", "dense", "scale", "fb_idx", "valid")


def decode_dense(stream, pos=0, want_controls=True):
    """Index + densely decode a 1994+ stream with the native runtime.

    Returns a NativeDecode, or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    buf = bytes(stream)
    F = lib.dcs94_frame_count(buf, len(buf), pos)
    if F < 0:
        raise ValueError("stream too short")
    r = NativeDecode()
    r.n_frames = F
    r.header = np.zeros(16, dtype=np.uint8)
    meta = np.zeros(4, dtype=np.int32)
    r.start_bit = np.zeros(F, dtype=np.int64)
    r.end_bit = np.zeros(F, dtype=np.int64)
    r.band_type = np.zeros((F, 16), dtype=np.int32)
    r.band_type_prev = np.zeros((F, 16), dtype=np.int32)
    if want_controls:
        r.dense = np.zeros((F, 256), dtype=np.int32)
        r.scale = np.zeros((F, 256), dtype=np.int32)
        r.fb_idx = np.zeros((F, 256), dtype=np.int16)
        r.valid = np.zeros((F, 256), dtype=np.uint8)
    else:
        r.dense = r.scale = r.fb_idx = r.valid = None

    def p(a):
        return a.ctypes.data_as(C.c_void_p) if a is not None else None

    rc = lib.dcs94_decode_dense(
        buf, len(buf), pos, p(r.header), p(meta),
        p(r.start_bit), p(r.end_bit), p(r.band_type), p(r.band_type_prev),
        p(r.dense), p(r.scale), p(r.fb_idx), p(r.valid))
    if rc != 0:
        raise RuntimeError(f"native decode failed: {rc}")
    r.fmt_type, r.sub_type, r.error_frame, r.max_symbols = (
        int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3]))
    return r


def decode_dense_batch(streams, workers=None):
    """Decode many streams in parallel host threads (C calls drop the GIL)."""
    if get_lib() is None:
        return None
    workers = workers or min(16, os.cpu_count() or 4)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(decode_dense, streams))

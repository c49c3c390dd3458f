"""ctypes wrapper for the golden-oracle shared library (see build.py/shim.cpp)."""

import ctypes as C

import numpy as np

from . import build as _build

OS93A, OS93B, OS94, OS95 = 1, 2, 3, 4

_lib = None


def get_lib():
    """Load (building if needed) the oracle library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = _build.build()
    if path is None:
        return None
    lib = C.CDLL(path)
    lib.dcsref_create.restype = C.c_void_p
    lib.dcsref_create.argtypes = [C.c_int, C.c_int]
    lib.dcsref_destroy.argtypes = [C.c_void_p]
    lib.dcsref_load_stream.argtypes = [C.c_void_p, C.c_int, C.c_char_p, C.c_int]
    lib.dcsref_is_playing.argtypes = [C.c_void_p, C.c_int]
    lib.dcsref_next_samples.argtypes = [C.c_void_p, C.POINTER(C.c_int16), C.c_int]
    lib.dcsref_write_data_port.argtypes = [C.c_void_p, C.c_uint8]
    lib.dcsref_set_master_volume.argtypes = [C.c_void_p, C.c_int]
    lib.dcsref_read_host_bytes.argtypes = [C.c_void_p, C.POINTER(C.c_uint8), C.c_int]
    lib.dcsref_stream_info.argtypes = [C.c_void_p, C.c_char_p] + [C.POINTER(C.c_int)] * 4
    lib.dcsref_encode.restype = C.c_int
    lib.dcsref_encode.argtypes = [
        C.POINTER(C.c_int16), C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_float, C.c_float, C.POINTER(C.c_uint8), C.c_int, C.POINTER(C.c_int)]
    lib.dcsref_create_rom.restype = C.c_void_p
    lib.dcsref_create_rom.argtypes = [
        C.POINTER(C.c_char_p), C.POINTER(C.c_uint32), C.c_int, C.c_int]
    lib.dcsref_check_roms.argtypes = [C.c_void_p]
    lib.dcsref_hard_boot.argtypes = [C.c_void_p]
    lib.dcsref_soft_boot.argtypes = [C.c_void_p]
    lib.dcsref_is_ok.argtypes = [C.c_void_p]
    lib.dcsref_version_info.restype = C.c_uint
    lib.dcsref_version_info.argtypes = [C.c_void_p]
    lib.dcsref_num_channels.argtypes = [C.c_void_p]
    lib.dcsref_max_track.argtypes = [C.c_void_p]
    lib.dcsref_track_info.argtypes = [C.c_void_p, C.c_int, C.POINTER(C.c_uint32)]
    _lib = lib
    return _lib


class OracleDecoder:
    """Reference DCSDecoderNative in standalone mode (golden PCM source)."""

    def __init__(self, os_version=OS94, default_volume=255):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self._h = lib.dcsref_create(os_version, default_volume)
        self._streams = []  # keep stream buffers alive (decoder keeps pointers)

    def close(self):
        if self._h:
            self._lib.dcsref_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def load_stream(self, data: bytes, channel=0, mixing_level=0x64):
        buf = C.create_string_buffer(bytes(data), len(data))
        self._streams.append(buf)
        self._lib.dcsref_load_stream(self._h, channel, buf, mixing_level)

    def is_playing(self, channel=0):
        return bool(self._lib.dcsref_is_playing(self._h, channel))

    def next_samples(self, n):
        out = np.empty(n, dtype=np.int16)
        self._lib.dcsref_next_samples(
            self._h, out.ctypes.data_as(C.POINTER(C.c_int16)), n)
        return out

    def write_data_port(self, b):
        self._lib.dcsref_write_data_port(self._h, b)

    def set_master_volume(self, vol):
        self._lib.dcsref_set_master_volume(self._h, vol)

    def read_host_bytes(self, cap=65536):
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.dcsref_read_host_bytes(
            self._h, out.ctypes.data_as(C.POINTER(C.c_uint8)), cap)
        return bytes(out[:n].tobytes())

    def stream_info(self, data: bytes):
        buf = C.create_string_buffer(bytes(data), len(data))
        vals = [C.c_int() for _ in range(4)]
        self._lib.dcsref_stream_info(self._h, buf, *[C.byref(v) for v in vals])
        return dict(zip(("n_frames", "n_bytes", "type", "subtype"),
                        (v.value for v in vals)))


def encode(pcm, sample_rate=31250, fmt_type=1, fmt_subtype=3,
           bit_rate=128000, cutoff=-1.0, max_err=-1.0):
    """Encode int16 PCM into a DCS stream with the reference encoder."""
    lib = get_lib()
    assert lib is not None
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    cap = max(1 << 16, pcm.size * 4)
    out = np.empty(cap, dtype=np.uint8)
    n_frames = C.c_int()
    n = lib.dcsref_encode(
        pcm.ctypes.data_as(C.POINTER(C.c_int16)), pcm.size, sample_rate,
        fmt_type, fmt_subtype, bit_rate, cutoff, max_err,
        out.ctypes.data_as(C.POINTER(C.c_uint8)), cap, C.byref(n_frames))
    if n < 0:
        raise RuntimeError(f"reference encoder failed: {n}")
    return bytes(out[:n].tobytes()), n_frames.value


class OracleCpu:
    """ctypes wrapper for the reference ADSP-21xx interpreter.

    Exposes full register-file set/get (125-entry u64 vector, layout
    mirrored by dcsexplorer_tpu.emu.adsp2105.ADSP2105.state_vec) plus
    PM/DM memory and the PM($3000) data-port, for per-instruction
    differential testing of the framework's CPU core.
    """

    STATE_LEN = 125

    def __init__(self):
        lib = get_lib()
        lib.dcsref_cpu_step.restype = C.c_int
        lib.dcsref_cpu_get_port_out.restype = C.c_uint
        lib.dcsref_cpu_get_port_writes.restype = C.c_int
        self._lib = lib
        lib.dcsref_cpu_init()

    def reset(self):
        self._lib.dcsref_cpu_reset()

    def set_state(self, vec):
        arr = (C.c_uint64 * self.STATE_LEN)(*[v & (2**64 - 1) for v in vec])
        self._lib.dcsref_cpu_set_state(arr)

    def get_state(self):
        arr = (C.c_uint64 * self.STATE_LEN)()
        self._lib.dcsref_cpu_get_state(arr)
        return list(arr)

    def step(self, cycles=1):
        return self._lib.dcsref_cpu_step(cycles)

    def invoke_irq(self, which=2, indx=0, cycles=1 << 30):
        self._lib.dcsref_cpu_invoke_irq(which, indx, cycles)

    def set_pm(self, words, start=0):
        arr = (C.c_uint32 * len(words))(*[w & 0xFFFFFF for w in words])
        self._lib.dcsref_cpu_set_pm(arr, start, len(words))

    def get_pm(self, start=0, n=0x4000):
        arr = (C.c_uint32 * n)()
        self._lib.dcsref_cpu_get_pm(arr, start, n)
        return list(arr)

    def set_dm(self, words, start=0):
        arr = (C.c_uint16 * len(words))(*[w & 0xFFFF for w in words])
        self._lib.dcsref_cpu_set_dm(arr, start, len(words))

    def get_dm(self, start=0, n=0x4000):
        arr = (C.c_uint16 * n)()
        self._lib.dcsref_cpu_get_dm(arr, start, n)
        return list(arr)

    def set_port(self, v):
        self._lib.dcsref_cpu_set_port(v & 0xFFFF)

    def port_out(self):
        return self._lib.dcsref_cpu_get_port_out()

    def port_writes(self):
        return self._lib.dcsref_cpu_get_port_writes()

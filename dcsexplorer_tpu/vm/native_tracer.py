"""Native control tracer: the DCS runtime VM in C++ (native/src/tracer.cpp).

Serving-path counterpart of vm/tracer.py: one C call traces a whole
session (N frames of the track VM, command queue, IRQ2 protocol, fades,
volume) and returns the per-frame control vectors for the device pipeline
— roughly 300× faster per frame than the Python tracer, which makes the
host trace a negligible share of end-to-end session serving (the round-2
verdict measured the Python trace dominating it).

Output parity with the Python ControlTracer is fuzz-asserted in
tests/test_native_tracer.py.
"""

import ctypes as C

import numpy as np

from .. import native
from ..refdec import decoder as rd


def available():
    return native.get_lib() is not None


class NativeControlTracer:
    """Trace a ROM session natively.  Events are data-port bytes scheduled
    before given frame indices: {frame: [byte, ...]}.

    ``rom_set`` may instead be raw stream bytes for standalone playback
    (pass ``standalone_os``): the bytes become chip 0 and streams load by
    offset through load_audio_stream."""

    def __init__(self, rom_set, default_volume=0x67, standalone_os=None):
        lib = native.get_lib()
        assert lib is not None
        self._lib = lib
        self._bufs = []
        if standalone_os is not None:
            self.rom_set = None
            self._h = lib.dcstr_create(int(standalone_os), 0, 0, 0x0106,
                                       int(default_volume))
            buf = bytes(rom_set)
            self._bufs.append(buf)
            lib.dcstr_add_chip(self._h, 0, buf, len(buf))
            lib.dcstr_set_catalog(self._h, 0, 0, 0,
                                  21 if standalone_os == rd.OS95 else 20)
            return
        self.rom_set = rom_set
        self._h = lib.dcstr_create(
            int(rom_set.os_version), int(rom_set.game_id == "TOTAN"),
            int(rom_set.nominal_version or 0), 0x0106, int(default_volume))
        for i, chip in enumerate(rom_set.chips):
            if chip is None:
                continue
            mem = chip.mem if isinstance(chip, rd.PaddedView) else chip
            buf = bytes(mem)
            self._bufs.append(buf)
            lib.dcstr_add_chip(self._h, i, buf, len(buf))
        lib.dcstr_set_catalog(
            self._h, int(rom_set._track_index), int(rom_set._indirect_index),
            int(rom_set.n_tracks),
            21 if rom_set.hw_version == 3 else 20)

    def close(self):
        if self._h:
            self._lib.dcstr_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def soft_boot(self):
        self._lib.dcstr_soft_boot(self._h)

    def full_reset(self):
        """Fresh-session reset (a new decoder object's state).  The
        reference's soft_boot is a soft REBOOT that keeps tracks/streams/
        mixer fades running; independent sessions need this instead."""
        self._lib.dcstr_full_reset(self._h)

    def load_audio_stream(self, chno, addr, mixing_level=0x64,
                          loop_count=1):
        """Standalone stream playback (refdec load_audio_stream): play the
        stream whose header starts at ROM address ``addr``."""
        self._lib.dcstr_load_stream(self._h, int(chno), int(addr),
                                    int(mixing_level), int(loop_count))

    def write_data_port(self, b):
        self._lib.dcstr_write_port(self._h, int(b) & 0xFF)

    def trace_frames(self, n, events=None):
        """Trace n frames.  Returns (stream_addr [n,8] int32 — u24 stream
        header address or -1, frame_idx [n,8], mix [n,8], vol_shift [n])."""
        ev_frames, ev_bytes = [], []
        for f in sorted((events or {}).keys()):
            for b in events[f]:
                ev_frames.append(f)
                ev_bytes.append(b & 0xFF)
        evf = np.asarray(ev_frames, dtype=np.int32)
        evb = np.asarray(ev_bytes, dtype=np.uint8)
        out_s = np.zeros((n, 8), dtype=np.int32)
        out_f = np.zeros((n, 8), dtype=np.int32)
        out_m = np.zeros((n, 8), dtype=np.int32)
        out_v = np.zeros(n, dtype=np.int32)
        p = lambda a: a.ctypes.data_as(C.c_void_p)
        rc = self._lib.dcstr_trace(
            self._h, n, p(evf), p(evb), len(ev_frames),
            p(out_s), p(out_f), p(out_m), p(out_v))
        if rc != 0:
            raise rd.ResetError(f"native trace fault ({rc})")
        return out_s, out_f, out_m, out_v

    def trace_rows(self, n, addr_tab, off_tab, out_rows, out_mix, out_vol,
                   events=None):
        """Trace n frames and write device-ready controls in place — the
        fused serving-path call (trace + row assembly + u16/u8 narrowing
        in one C pass; dcstr_trace_rows in native/src/tracer.cpp).

        addr_tab/off_tab: the sorted stream table from stream_row_table.
        out_rows/out_mix: C-contiguous uint16 [n, 8]; out_vol: uint8 [n].
        """
        ev_frames, ev_bytes = [], []
        for f in sorted((events or {}).keys()):
            for b in events[f]:
                ev_frames.append(f)
                ev_bytes.append(b & 0xFF)
        evf = np.asarray(ev_frames, dtype=np.int32)
        evb = np.asarray(ev_bytes, dtype=np.uint8)
        p = lambda a: a.ctypes.data_as(C.c_void_p)
        rc = self._lib.dcstr_trace_rows(
            self._h, n, p(evf), p(evb), len(ev_frames),
            p(addr_tab), p(off_tab), len(addr_tab),
            p(out_rows), p(out_mix), p(out_vol))
        if rc == -3:
            raise KeyError("traced stream address missing from the bank")
        if rc != 0:
            raise rd.ResetError(f"native trace fault ({rc})")

    def trace_segs(self, n, addr_tab, off_tab, out_f0, out_base,
                   out_slope, out_mixv, out_vol, events=None):
        """Trace n frames and emit control-plane SEGMENTS in place — the
        compressed serving-path call (dcstr_trace_segs in
        native/src/tracer.cpp): each channel lane becomes linear
        segments ``row[t] = base + slope*(t-f0)`` with a constant mix,
        written straight into the caller's batch slices.  No dense [n,8]
        control arrays are built anywhere on the host.

        out_f0/out_base/out_mixv: C-contiguous uint16 [n_ch, E];
        out_slope: uint8 [n_ch, E]; out_vol: uint8 [n].  Unused f0
        entries are left 0xFFFF (device-side segment lookup needs no
        count column).  Returns True, or False if any lane needs more
        than E segments (caller falls back to the dense trace_rows
        upload).  Segmentation matches models/romplay.compress_controls
        exactly (asserted in tests/test_romplay.py).
        """
        ev_frames, ev_bytes = [], []
        for f in sorted((events or {}).keys()):
            for b in events[f]:
                ev_frames.append(f)
                ev_bytes.append(b & 0xFF)
        evf = np.asarray(ev_frames, dtype=np.int32)
        evb = np.asarray(ev_bytes, dtype=np.uint8)
        n_ch, E = out_f0.shape
        p = lambda a: a.ctypes.data_as(C.c_void_p)
        rc = self._lib.dcstr_trace_segs(
            self._h, n, p(evf), p(evb), len(ev_frames),
            p(addr_tab), p(off_tab), len(addr_tab), n_ch, E,
            p(out_f0), p(out_base), p(out_slope), p(out_mixv), p(out_vol))
        if rc == -4:
            return False
        if rc == -5:
            raise ValueError(f"a channel >= {n_ch} went live during the "
                             "segment trace — widen the lane count")
        if rc == -3:
            raise KeyError("traced stream address missing from the bank")
        if rc != 0:
            raise rd.ResetError(f"native trace fault ({rc})")
        return True

    def trace_segs_batch(self, n_frames, addr_tab, off_tab, out_f0,
                         out_base, out_slope, out_mixv, out_vol,
                         events_list):
        """Trace a BATCH of independent sessions in ONE C call
        (dcstr_trace_segs_batch): session b is FULLY RESET (fresh-decoder
        state, not the reference's state-preserving soft reboot) and
        traced on this handle, its segments written straight into row b of the
        batch arrays.  The serving path's whole host stage is one
        C call per batch — no per-session Python loop, no per-session
        ctypes marshalling (bench.bench_session6).

        out_f0/out_base/out_mixv: C-contiguous uint16 [S, n_ch, E];
        out_slope: uint8 [S, n_ch, E]; out_vol: uint8 [S, n_frames].
        events_list: one {frame: [byte, ...]} dict per session.
        Returns True, or False if any lane overflows E segments.
        """
        S, n_ch, E = out_f0.shape
        assert len(events_list) == S and out_vol.shape == (S, n_frames)
        ev_frames, ev_bytes, ev_off = [], [], [0]
        for events in events_list:
            for f in sorted((events or {}).keys()):
                for b in events[f]:
                    ev_frames.append(f)
                    ev_bytes.append(b & 0xFF)
            ev_off.append(len(ev_frames))
        evf = np.asarray(ev_frames, dtype=np.int32)
        evb = np.asarray(ev_bytes, dtype=np.uint8)
        evo = np.asarray(ev_off, dtype=np.int32)
        p = lambda a: a.ctypes.data_as(C.c_void_p)
        rc = self._lib.dcstr_trace_segs_batch(
            self._h, S, n_frames, p(evo), p(evf), p(evb),
            p(addr_tab), p(off_tab), len(addr_tab), n_ch, E,
            p(out_f0), p(out_base), p(out_slope), p(out_mixv), p(out_vol))
        if rc == -4:
            return False
        if rc == -5:
            raise ValueError("a channel >= n_ch went live during the "
                             "segment trace — widen the lane count")
        if rc == -3:
            raise KeyError("traced stream address missing from the bank")
        if rc != 0:
            raise rd.ResetError(f"native trace fault ({rc})")
        return True

    def read_host_bytes(self, cap=1 << 16):
        out = np.zeros(cap, dtype=np.uint8)
        n = self._lib.dcstr_read_host(
            self._h, out.ctypes.data_as(C.c_void_p), cap)
        return bytes(out[:n].tobytes())


def stream_row_table(rom_set, bank):
    """Sorted (addr [n] int64, row-offset [n] int32) table mapping every
    bank stream's u24 linear address to its dense row base.

    Host side of NativeControlTracer.trace_rows: built once per ROM,
    binary-searched in C per traced voice-frame."""
    from ..rom import tracks as rtracks
    pairs = {}
    for linear in rtracks.list_streams(rom_set, rom_set.os_version):
        ptr = rom_set.make_pointer(linear)
        mem = ptr.mem.mem if isinstance(ptr.mem, rd.PaddedView) else ptr.mem
        pairs[int(linear)] = int(bank.offsets[(id(mem), ptr.pos)])
    addrs = np.asarray(sorted(pairs), dtype=np.int64)
    offs = np.asarray([pairs[a] for a in addrs.tolist()], dtype=np.int32)
    return addrs, offs


def assemble_controls_native(rom_set, bank, out_s, out_f, out_m):
    """Map a native trace onto a StreamBank's dense rows.

    Returns (rows [T, 8] int32, mix [T, 8] int32) — the same arrays
    models/pipeline.assemble_controls derives from the Python tracer."""
    T_ = out_s.shape[0]
    uniq = [int(a) for a in np.unique(out_s) if a >= 0]
    if not uniq:
        return (np.zeros((T_, 8), dtype=np.int32),
                np.where(out_s >= 0, out_m, 0).astype(np.int32))
    offs = []
    for addr in uniq:
        ptr = rom_set.make_pointer(addr)
        mem = ptr.mem.mem if isinstance(ptr.mem, rd.PaddedView) else ptr.mem
        offs.append(bank.offsets[(id(mem), ptr.pos)])
    addrs = np.asarray(uniq, dtype=np.int64)
    offs = np.asarray(offs, dtype=np.int64)
    flat = out_s.reshape(-1).astype(np.int64)
    active = flat >= 0
    idx = np.searchsorted(addrs, np.where(active, flat, addrs[0]))
    rows = (offs[idx] + out_f.reshape(-1)) * active
    rows = rows.reshape(T_, 8).astype(np.int32)
    mix = np.where(out_s >= 0, out_m, 0).astype(np.int32)
    return rows, mix

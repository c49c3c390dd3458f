"""Native control tracer (native/src/tracer.cpp) parity vs the Python VM.

The native runtime must reproduce the Python ControlTracer's per-frame
control vectors — stream rows, mixing multipliers, volume shifts — and
the host-bound data-port bytes, over randomized sessions of track
commands, volume changes, fades, and overlapping voices (the runtime
semantics anchor: DCSDecoderNative.cpp:89-306, :848-1228, :3042-3135)."""

import numpy as np
import pytest

from dcsexplorer_tpu import native
from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.models import pipeline as pl, romplay
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload
from dcsexplorer_tpu.vm.native_tracer import (NativeControlTracer,
                                              assemble_controls_native,
                                              stream_row_table)

from .test_romgen import _make_spec

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def _rom():
    rs, _ = zipload.load_zip_data(romgen.RomBuilder(_make_spec()).build_zip())
    assert rs.check() == 1
    return rs


def _fuzz_events(rng, n_frames, playable):
    """Byte-level events: {frame: [port bytes]}."""
    events = {}
    f = 0
    while f < n_frames - 4:
        kind = rng.integers(0, 12)
        if kind < 6:
            t = int(rng.choice(playable))
            byts = [(t >> 8) & 0xFF, t & 0xFF]
        elif kind < 8:
            v = int(rng.integers(0, 256))
            byts = [0x55, 0xAA, v, v ^ 0xFF]
        elif kind < 10:
            ch = int(rng.integers(0, 6))
            v = int(rng.integers(0, 256))
            byts = [0x55, 0xAB + ch, v, v ^ 0xFF]
        else:                                       # version query
            byts = [0x55, 0xC2] if kind == 10 else [0x55, 0xC3]
        events.setdefault(f, []).extend(byts)
        f += int(rng.integers(2, 25))
    return events


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_native_tracer_matches_python(seed):
    rs = _rom()
    bank = romplay.build_rom_bank(rs)
    rng = np.random.default_rng(seed)
    n_frames = 400
    events = _fuzz_events(rng, n_frames, [1, 2, 4, 5, 7])

    # Python tracer
    pt = pl.ControlTracer()
    pt.default_volume = 0x80
    pt.load_rom_set(rs)
    pt.soft_boot()
    py_events = {
        f: (lambda dec, bb=tuple(b): [dec.write_data_port(x) for x in bb])
        for f, b in events.items() for b in [events[f]]}
    pt.trace_frames(n_frames, events=py_events)
    rows_p, mix_p, vol_p = pl.assemble_controls(pt, bank)

    # native tracer
    nt = NativeControlTracer(rs, default_volume=0x80)
    nt.soft_boot()
    out_s, out_f, out_m, vol_n = nt.trace_frames(n_frames, events=events)
    rows_n, mix_n = assemble_controls_native(rs, bank, out_s, out_f, out_m)

    assert (vol_n == vol_p).all(), (
        f"vol_shift diverges at frame {np.nonzero(vol_n != vol_p)[0][0]}")
    assert (rows_n == rows_p).all(), (
        f"rows diverge at frame {np.argwhere(rows_n != rows_p)[0]}")
    # mix only matters on active rows (assemble leaves silent rows 0)
    assert (mix_n == mix_p).all(), (
        f"mix diverges at frame {np.argwhere(mix_n != mix_p)[0]}")
    assert nt.read_host_bytes() == bytes(pt.host.rx)


@pytest.mark.parametrize("seed", [21, 22])
def test_trace_rows_matches_two_pass(seed):
    """The fused serving call (dcstr_trace_rows: trace + row assembly +
    u16/u8 narrowing in one C pass) must equal trace_frames followed by
    assemble_controls_native."""
    rs = _rom()
    bank = romplay.build_rom_bank(rs)
    rng = np.random.default_rng(seed)
    n_frames = 400
    events = _fuzz_events(rng, n_frames, [1, 2, 4, 5, 7])

    t1 = NativeControlTracer(rs, default_volume=0x80)
    t1.soft_boot()
    out_s, out_f, out_m, vol = t1.trace_frames(n_frames, events=events)
    rows, mix = assemble_controls_native(rs, bank, out_s, out_f, out_m)

    addr_tab, off_tab = stream_row_table(rs, bank)
    rows_f = np.zeros((n_frames, 8), np.uint16)
    mix_f = np.zeros((n_frames, 8), np.uint16)
    vol_f = np.zeros(n_frames, np.uint8)
    t2 = NativeControlTracer(rs, default_volume=0x80)
    t2.soft_boot()
    t2.trace_rows(n_frames, addr_tab, off_tab, rows_f, mix_f, vol_f,
                  events=events)

    assert (rows_f == rows.astype(np.uint16)).all()
    assert (mix_f == mix.astype(np.uint16)).all()
    assert (vol_f == vol.astype(np.uint8)).all()
    assert t2.read_host_bytes() == t1.read_host_bytes()


@pytest.mark.parametrize("seed", [31, 32])
def test_trace_segs_batch_matches_loop(seed):
    """The batched serving call (dcstr_trace_segs_batch: S INDEPENDENT
    sessions traced through ONE handle in one C call, full-reset between
    them) must equal a per-session trace_segs loop over FRESH handles,
    table-for-table, including the fallback return on segment overflow.
    Fresh handles are the point: soft_boot alone keeps tracks/streams/
    fades running (the reference's soft-reboot semantics), and the batch
    call must not leak session b-1's playing state into session b."""
    rs = _rom()
    bank = romplay.build_rom_bank(rs)
    addr_tab, off_tab = stream_row_table(rs, bank)
    rng = np.random.default_rng(seed)
    S, CH, E, T = 12, 8, 48, 300
    events_list = [_fuzz_events(rng, T, [1, 2, 4, 5, 7]) for _ in range(S)]

    f0a = np.zeros((S, CH, E), np.uint16)
    ba = np.zeros((S, CH, E), np.uint16)
    sa = np.zeros((S, CH, E), np.uint8)
    ma = np.zeros((S, CH, E), np.uint16)
    va = np.zeros((S, T), np.uint8)
    ok_loop = []
    for b in range(S):
        t1 = NativeControlTracer(rs, default_volume=0x80)
        t1.soft_boot()
        ok_loop.append(t1.trace_segs(T, addr_tab, off_tab, f0a[b], ba[b],
                                     sa[b], ma[b], va[b], events_list[b]))
        t1.close()

    t2 = NativeControlTracer(rs, default_volume=0x80)
    f0b = np.zeros((S, CH, E), np.uint16)
    bb = np.zeros((S, CH, E), np.uint16)
    sb = np.zeros((S, CH, E), np.uint8)
    mb = np.zeros((S, CH, E), np.uint16)
    vb = np.zeros((S, T), np.uint8)
    ok = t2.trace_segs_batch(T, addr_tab, off_tab, f0b, bb, sb, mb, vb,
                             events_list)
    assert ok == all(ok_loop)
    if ok:
        assert (f0a == f0b).all() and (ba == bb).all()
        assert (sa == sb).all() and (ma == mb).all() and (va == vb).all()
    t2.close()


def test_native_tracer_speed():
    """The native trace must be ≥ 50× the Python tracer's rate (it is
    ~300×; this guards the serving-path regression)."""
    import time

    rs = _rom()
    n_frames = 2000
    events = {0: [0x00, 0x01], 7: [0x00, 0x02]}

    nt = NativeControlTracer(rs)
    nt.soft_boot()
    t0 = time.perf_counter()
    nt.trace_frames(n_frames, events=events)
    dt_n = time.perf_counter() - t0

    pt = pl.ControlTracer()
    pt.load_rom_set(rs)
    pt.soft_boot()
    t0 = time.perf_counter()
    pt.trace_frames(200, events={})
    dt_p = (time.perf_counter() - t0) * (n_frames / 200)

    assert dt_n * 50 < dt_p, (
        f"native {dt_n * 1e3:.1f} ms vs python ~{dt_p * 1e3:.0f} ms "
        f"for {n_frames} frames")

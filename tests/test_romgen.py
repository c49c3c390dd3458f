"""Full-ROM round trip: synthesize a ROM set, load it in both the compiled
reference and this framework, verify introspection parity and lockstep PCM.

This is the framework's equivalent of the reference's --validate methodology
(BASELINE config #5), using compiler-generated ROMs since original PinMame
ROMs are not redistributable.
"""

import glob
import os

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import tracks as rtracks
from dcsexplorer_tpu.rom import zipload

from . import oracle

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "streams")


def _make_spec():
    streams = {}
    for p in sorted(glob.glob(os.path.join(ASSETS, "*.dcs94")))[:2]:
        streams[os.path.basename(p)] = open(p, "rb").read()
    names = list(streams)

    g = romgen
    spec = g.RomSpec(os_version=rd.OS94, num_channels=6)
    spec.streams = streams
    spec.tracks = [
        # 0: stop-all style (just ends)
        g.TrackSpec(0, steps=[g.op_end()]),
        # 1: set level then play stream on channel 0
        g.TrackSpec(1, channel=0, steps=[
            g.op_mix(0, 0, 0x64),
            g.op_play(0, names[0], repeat=0),
            g.op_wait_forever(),
        ]),
        # 2: second voice with a fade and a loop of short plays
        g.TrackSpec(2, channel=1, steps=[
            g.op_mix(0, 1, 0x70),
            g.op_mix_fade(2, 1, 0x20, 40, delay=0),
            g.op_loop_start(3),
            g.op_play(1, names[1], repeat=1),
            g.op_write_port(0x42, delay=5),
            g.op_loop_end(delay=12),
            g.op_end(),
        ]),
        # 3: deferred (type 2) pointing at track 1
        g.TrackSpec(3, type=2, channel=2, defer_code=0x0001),
        # 4: triggers the deferred track on channel 2, queues track 0
        g.TrackSpec(4, channel=3, steps=[
            g.op_start_deferred(2),
            g.op_queue(0x0000, delay=3),
            g.op_end(),
        ]),
        # 5: variables + deferred-indirect usage (table 1 indexed by var 2)
        g.TrackSpec(5, channel=4, steps=[
            g.op_set_var(2, 1),
            g.op_end(),
        ]),
        g.TrackSpec(6, type=3, channel=2, defer_code=(2 << 8) | 1),
        g.TrackSpec(7, channel=5, steps=[
            g.op_start_deferred(2),
            g.op_end(),
        ]),
    ]
    spec.di_tables = {1: [0x0001, 0x0002]}
    return spec


def test_romgen_loads_in_framework():
    spec = _make_spec()
    zip_bytes = romgen.RomBuilder(spec).build_zip()

    rs, assigned = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    assert assigned["sound_u2.rom"] == 2
    assert rs.check() == 1
    assert rs.os_version == rd.OS94
    assert rs.num_channels() == 6
    assert rs.n_tracks == 8
    assert rs.soft_boot_offset() == 0x1000

    ti = rtracks.get_track_info(rs, rs.os_version, 1)
    assert ti.type == 1 and ti.channel == 0 and ti.looping
    ti2 = rtracks.get_track_info(rs, rs.os_version, 3)
    assert ti2.type == 2 and ti2.defer_code == 0x0001

    listing = rtracks.explain_track(rs, rs.os_version, 2)
    assert "Play(" in listing and "Loop (3)" in listing

    streams = rtracks.list_streams(rs, rs.os_version)
    assert len(streams) == 2

    dii = rtracks.get_deferred_indirect_tables(rs, rs.os_version)
    assert dii.tables and dii.tables[0][0] == 1
    assert dii.tables[0][1] == [0x0001, 0x0002]


def _oracle_rom_decoder(zip_bytes, default_volume=0x67):
    import ctypes as C
    lib = oracle.get_lib()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    bufs = []
    ptrs = (C.c_char_p * 8)()
    sizes = (C.c_uint32 * 8)()
    for i in range(8):
        if rs.chips[i] is not None and not rs.is_dummy[i]:
            b = C.create_string_buffer(bytes(rs.chips[i]), len(rs.chips[i]))
            bufs.append(b)
            ptrs[i] = C.cast(b, C.c_char_p)
            sizes[i] = len(rs.chips[i])
    h = lib.dcsref_create_rom(ptrs, sizes, default_volume, 0)
    return h, bufs, rs


def test_romgen_reference_parity_and_lockstep():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")
    import ctypes as C
    lib = oracle.get_lib()
    spec = _make_spec()
    zip_bytes = romgen.RomBuilder(spec).build_zip()

    h, bufs, rs = _oracle_rom_decoder(zip_bytes)
    try:
        assert lib.dcsref_check_roms(h) == 1
        vinfo = lib.dcsref_version_info(h)
        hw, osv = (vinfo >> 24) & 0xFF, (vinfo >> 16) & 0xFF
        assert hw == 2 and osv == 4        # DCS93 hardware, OS94 software
        assert lib.dcsref_num_channels(h) == 6
        assert lib.dcsref_max_track(h) == 7
        for t in range(8):
            out = (C.c_uint32 * 6)()
            got = lib.dcsref_track_info(h, t, out)
            mine = rtracks.get_track_info(rs, rd.OS94, t)
            assert got == (mine is not None)
            if mine:
                assert out[1] == mine.channel and out[2] == mine.type
                assert out[4] == mine.time and bool(out[5]) == mine.looping

        # lockstep: boot (incl. bong) + command-driven playback
        lib.dcsref_hard_boot(h)
        mine = rd.ReferenceDecoder()
        mine.load_rom_set(rs)
        rs.check()
        mine.load_rom_set(rs)   # refresh detected versions
        mine.hard_boot()

        def ref_pull(n):
            out = np.empty(n, dtype=np.int16)
            lib.dcsref_next_samples(h, out.ctypes.data_as(C.POINTER(C.c_int16)), n)
            return out

        def both_cmd(track):
            for b in ((track >> 8) & 0xFF, track & 0xFF):
                lib.dcsref_write_data_port(h, b)
                mine.write_data_port(b)

        total_mism = 0
        # boot: 7812 wait samples + one bong (23437) + margin
        for phase, n in [("boot", 7812 + 23437 + 1200)]:
            g = ref_pull(n)
            m = np.array(mine.next_samples(n), dtype=np.int16)
            total_mism += int((g != m).sum())
        assert total_mism == 0, "boot phase mismatch"

        both_cmd(0x0001)          # main music on ch 0
        g = ref_pull(240 * 40)
        m = np.array(mine.next_samples(240 * 40), dtype=np.int16)
        assert np.array_equal(g, m), "track 1 playback mismatch"
        assert np.abs(g).max() > 0

        both_cmd(0x0002)          # looped effect + fade on ch 1
        g = ref_pull(240 * 80)
        m = np.array(mine.next_samples(240 * 80), dtype=np.int16)
        assert np.array_equal(g, m), "two-voice mismatch"

        both_cmd(0x0003)          # arm deferred
        both_cmd(0x0004)          # trigger it + queue stop
        g = ref_pull(240 * 60)
        m = np.array(mine.next_samples(240 * 60), dtype=np.int16)
        assert np.array_equal(g, m), "deferred-track mismatch"

        both_cmd(0x0005)          # set DI variable
        both_cmd(0x0006)          # arm deferred-indirect
        both_cmd(0x0007)          # trigger it
        g = ref_pull(240 * 60)
        m = np.array(mine.next_samples(240 * 60), dtype=np.int16)
        assert np.array_equal(g, m), "deferred-indirect mismatch"

        # host-bound data port bytes must match too
        out = np.empty(65536, dtype=np.uint8)
        nb = lib.dcsref_read_host_bytes(
            h, out.ctypes.data_as(C.POINTER(C.c_uint8)), 65536)
        assert list(out[:nb]) == mine.host.rx, "host data-port bytes mismatch"
    finally:
        lib.dcsref_destroy(h)

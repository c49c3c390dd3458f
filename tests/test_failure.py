"""Failure detection / fault injection (SURVEY.md §5).

The reference models hardware self-reset via ResetException with a 3-retry
cap before latching a fatal error, absorbs missing-ROM reads as $FF, and
reports POST failures as status codes + bongs.  Same contract here.
"""

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload

from .test_romgen import _make_spec


def test_invalid_track_type_recovers_via_reset():
    spec = _make_spec()
    # corrupt: a track whose type byte is invalid (> 3)
    spec.tracks.append(romgen.TrackSpec(8, type=7, channel=0, defer_code=0))
    spec.tracks[-1].type = 1    # build as a program...
    zip_bytes = romgen.RomBuilder(spec).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    rs.check()
    # ...then corrupt the type byte in the image directly
    import numpy as _np
    from dcsexplorer_tpu.rom import tracks as rtracks
    ti = rtracks.get_track_info(rs, rs.os_version, 8)
    chip = bytearray(rs.chips[0])
    chip[ti.address & (len(chip) - 1)] = 9          # invalid type
    rs.chips[0] = bytes(chip)

    dec = rd.ReferenceDecoder()
    dec.load_rom_set(rs)
    dec.soft_boot()
    dec.write_data_port(0x00)
    dec.write_data_port(0x08)
    pcm = dec.next_samples(240 * 2)
    # the invalid command raises a reset, but the command was consumed, so
    # the retry succeeds — the decoder recovers (same as the reference:
    # the queue pop precedes the throw)
    assert dec.state == rd.ST_RUNNING
    assert all(v == 0 for v in pcm)


def test_invalid_opcode_in_program():
    spec = _make_spec()
    spec.tracks.append(romgen.TrackSpec(8, channel=0, steps=[
        (0, 0x7E, b""),      # invalid opcode
    ]))
    zip_bytes = romgen.RomBuilder(spec).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    rs.check()
    dec = rd.ReferenceDecoder()
    dec.load_rom_set(rs)
    dec.soft_boot()
    dec.write_data_port(0x00)
    dec.write_data_port(0x08)
    dec.next_samples(240 * 2)
    assert dec.state == rd.ST_FATAL


def test_post_failure_reports_status_and_bongs():
    spec = _make_spec()
    zip_bytes = romgen.RomBuilder(spec).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    # corrupt U2 after the catalog so its checksum no longer balances
    chip = bytearray(rs.chips[0])
    chip[-3] ^= 0xA5
    rs.chips[0] = bytes(chip)

    dec = rd.ReferenceDecoder()
    dec.load_rom_set(rs)
    dec.hard_boot()
    dec.next_samples(7812 + 10)
    # POST status $79 02 (U2 failed) on the host port, and 2 bongs queued
    assert dec.host.rx[:2] == [0x79, 2]
    assert dec.bong_count == 2
    assert dec.state == rd.ST_BONG


def test_missing_rom_reads_as_ff():
    spec = _make_spec()
    zip_bytes = romgen.RomBuilder(spec).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    rs.check()
    # chips 1..7 are dummies reading $FF
    p = rs.make_pointer((3 << 20) | 0x1234)   # U5, never populated
    assert p.u8() == 0xFF


def test_zip_without_u2_rejected():
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("whatever.rom", b"\x00" * 1024)
    with pytest.raises(ValueError, match="U2"):
        zipload.load_zip_data(buf.getvalue(), zip_name="x.zip")


def test_stream_error_rejected_by_bank():
    from dcsexplorer_tpu.encoder.encoder import BitWriter, _DELTA_CODES
    from dcsexplorer_tpu.models.pipeline import StreamBank
    # type-1 stream driving a band type past 15 (two +14 deltas): the
    # translation tables have no such entry — the prescan must flag it
    w = BitWriter()
    code, nb = _DELTA_CODES[14]
    w.write(code, nb)          # frame 1: band type 0 → 14 (xlat width 7)
    for _ in range(7):
        w.write(0x2A, 7)       # frame 1's 7 raw samples
    w.write(code, nb)          # frame 2: 14 → 28, beyond the xlat range
    hdr = bytes([0x80] + [0x7F] * 15)
    bad = (2).to_bytes(2, "big") + hdr + w.bytes() + b"\xff" * 64
    bank = StreamBank(rd.OS94)
    with pytest.raises(ValueError, match="stream error"):
        bank.add(bad, 0)

"""Malformed-input robustness: corrupt/truncated ROMs and streams must
produce clean errors or failing status codes, never crashes — mirroring the
reference's defensive behavior ($FF dummy pages for missing chips, POST
codes for bad checksums, ResetException recovery for bad track data)."""

import io
import zipfile

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.refdec.decoder import OS94, ReferenceDecoder
from dcsexplorer_tpu.rom import zipload

from .test_romgen import _make_spec


def _zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_zip_without_u2():
    data = _zip({"readme.txt": b"nothing here", "sound_u3.rom": b"\x00" * 64})
    with pytest.raises(ValueError):
        zipload.load_zip_data(data)


def test_not_a_zip():
    with pytest.raises((ValueError, zipfile.BadZipFile)):
        zipload.load_zip_data(b"this is not a zip archive")


def test_truncated_u2_fails_check_not_crash():
    good = romgen.RomBuilder(_make_spec()).build_zip()
    with zipfile.ZipFile(io.BytesIO(good)) as zf:
        u2 = zf.read("sound_u2.rom")
    # truncate mid-catalog and rebuild the zip
    data = _zip({"sound_u2.rom": u2[:0x3010]})
    rs, _ = zipload.load_zip_data(data)
    status = rs.check()
    assert status != 1          # a failing POST code, not an exception


def test_corrupt_catalog_checksum():
    good = romgen.RomBuilder(_make_spec()).build_zip()
    with zipfile.ZipFile(io.BytesIO(good)) as zf:
        u2 = bytearray(zf.read("sound_u2.rom"))
    u2[0x8000] ^= 0xFF          # flip a byte after the catalog
    rs, _ = zipload.load_zip_data(_zip({"sound_u2.rom": bytes(u2)}))
    assert rs.check() != 1


def test_garbage_stream_recovers():
    """Garbage fed as a standalone stream must not crash the decoder; the
    frame-error path zeroes output and stops the channel."""
    rng = np.random.default_rng(3)
    garbage = bytes([0, 8]) + bytes(rng.integers(0, 256, size=4096,
                                                 dtype=np.uint8))
    dec = ReferenceDecoder()
    dec.default_volume = 255
    dec.init_standalone(OS94)
    dec.soft_boot()
    try:
        dec.load_audio_stream(0, garbage, mixing_level=0x64)
    except Exception:
        return                  # rejected outright: acceptable
    out = dec.next_samples(5 * 240)
    assert len(out) == 5 * 240  # produced samples without crashing


def test_missing_chip_reads_ff():
    """Reads from unpopulated chip-select space return $FF dummy pages
    (reference: DCSDecoder.cpp:267-283)."""
    good = romgen.RomBuilder(_make_spec()).build_zip()
    rs, _ = zipload.load_zip_data(good)
    rs.check()
    p = rs.make_pointer(7 << 21 if rs.hw_version == 3 else 7 << 20)
    assert p.mem[p.pos] == 0xFF

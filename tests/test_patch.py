"""Compiler patch mode: prototype import, stream/track replacement."""

import numpy as np

from dcsexplorer_tpu.compiler import patch, romgen, script as cscript
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import tracks as rtracks, zipload
from dcsexplorer_tpu.utils import audioio

from .test_romgen import _make_spec


def _decode_track(rs, track, n_frames):
    dec = rd.ReferenceDecoder()
    dec.default_volume = 255
    dec.load_rom_set(rs)
    dec.soft_boot()
    dec.write_data_port((track >> 8) & 0xFF)
    dec.write_data_port(track & 0xFF)
    return np.array(dec.next_samples(n_frames * 240), dtype=np.int16)


def test_patch_roundtrip_preserves_tracks(tmp_path):
    proto_zip = romgen.RomBuilder(_make_spec()).build_zip()
    rs_a, _ = zipload.load_zip_data(proto_zip, zip_name="a.zip")
    rs_a.check()

    spec = patch.load_prototype(rs_a)
    assert len(spec.streams) == 2
    rebuilt = romgen.RomBuilder(spec).build_zip()
    rs_b, _ = zipload.load_zip_data(rebuilt, zip_name="b.zip")
    assert rs_b.check() == 1
    assert rs_b.n_tracks == rs_a.n_tracks

    for t in (1, 2):
        a = _decode_track(rs_a, t, 40)
        b = _decode_track(rs_b, t, 40)
        assert np.array_equal(a, b), f"track {t} changed by patch round-trip"


def test_patch_script_replaces_stream(tmp_path):
    proto_zip = romgen.RomBuilder(_make_spec()).build_zip()
    proto_path = tmp_path / "proto.zip"
    proto_path.write_bytes(proto_zip)

    rs_a, _ = zipload.load_zip_data(proto_zip, zip_name="a.zip")
    rs_a.check()
    addr = rtracks.list_streams(rs_a, rs_a.os_version)[0]

    t = np.arange(8000) / 31250.0
    audioio.write_wav(tmp_path / "new.wav",
                      (9000 * np.sin(2 * np.pi * 1500 * t)).astype(np.int16))
    (tmp_path / "patch.dcss").write_text(
        f'Stream NewSound replaces ${addr:06X} "new.wav" (PowerCut=100);\n'
        f'Track $0008 channel 2 {{ SetMixingLevel($60); '
        f'Play(NewSound); Wait(stream); }};\n')

    zip_bytes, report = cscript.compile_script_file(
        str(tmp_path / "patch.dcss"), prototype_zip=str(proto_path))
    rs_b, _ = zipload.load_zip_data(zip_bytes, zip_name="b.zip")
    assert rs_b.check() == 1
    assert rs_b.n_tracks == 9

    # untouched track 2 still decodes identically
    assert np.array_equal(_decode_track(rs_a, 2, 40), _decode_track(rs_b, 2, 40))
    # track 1 (which plays the replaced stream) now differs
    assert not np.array_equal(_decode_track(rs_a, 1, 40),
                              _decode_track(rs_b, 1, 40))
    # and the new track 8 plays
    pcm = _decode_track(rs_b, 8, 30)
    assert np.abs(pcm.astype(np.int32)).max() > 500

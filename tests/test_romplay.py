"""Device ROM playback (sessions + autoplay) vs. the scalar decoder.

The scalar decoder is itself lockstep-validated against the compiled
reference (test_romgen.py), so scalar parity here extends the bit-exactness
chain to the device ROM-playback path.
"""

import numpy as np

from dcsexplorer_tpu.models import romplay
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload
from dcsexplorer_tpu.compiler import romgen

from .test_romgen import _make_spec


def _rom_set():
    zip_bytes = romgen.RomBuilder(_make_spec()).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    assert rs.check() == 1
    return rs


def _scalar_session(rs, events, n_frames, default_volume=0x67):
    dec = rd.ReferenceDecoder()
    dec.default_volume = default_volume
    dec.load_rom_set(rs)
    dec.soft_boot()
    out = []
    for f in range(n_frames):
        if f in events:
            events[f](dec)
        out.extend(dec.next_samples(240))
    return np.array(out, dtype=np.int16)


def test_device_session_matches_scalar():
    rs = _rom_set()

    def cmd(track):
        def ev(dec):
            dec.write_data_port((track >> 8) & 0xFF)
            dec.write_data_port(track & 0xFF)
        return ev

    events = {0: cmd(1), 30: cmd(2), 90: cmd(3), 95: cmd(4)}
    n = 160
    golden = _scalar_session(rs, events, n)
    got, _ = romplay.play_session(rs, events, n)
    assert np.array_equal(golden, got)
    assert np.abs(golden).max() > 0


def test_device_autoplay_matches_scalar():
    rs = _rom_set()
    pcm, schedule = romplay.autoplay(rs, tracks=[1, 2], pad_frames=3,
                                     max_frames_per_track=80)
    assert len(schedule) == 2

    events = {}
    for (t, frame, _) in schedule:
        def make_event(track):
            def ev(dec):
                dec.clear_tracks()
                dec.write_data_port((track >> 8) & 0xFF)
                dec.write_data_port(track & 0xFF)
            return ev
        events[frame] = make_event(t)
    total = pcm.size // 240
    golden = _scalar_session(rs, events, total)
    assert np.array_equal(golden, pcm)

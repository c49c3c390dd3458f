"""Script compiler: WAVs + script → ROM zip → loads, plays, validates."""

import os

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import script as cscript
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import tracks as rtracks
from dcsexplorer_tpu.rom import zipload
from dcsexplorer_tpu.utils import audioio

SCRIPT = """
// synthetic ROM build script
Signature "script test ROM <date>";

Default encoding parameters (Type=0, Subtype=0, BitRate=128000, PowerCut=100);

Stream Theme "theme.wav";
Stream Hit "hit.wav" (BitRate=96000);

Var X;

Deferred Indirect table Choices ($0001, $0002);

Track $0000 channel 0 {
    Stop(*);
};

Track $0001 channel 0 {
    SetMixingLevel($64);
    Play(Theme, repeat forever);
    Wait(forever);
};

Track $0002 channel 1 {
    SetMixingLevel($70);
    SetMixingLevel(channel 0, decrease $20, steps 0.25 sec);
    Loop (2) {
        Play(Hit);
        Wait(stream);
    }
    SetMixingLevel(channel 0, increase $20, steps 0.25 sec);
    Wait(10);
};

Track $0003 channel 2 Defer($0001);
Track $0004 channel 2 Defer Indirect(Choices[X]);

Track $0005 channel 3 {
    SetVariable(Var X, Value 1);
    StartDeferred(Channel 2);
    Wait(16ms) WriteDataPort($55);
};
"""


@pytest.fixture(scope="module")
def rom_zip_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("script")
    t = np.arange(9000) / 31250.0
    audioio.write_wav(d / "theme.wav",
                      (6000 * np.sin(2 * np.pi * 300 * t)).astype(np.int16))
    audioio.write_wav(d / "hit.wav",
                      (8000 * np.sin(2 * np.pi * 900 * t[:4000])).astype(np.int16))
    (d / "build.dcss").write_text(SCRIPT)
    zip_bytes, report = cscript.compile_script_file(str(d / "build.dcss"))
    assert "U2:" in report
    out = d / "rom.zip"
    out.write_bytes(zip_bytes)
    return str(out)


def test_script_rom_loads_and_plays(rom_zip_path):
    rs, _ = zipload.load_zip_file(rom_zip_path)
    assert rs.check() == 1
    assert rs.n_tracks == 6
    assert "script test ROM" in rs.signature()

    ti = rtracks.get_track_info(rs, rs.os_version, 1)
    assert ti.type == 1 and ti.looping
    ti4 = rtracks.get_track_info(rs, rs.os_version, 4)
    assert ti4.type == 3

    dec = rd.ReferenceDecoder()
    dec.default_volume = 255
    dec.load_rom_set(rs)
    dec.soft_boot()
    for b in (0x00, 0x01):
        dec.write_data_port(b)
    pcm = np.array(dec.next_samples(240 * 30), dtype=np.int16)
    assert np.abs(pcm.astype(np.int32)).max() > 500, "track 1 silent"

    # layered effect with fades
    for b in (0x00, 0x02):
        dec.write_data_port(b)
    pcm2 = np.array(dec.next_samples(240 * 60), dtype=np.int16)
    assert np.abs(pcm2.astype(np.int32)).max() > 500

    # deferred indirect: set var, arm, trigger → track 2 queued
    for b in (0x00, 0x04, 0x00, 0x05):
        dec.write_data_port(b)
    pcm3 = np.array(dec.next_samples(240 * 20), dtype=np.int16)
    assert 0x55 in dec.host.rx, "WriteDataPort byte not delivered"


def test_script_errors():
    with pytest.raises(cscript.ScriptError) as e:
        cscript.compile_script('Track $1 channel 0 { Play(Missing); };')
    assert "unknown stream" in str(e.value)

    with pytest.raises(cscript.ScriptError) as e:
        cscript.compile_script('Bogus $1;')
    assert "unknown statement" in str(e.value)

    with pytest.raises(cscript.ScriptError) as e:
        cscript.compile_script('Stream X replaces $2010CA "a.ogg";')
    # without a prototype import the file lookup (or the missing prototype
    # stream) must produce a clear error
    assert "not found" in str(e.value) or "prototype" in str(e.value)


def test_example_script_compiles_and_validates():
    """The committed example script (assets/example.dcss, SCRIPTING.md)
    builds a ROM that passes POST and plays bit-exactly on device."""
    import os
    import numpy as np
    from dcsexplorer_tpu.compiler import script as cscript
    from dcsexplorer_tpu.models import romplay
    from dcsexplorer_tpu.refdec import decoder as rd
    from dcsexplorer_tpu.rom import zipload

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "assets", "example.dcss")
    zip_bytes, report = cscript.compile_script_file(path)
    assert "Tracks: 5" in report
    rs, _ = zipload.load_zip_data(zip_bytes)
    assert rs.check() == 1

    pcm, sched, _ = romplay.autoplay(rs, max_frames_per_track=80,
                                     return_tracer=True)
    assert np.abs(pcm).max() > 100
    dec = rd.ReferenceDecoder()
    dec.default_volume = 0x67
    dec.load_rom_set(rs)
    dec.soft_boot()
    events = {}
    for (tno, frame, _) in sched:
        def mk(track):
            def ev(d):
                d.clear_tracks()
                d.write_data_port((track >> 8) & 0xFF)
                d.write_data_port(track & 0xFF)
            return ev
        events[frame] = mk(tno)
    golden = []
    for f in range(pcm.size // 240):
        if f in events:
            events[f](dec)
        golden.extend(dec.next_samples(240))
    assert np.array_equal(np.array(golden, dtype=np.int16), pcm)

"""Checkpoint/resume: snapshot mid-playback, restore, bit-exact continuation."""

import numpy as np
import pytest

from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload
from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.utils import state

from .test_romgen import _make_spec


def test_snapshot_resume_rom_session(tmp_path):
    zip_bytes = romgen.RomBuilder(_make_spec()).build_zip()
    rs, _ = zipload.load_zip_data(zip_bytes, zip_name="synth.zip")
    rs.check()

    dec = rd.ReferenceDecoder()
    dec.default_volume = 255
    dec.load_rom_set(rs)
    dec.soft_boot()
    for b in (0x00, 0x01):
        dec.write_data_port(b)
    dec.next_samples(240 * 10)
    for b in (0x00, 0x02):
        dec.write_data_port(b)
    dec.next_samples(240 * 5 + 77)     # stop mid-frame, mid-fade

    path = tmp_path / "ckpt.pkl"
    state.save(dec, str(path))
    expected = np.array(dec.next_samples(240 * 40), dtype=np.int16)

    dec2 = rd.ReferenceDecoder()
    dec2.load_rom_set(rs)
    state.load(dec2, str(path))
    got = np.array(dec2.next_samples(240 * 40), dtype=np.int16)
    assert np.array_equal(expected, got)
    assert np.abs(expected).max() > 0


def test_snapshot_resume_standalone(tmp_path):
    import glob, os
    assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "streams")
    stream = open(sorted(glob.glob(os.path.join(assets, "*.dcs94")))[0], "rb").read()

    dec = rd.ReferenceDecoder()
    dec.default_volume = 255
    dec.init_standalone(rd.OS94)
    dec.soft_boot()
    dec.load_audio_stream(0, stream, mixing_level=0x64)
    dec.next_samples(240 * 7 + 13)

    snap = state.snapshot(dec)
    expected = np.array(dec.next_samples(240 * 20), dtype=np.int16)

    dec2 = rd.ReferenceDecoder()
    dec2.init_standalone(rd.OS94)
    dec2.soft_boot()
    state.restore(dec2, snap, stream_mems={0: stream})
    got = np.array(dec2.next_samples(240 * 20), dtype=np.int16)
    assert np.array_equal(expected, got)


def test_emulated_snapshot_resume():
    """Emulator sessions checkpoint/resume exactly: the resumed decoder
    produces the identical sample stream from the suspension point."""
    from dcsexplorer_tpu.utils import state as dstate
    from tests.test_emu_board import make_decoder

    dec = make_decoder()
    dec.soft_boot()
    dec.next_samples(300)            # mid-frame suspension point
    dec.write_data_port(0x21)        # pending queue content survives too
    snap = dstate.snapshot_emulated(dec)

    cont = dec.next_samples(480)

    dec2 = make_decoder()
    dec2.load_rom_set(dec.rom_set)
    dstate.restore_emulated(dec2, snap)
    cont2 = dec2.next_samples(480)
    assert cont == cont2
    assert dec2.cpu.dm[0x0810] == dec.cpu.dm[0x0810]


@pytest.mark.parametrize("src_native,dst_native", [(True, False),
                                                   (False, True)])
def test_emulated_snapshot_cross_core(src_native, dst_native):
    """Snapshots move between the Python and native C++ CPU cores: the
    125-field state layout is shared, so a session suspended on one core
    resumes bit-exactly on the other."""
    from dcsexplorer_tpu.emu.board import EmulatedDecoder
    from dcsexplorer_tpu.utils import state as dstate
    from tests.test_emu_board import make_decoder

    rs = make_decoder().rom_set
    dec = EmulatedDecoder(use_native=src_native)
    if src_native and not dec.native_cpu:
        pytest.skip("native library unavailable")
    dec.default_volume = 200
    dec.load_rom_set(rs)
    dec.soft_boot()
    dec.next_samples(300)
    snap = dstate.snapshot_emulated(dec)
    cont = dec.next_samples(480)

    dec2 = EmulatedDecoder(use_native=dst_native)
    if dst_native and not dec2.native_cpu:
        pytest.skip("native library unavailable")
    dec2.default_volume = 200
    dec2.load_rom_set(rs)
    dstate.restore_emulated(dec2, snap)
    cont2 = dec2.next_samples(480)
    assert cont == cont2

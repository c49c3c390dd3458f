"""Two-backend validation on compiler-built ROMs: the emulator backend
(running the synthesized OS94 decoding firmware, compiler/firmware94.py)
must produce PCM bit-identical to the native scalar decoder from the same
ROM and command stream — the reference's core validation pattern
(reference: DCSDecoder/DCSDecoderEmu.cpp:359-395, DCSExplorer.cpp:1338-1481)
realized for generated ROM sets."""

import numpy as np
import pytest

from dcsexplorer_tpu.compiler import romgen
from dcsexplorer_tpu.emu.board import EmulatedDecoder
from dcsexplorer_tpu.encoder.encoder import CompressionParams, encode_pcm
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.rom import zipload

g = romgen


def _music(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    pcm = (7000 * np.sin(2 * np.pi * 330 * t / 31250)
           + 3000 * np.sin(2 * np.pi * 990 * t / 31250) * np.sin(2 * np.pi * 3 * t / 31250)
           + rng.normal(0, 500, n))
    return pcm.astype(np.float32)


def _build_zip(os_version=rd.OS94):
    enc_os = os_version if os_version in (rd.OS93A, rd.OS93B) else None
    s1, _ = encode_pcm(_music(2400, 1), os_version=enc_os)
    if os_version == rd.OS93A:
        # second voice exercises the Type-1 (Judge Dredd) decompressor
        from .test_format93 import build_stream93a_type1
        s2 = build_stream93a_type1(n_frames=12, n_bands=12, selector=2,
                                   seed=9)
    else:
        s2, _ = encode_pcm(_music(1700, 2),
                           CompressionParams(stream_format_type=1),
                           os_version=enc_os)
    spec = g.RomSpec(os_version=os_version, num_channels=6)
    spec.streams = {"s1": bytes(s1), "s2": bytes(s2)}
    spec.tracks = [
        g.TrackSpec(0, steps=[g.op_end()]),
        g.TrackSpec(1, channel=0, steps=[
            g.op_mix(0, 0, 0x64),
            g.op_play(0, "s1", repeat=1),
            g.op_wait_forever(),
        ]),
        g.TrackSpec(2, channel=1, steps=[
            g.op_mix(0, 1, 0x55),
            g.op_mix_fade(1, 1, 0x18, 60, delay=2),
            g.op_play(1, "s2", repeat=2, delay=1),
            g.op_wait_forever(),
        ]),
    ]
    if os_version == rd.OS93A:
        # 1993a op $04 grammar: arm the host-event timer (byte 0x42
        # re-sent every 5 frames until the track stops)
        spec.tracks[1] = g.TrackSpec(1, channel=0, steps=[
            g.op_mix(0, 0, 0x64),
            g.op_play(0, "s1", repeat=1),
            g.op_write_port93a(0x42, counter=5, delay=1),
            g.op_wait_forever(),
        ])
    return g.RomBuilder(spec).build_zip()


def _decoders(os_version=rd.OS94):
    rs, _ = zipload.load_zip_data(_build_zip(os_version))
    assert rs.check() == 1
    assert rs.os_version == os_version
    emu = EmulatedDecoder()
    nat = rd.ReferenceDecoder()
    for dec in (emu, nat):
        dec.load_rom_set(rs)
        dec.default_volume = 0xCC
        dec.soft_boot()
    assert emu.state == rd.ST_RUNNING, emu.error_message
    return emu, nat


def _drive(dec, script, n_frames):
    """script: {sample_index: [port bytes]}; returns n_frames×240 samples."""
    out = []
    total = n_frames * 240
    for k in range(total):
        if k in script:
            for b in script[k]:
                dec.write_data_port(b)
        out.append(dec.get_next_sample())
    return out


def test_emulator_decodes_audio_bit_exact():
    emu, nat = _decoders()
    script = {0: [0x00, 0x01]}
    n = 14
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")


def test_emulator_multivoice_fades_volume_bit_exact():
    emu, nat = _decoders()
    script = {
        0: [0x00, 0x01],
        240: [0x00, 0x02],                      # second voice + fade
        1200: [0x55, 0xAA, 0x70, 0x8F],         # master volume change
        2400: [0x55, 0xAC, 0x60, 0x9F],         # channel-volume command
    }
    n = 24
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n)
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")
    # host-bound data-port traffic agrees too
    assert emu.host.rx == nat.host.rx


def test_emulator_os95_board_bit_exact():
    """DCS-95 board map (hw 3): the same synthesized decoding firmware,
    rebuilt for the relocated DM map, split bank registers, and the
    DM($3300) data port (reference: DCSDecoderEmu.cpp:397-591) — emulator
    PCM must bit-match the native decoder on an OS95 compiler ROM."""
    emu, nat = _decoders(rd.OS95)
    assert emu.hw_version == 3
    script = {
        0: [0x00, 0x01],
        720: [0x00, 0x02],
        1680: [0x55, 0xAA, 0x70, 0x8F],         # master volume change
        2880: [0x55, 0xAC, 0x60, 0x9F],         # channel-volume command
    }
    n = 24
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")
    assert emu.host.rx == nat.host.rx


def test_emulator_os93b_bit_exact():
    """1993 format family: emulator PCM (synthesized firmware93 — 93
    decompressor incl. the replicated rounding anomaly + 7-iteration
    transform, reference: DCSDecoderNative.cpp:2293-2615, :614-813) must
    bit-match the native decoder on an OS93b compiler ROM."""
    emu, nat = _decoders(rd.OS93B)
    assert emu.hw_version == 2
    script = {
        0: [0x00, 0x01],
        720: [0x00, 0x02],                      # second voice + fade
        1680: [0x55, 0xAA, 0x70, 0x8F],         # master volume change
    }
    n = 24
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")
    assert emu.host.rx == nat.host.rx


def test_emulator_os93a_bit_exact():
    """OS93a: emulator PCM (synthesized firmware93 in its 93a variant —
    Type-0 AND Type-1 decompressors, 1-byte Type-1 stream headers, op $04
    host-event timers, the fixed $7FFF mixing base; reference:
    DCSDecoderNative.cpp:2687-2781, :1089-1116) must bit-match the native
    decoder on an OS93a compiler ROM, including the repeating data-port
    traffic the host-event timer generates."""
    emu, nat = _decoders(rd.OS93A)
    assert emu.hw_version == 2
    script = {
        0: [0x00, 0x01],
        720: [0x00, 0x02],                      # Type-1 voice
        1680: [0x55, 0xAA, 0x70, 0x8F],         # master volume change
    }
    n = 24
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")
    assert emu.host.rx == nat.host.rx


def test_emulator_os95_version_query_port():
    """55C2/C3 version queries reply through the DCS-95 data port."""
    emu, _ = _decoders(rd.OS95)
    for b in (0x55, 0xC2, 0x55, 0xC3):
        emu.write_data_port(b)
    for _ in range(480):
        emu.get_next_sample()
    assert bytes(emu.host.rx) == b"\x01\x06"


def test_emulator_rom_above_64kb_bit_exact():
    """Streams, track programs and deferred links placed ABOVE linear
    $10000: every firmware ROM cursor must carry the pointer's high byte
    through the bank computation.  Regression for the rd16/rd24 register
    aliasing bug — the high byte was parked in AX1, which rd16 itself
    clobbered, and DM/bank masking made the corrupted pointer alias to
    the correct address exactly when hi == 0 (so small ROMs hid it).
    Covers type-0/2/3 next-track latching too (ch*64 also lived in AX1
    across a rd16)."""
    import numpy as np
    from dcsexplorer_tpu.compiler import romgen as g

    rng = np.random.default_rng(5)
    pcm = (rng.standard_normal(240 * 12) * 8000).astype(np.int16)
    s, _ = encode_pcm(pcm)
    spec = g.RomSpec(os_version=rd.OS94, num_channels=6)
    # filler pushes everything that follows past linear $10000
    spec.streams = {
        "pad": bytes(bytearray([0, 1, 0x80, 0x80, 0x80]) + bytearray(0x10000)),
        "s": bytes(s),
    }
    spec.tracks = [
        g.TrackSpec(0, steps=[g.op_end()]),
        g.TrackSpec(1, channel=0, steps=[
            g.op_mix(0, 0, 0x64),
            g.op_play(0, "s", repeat=1),
            g.op_wait_forever(),
        ]),
        # type-2 deferred pointing at track 1 + a trigger track, so the
        # next-track latch path (channel-block addressing) is exercised
        g.TrackSpec(2, type=2, channel=1, defer_code=0x0001),
        g.TrackSpec(3, channel=2, steps=[
            g.op_start_deferred(1),
            g.op_end(),
        ]),
    ]
    rs, _ = zipload.load_zip_data(g.RomBuilder(spec).build_zip())
    assert rs.check() == 1
    assert rs.track_index_u24(1) > 0x10000, "spec must place tracks high"
    emu = EmulatedDecoder()
    nat = rd.ReferenceDecoder()
    for dec in (emu, nat):
        dec.load_rom_set(rs)
        dec.default_volume = 0x80
        dec.soft_boot()
    script = {0: [0x00, 0x02],          # latch the type-2 deferral
              240: [0x00, 0x03],        # trigger it → track 1 plays
              480: [0x00, 0x01]}
    n = 10
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")
    assert emu.host.rx == nat.host.rx


@pytest.mark.parametrize("os_version", [rd.OS94, rd.OS95])
def test_emulator_stream_on_u3_bit_exact(os_version):
    """A stream that spills onto the U3 chip: the firmware's bank writes
    must carry the chip-select bits.  On the DCS-95 board the chip select
    is linear[23:21] pieced into DM($3100) bits 4:2 (reference:
    DCSDecoderEmu.cpp:512-520) — regression for the set_bank95 off-by-one
    that selected on linear[22:20]; on the original board it rides the
    16-bit bank at DM($3000)."""
    import numpy as np
    from dcsexplorer_tpu.compiler import romgen as g
    from dcsexplorer_tpu.rom import tracks as rtracks

    rng = np.random.default_rng(6)
    # ~8KB stream: bigger than the U2 hole the pad leaves, so first-fit
    # allocation must spill it onto U3
    pcm = (rng.standard_normal(240 * 30) * 8000).astype(np.int16)
    s, _ = encode_pcm(pcm)
    spec = g.RomSpec(os_version=os_version, num_channels=6,
                     chip_size=0x20000)
    spec.streams = {
        "pad": bytes(bytearray([0, 1, 0x80, 0x80, 0x80])
                     + bytearray(0x14000)),
        "s": bytes(s),
    }
    spec.tracks = [
        g.TrackSpec(0, steps=[g.op_end()]),
        g.TrackSpec(1, channel=0, steps=[
            g.op_mix(0, 0, 0x64),
            g.op_play(0, "s", repeat=1),
            g.op_wait_forever(),
        ]),
    ]
    rs, _ = zipload.load_zip_data(g.RomBuilder(spec).build_zip())
    assert rs.check() == 1
    infos = rtracks.list_streams(rs, rs.os_version)
    shift = 21 if os_version == rd.OS95 else 20
    assert any((a >> shift) & 7 for a in infos), \
        f"spec must place the stream past U2 (got {[hex(a) for a in infos]})"
    emu = EmulatedDecoder()
    nat = rd.ReferenceDecoder()
    for dec in (emu, nat):
        dec.load_rom_set(rs)
        dec.default_volume = 0x80
        dec.soft_boot()
    script = {0: [0x00, 0x01]}
    n = 8
    pcm_e = _drive(emu, script, n)
    pcm_n = _drive(nat, script, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_e, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): emu={pcm_e[diff[0]]} nat={pcm_n[diff[0]]}")

"""Emulator fast mode ("speedup"): the firmware's transform region is
detected by opcode signature and executed natively (emu/speedup.py;
native/src/adsp2105.cpp accelRun) — the framework counterpart of the
reference's PinMame speedup patches (DCSDecoderEmu.cpp:289-325, 644-889).

Coverage:
- fast-mode PCM + data-port traffic ≡ strict mode ≡ native decoder on
  compiler ROMs for every firmware family (OS94, OS95, OS93b, OS93a);
- proof the accelerator actually fires: the firmware region is corrupted
  with TRAP opcodes after install and fast mode still decodes correctly
  (strict mode would halt inside the region);
- differential parity between the C++ region handlers and the pure-Python
  ones on randomized DM/PM states, for all four region kinds (the
  original-ROM regions, ORIG94/ORIG93, are only reachable this way since
  original commercial ROMs are not redistributable);
- detection-geometry unit tests for the original-ROM signatures
  (reference: DCSDecoderEmu.cpp:296-321).
"""

import numpy as np
import pytest

from dcsexplorer_tpu.emu import speedup
from dcsexplorer_tpu.emu.board import EmulatedDecoder
from dcsexplorer_tpu.format import tables as T
from dcsexplorer_tpu.refdec import decoder as rd
from dcsexplorer_tpu.refdec import registry
from dcsexplorer_tpu.rom import zipload

from .test_emu_decode import _build_zip, _drive


def _pair(os_version, fast_native=True):
    rs, _ = zipload.load_zip_data(_build_zip(os_version))
    assert rs.check() == 1
    fast = EmulatedDecoder(enable_speedup=True,
                           use_native=None if fast_native else False)
    nat = rd.ReferenceDecoder()
    for dec in (fast, nat):
        dec.load_rom_set(rs)
        dec.default_volume = 0xCC
        dec.soft_boot()
    assert fast.state == rd.ST_RUNNING, fast.error_message
    assert fast.speedup_info is not None
    return fast, nat


SCRIPT = {
    0: [0x00, 0x01],
    720: [0x00, 0x02],
    1680: [0x55, 0xAA, 0x70, 0x8F],             # master volume change
}


@pytest.mark.parametrize("os_version,kind", [
    (rd.OS94, speedup.KIND_SYNTH94),
    (rd.OS95, speedup.KIND_SYNTH94),
    (rd.OS93B, speedup.KIND_SYNTH93),
    (rd.OS93A, speedup.KIND_SYNTH93),
])
def test_fast_mode_bit_exact(os_version, kind):
    fast, nat = _pair(os_version)
    assert fast.speedup_info.kind == kind
    n = 20
    pcm_f = _drive(fast, SCRIPT, n)
    pcm_n = _drive(nat, SCRIPT, n)
    assert any(v != 0 for v in pcm_n), "native produced silence"
    diff = [i for i, (a, b) in enumerate(zip(pcm_f, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240}): fast={pcm_f[diff[0]]} nat={pcm_n[diff[0]]}")
    assert fast.host.rx == nat.host.rx


def test_fast_mode_bypasses_the_firmware_region():
    """Corrupt the firmware's transform region with TRAP opcodes after the
    accelerator is armed: fast mode must still decode bit-exactly because
    the region is never interpreted (strict mode would stop inside it)."""
    fast, nat = _pair(rd.OS94)
    info = fast.speedup_info
    for a in range(info.entry, info.exit):
        fast.cpu.pm[a] = 0x010000           # TRAP
    n = 10
    pcm_f = _drive(fast, {0: [0x00, 0x01]}, n)
    pcm_n = _drive(nat, {0: [0x00, 0x01]}, n)
    assert any(v != 0 for v in pcm_n)
    assert pcm_f == pcm_n


def test_fast_mode_python_core_bit_exact():
    """The Python CPU core's run-loop hook takes the same fast path."""
    fast, nat = _pair(rd.OS94, fast_native=False)
    assert not fast.native_cpu
    n = 6
    pcm_f = _drive(fast, {0: [0x00, 0x01]}, n)
    pcm_n = _drive(nat, {0: [0x00, 0x01]}, n)
    assert any(v != 0 for v in pcm_n)
    assert pcm_f == pcm_n


def test_registry_exposes_fast_backend():
    names = [r.name for r in registry.registrations()]
    assert "emulator-fast" in names
    dec = registry.create("emulator-f")
    assert isinstance(dec, EmulatedDecoder) and dec.enable_speedup


# ----------------------------------------------------------------------
# C++ ↔ Python region-handler differential parity

def _native_cpu():
    from dcsexplorer_tpu.emu.native_cpu import make_native_cpu
    cpu = make_native_cpu()
    if cpu is None:
        pytest.skip("native CPU core unavailable")
    return cpu


def _seed_tables(dm, ts, tc, tb):
    coeff = [int(v) & 0xFFFF for v in T.IFFT_COEFF]
    dm[ts:ts + 128] = coeff[:128]
    dm[tc:tc + 128] = coeff[128:]
    dm[tb:tb + 256] = [int(v) for v in T.BITREV9[:256]]


@pytest.mark.parametrize("kind,seed", [
    (speedup.KIND_SYNTH94, 3), (speedup.KIND_SYNTH94, 4),
    (speedup.KIND_SYNTH93, 5), (speedup.KIND_SYNTH93, 6),
])
def test_accel_synth_matches_python(kind, seed):
    rng = np.random.default_rng(seed)
    cpu = _native_cpu()
    dm = [0] * 0x4000
    fb, vsa, ts, tc, tb = 0x40, 0x700, 0x400, 0x480, 0x500
    _seed_tables(dm, ts, tc, tb)
    dm[fb:fb + 0x200] = [int(x) for x in
                         rng.integers(0, 0x10000, 0x200, dtype=np.uint32)]
    dm[vsa] = int(rng.integers(0, 4))
    geom = [fb, vsa, ts, tc, tb]
    ref = list(dm)
    if kind == speedup.KIND_SYNTH94:
        speedup.apply_synth94(ref, geom)
    else:
        speedup.apply_synth93(ref, geom)
    cpu.dm = dm
    cpu.accel_run(kind, geom)
    got = cpu.dm[0:0x4000]
    assert got == ref, [
        (i, got[i], ref[i]) for i in range(0x4000) if got[i] != ref[i]][:8]


@pytest.mark.parametrize("seed", [7, 8])
def test_accel_orig94_matches_python(seed):
    rng = np.random.default_rng(seed)
    cpu = _native_cpu()
    dm = [0] * 0x4000
    ram1, ram2, va = 0x1000, 0x2000, 0x1390
    coeff = [int(v) & 0xFFFF for v in T.IFFT_COEFF]
    dm[ram1:ram1 + 0x80] = coeff[:128]          # sin at +0
    dm[ram1 + 0x80:ram1 + 0x100] = coeff[128:]  # cos at +$80
    dm[ram2:ram2 + 0x100] = [int(x) for x in
                             rng.integers(0, 0x10000, 0x100, dtype=np.uint32)]
    dm[va] = int(rng.integers(0, 0x10000))
    geom = [ram1, ram2, va]
    ref = list(dm)
    speedup.apply_orig94(ref, geom)
    cpu.dm = dm
    cpu.accel_run(speedup.KIND_ORIG94, geom)
    got = cpu.dm[0:0x4000]
    assert got == ref


@pytest.mark.parametrize("seed", [9, 10])
def test_accel_orig93_matches_python(seed):
    rng = np.random.default_rng(seed)
    cpu = _native_cpu()
    dm = [0] * 0x4000
    pm = [0] * 0x4000
    fb, va, ps, pcs = 0x3800, 0x1390, 0x1700, 0x1780
    coeff = [int(v) & 0xFFFF for v in T.IFFT_COEFF]
    for k in range(128):
        pm[ps + k] = (coeff[k] << 8) | int(rng.integers(0, 256))
        pm[pcs + k] = (coeff[128 + k] << 8) | int(rng.integers(0, 256))
    dm[fb:fb + 0x200] = [int(x) for x in
                         rng.integers(0, 0x10000, 0x200, dtype=np.uint32)]
    dm[va] = int(rng.integers(0, 0x10000))
    geom = [fb, va, ps, pcs]
    ref_dm = list(dm)
    speedup.apply_orig93(ref_dm, pm, geom)
    cpu.dm = dm
    cpu.pm = pm
    cpu.accel_run(speedup.KIND_ORIG93, geom)
    got = cpu.dm[0:0x4000]
    assert got == ref_dm


# ----------------------------------------------------------------------
# original-ROM signature detection (geometry arithmetic only — original
# commercial ROM programs are not redistributable)

def test_detect_orig94_geometry():
    pm = [0] * 0x4000
    sig = 0x2B41                                # post-1994 layout (> $2000)
    pm[sig:sig + 3] = [0x000000, 0x0C0080, 0x0C2000]
    pm[sig + 0x43] = 0x800000 | (0x1234 << 4) | 4   # dm($1234) read
    info = speedup.detect(pm)
    assert info is not None and info.kind == speedup.KIND_ORIG94
    assert info.entry == sig + 3 and info.exit == sig + 0x49
    assert info.geom == [0x1000, 0x2000, 0x1234]
    # early layout (patch below $2000 → DM $0700/$3800 buffers)
    pm2 = [0] * 0x4000
    sig = 0x00E4
    pm2[sig:sig + 3] = [0x000000, 0x0C0080, 0x0C2000]
    pm2[sig + 0x43] = 0x800000 | (0x0391 << 4) | 4
    info = speedup.detect(pm2)
    assert info.geom == [0x0700, 0x3800, 0x0391]


def test_detect_orig93_geometry():
    pm = [0] * 0x4000
    sig = 0x00E4
    pm[sig:sig + 3] = [0x378FE1, 0x379002, 0x379FE3]
    pm[sig + 0x4C] = 0x800000 | (0x2345 << 4) | 4
    info = speedup.detect(pm)
    assert info is not None and info.kind == speedup.KIND_ORIG93
    assert info.entry == sig + 3 and info.exit == sig + 0x52
    assert info.geom == [0x3800, 0x2345, 0x1700, 0x1780]


def test_detect_nothing_in_plain_program():
    assert speedup.detect([0x0D02A3] * 0x200 + [0] * 0x3E00) is None


def test_fast_mode_random_command_fuzz():
    """Randomized command/volume fuzz in lockstep: the fast-mode emulator
    must track the native decoder sample-for-sample through random track
    starts, master/channel volume changes and overlapping voices on the
    full synthetic ROM (the session-fuzz shape, tests/test_session_fuzz.py,
    pointed at the speedup path)."""
    from dcsexplorer_tpu.compiler import romgen
    from .test_romgen import _make_spec

    rs, _ = zipload.load_zip_data(romgen.RomBuilder(_make_spec()).build_zip())
    assert rs.check() == 1
    fast = EmulatedDecoder(enable_speedup=True)
    nat = rd.ReferenceDecoder()
    for dec in (fast, nat):
        dec.load_rom_set(rs)
        dec.default_volume = 0x80
        dec.soft_boot()
    assert fast.speedup_info is not None

    rng = np.random.default_rng(11)
    playable = [1, 2, 4, 5, 7]
    script = {}
    f = 0
    n_frames = 160
    while f < n_frames - 4:
        kind = rng.integers(0, 10)
        if kind < 6:
            t = int(rng.choice(playable))
            byts = [(t >> 8) & 0xFF, t & 0xFF]
        elif kind < 8:
            v = int(rng.integers(0, 256))
            byts = [0x55, 0xAA, v, v ^ 0xFF]
        else:
            ch = int(rng.integers(0, 6))
            v = int(rng.integers(0, 256))
            byts = [0x55, 0xAB + ch, v, v ^ 0xFF]
        script[f * 240] = byts
        f += int(rng.integers(2, 25))

    pcm_f = _drive(fast, script, n_frames)
    pcm_n = _drive(nat, script, n_frames)
    assert any(v != 0 for v in pcm_n)
    diff = [i for i, (a, b) in enumerate(zip(pcm_f, pcm_n)) if a != b]
    assert not diff, (
        f"{len(diff)} sample mismatches, first at {diff[0]} "
        f"(frame {diff[0] // 240})")
    assert fast.host.rx == nat.host.rx

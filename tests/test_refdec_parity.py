"""Bit-exact parity: scalar Python reference decoder vs. the compiled
reference implementation (golden oracle), on streams produced by the
reference encoder.

Mirrors the reference project's validation methodology (DCSExplorer
--validate, reference: DCSExplorer/DCSExplorer.cpp:1338-1566): every PCM
sample must match exactly.
"""

import numpy as np
import pytest

from dcsexplorer_tpu.refdec.decoder import OS94, OS95, ReferenceDecoder

from . import oracle


def _require_oracle():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")


def _test_signal(seconds=0.7, seed=1234):
    rng = np.random.default_rng(seed)
    n = int(31250 * seconds)
    t = np.arange(n) / 31250.0
    sig = (6000 * np.sin(2 * np.pi * 440 * t)
           + 3000 * np.sin(2 * np.pi * 1870 * t)
           + 1500 * np.sin(2 * np.pi * 333 * t + 1.0)
           + 800 * rng.standard_normal(n))
    env = np.minimum(1.0, t * 8) * np.minimum(1.0, (t[-1] - t) * 8)
    return np.clip(sig * env, -32767, 32767).astype(np.int16)


@pytest.mark.parametrize("fmt_type,fmt_subtype", [(0, 0), (0, 3), (1, 0), (1, 3)])
def test_stream_pcm_parity_os94(fmt_type, fmt_subtype):
    _require_oracle()
    pcm = _test_signal()
    stream, n_frames = oracle.encode(pcm, fmt_type=fmt_type, fmt_subtype=fmt_subtype)

    n = (n_frames + 4) * 240

    ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=255)
    ref.load_stream(stream, channel=0, mixing_level=0x64)
    golden = ref.next_samples(n)

    mine = ReferenceDecoder()
    mine.default_volume = 255
    mine.init_standalone(OS94)
    mine.soft_boot()
    mine.load_audio_stream(0, stream, mixing_level=0x64)
    got = np.array(mine.next_samples(n), dtype=np.int16)

    mism = np.nonzero(golden != got)[0]
    assert mism.size == 0, (
        f"PCM mismatch at {mism.size} samples; first at {mism[0]}: "
        f"golden={golden[mism[0]]} got={got[mism[0]]} "
        f"(fmt {fmt_type}/{fmt_subtype})")
    assert np.abs(golden.astype(np.int32)).max() > 0, "test stream was silent"


def test_stream_info_parity():
    _require_oracle()
    pcm = _test_signal(seconds=0.3, seed=7)
    stream, n_frames = oracle.encode(pcm)

    ref = oracle.OracleDecoder(os_version=oracle.OS94)
    golden = ref.stream_info(stream)

    mine = ReferenceDecoder()
    mine.init_standalone(OS94)
    mine.soft_boot()
    got = mine.get_stream_info(np.frombuffer(stream, dtype=np.uint8))

    for k in ("n_frames", "n_bytes", "type", "subtype"):
        assert golden[k] == got[k], f"{k}: golden={golden[k]} got={got[k]}"


def test_master_volume_curve_parity():
    _require_oracle()
    pcm = _test_signal(seconds=0.25, seed=42)
    stream, n_frames = oracle.encode(pcm)
    n = n_frames * 240
    for vol in (0, 1, 37, 103, 200, 255):
        ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=vol)
        ref.load_stream(stream, channel=0, mixing_level=0x64)
        golden = ref.next_samples(n)

        mine = ReferenceDecoder()
        mine.default_volume = vol
        mine.init_standalone(OS94)
        mine.soft_boot()
        mine.load_audio_stream(0, stream, mixing_level=0x64)
        got = np.array(mine.next_samples(n), dtype=np.int16)
        assert np.array_equal(golden, got), f"volume {vol} mismatch"


def test_multi_stream_mix_parity():
    _require_oracle()
    s1, f1 = oracle.encode(_test_signal(seconds=0.4, seed=5))
    s2, f2 = oracle.encode(_test_signal(seconds=0.3, seed=9))
    n = (max(f1, f2) + 2) * 240

    ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=220)
    ref.load_stream(s1, channel=0, mixing_level=0x60)
    ref.load_stream(s2, channel=1, mixing_level=0x70)
    golden = ref.next_samples(n)

    mine = ReferenceDecoder()
    mine.default_volume = 220
    mine.init_standalone(OS94)
    mine.soft_boot()
    mine.load_audio_stream(0, s1, mixing_level=0x60)
    mine.load_audio_stream(1, s2, mixing_level=0x70)
    got = np.array(mine.next_samples(n), dtype=np.int16)
    assert np.array_equal(golden, got)

"""End-to-end device pipeline vs. the compiled reference (golden oracle).

Covers BASELINE config #1 (single-stream decode, bit-exact) and the
multi-voice + command-sequencing behavior of config #2, using streams
produced by the reference encoder.
"""

import numpy as np
import pytest

from dcsexplorer_tpu.models import pipeline

from . import oracle


def _require_oracle():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")


def _signal(seconds, seed, freq=500.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(31250 * seconds)) / 31250.0
    sig = 7000 * np.sin(2 * np.pi * freq * t) + 900 * rng.standard_normal(t.size)
    return np.clip(sig, -32000, 32000).astype(np.int16)


def test_device_pipeline_single_stream_bit_exact():
    _require_oracle()
    stream, nf = oracle.encode(_signal(0.6, seed=77))
    n_frames = nf + 4

    ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=255)
    ref.load_stream(stream, channel=0, mixing_level=0x64)
    golden = ref.next_samples(n_frames * 240)

    got = pipeline.decode_standalone([(stream, 0, 0x64)],
                                     default_volume=255, n_frames=n_frames)
    assert np.array_equal(golden.astype(np.int32), got)
    assert np.abs(golden).max() > 0


def test_device_pipeline_multi_voice_bit_exact():
    _require_oracle()
    s1, f1 = oracle.encode(_signal(0.5, seed=3, freq=440))
    s2, f2 = oracle.encode(_signal(0.35, seed=4, freq=1200))
    s3, f3 = oracle.encode(_signal(0.2, seed=5, freq=2600))
    n_frames = max(f1, f2, f3) + 3

    ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=230)
    ref.load_stream(s1, channel=0, mixing_level=0x64)
    ref.load_stream(s2, channel=1, mixing_level=0x70)
    ref.load_stream(s3, channel=3, mixing_level=0x58)
    golden = ref.next_samples(n_frames * 240)

    got = pipeline.decode_standalone(
        [(s1, 0, 0x64), (s2, 1, 0x70), (s3, 3, 0x58)],
        default_volume=230, n_frames=n_frames)
    assert np.array_equal(golden.astype(np.int32), got)


def test_device_pipeline_volume_command_mid_play():
    _require_oracle()
    stream, nf = oracle.encode(_signal(0.5, seed=11))
    n_frames = nf + 2
    switch_frame = 20

    ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=255)
    ref.load_stream(stream, channel=0, mixing_level=0x64)
    golden = np.concatenate([
        ref.next_samples(switch_frame * 240),
        # 55 AA vol ~vol master-volume command at a frame boundary
        (ref.write_data_port(0x55), ref.write_data_port(0xAA),
         ref.write_data_port(120), ref.write_data_port(120 ^ 0xFF),
         ref.next_samples((n_frames - switch_frame) * 240))[-1],
    ])

    def volume_event(dec):
        for b in (0x55, 0xAA, 120, 120 ^ 0xFF):
            dec.write_data_port(b)

    got = pipeline.decode_standalone(
        [(stream, 0, 0x64)], default_volume=255, n_frames=n_frames,
        events={switch_frame: volume_event})
    assert np.array_equal(golden.astype(np.int32), got)

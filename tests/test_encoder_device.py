"""Batched device encoder (encoder/device94.py) parity vs the numpy core.

The decision pipeline is integer-canonical (encoder/core94.py), so the
batched JAX twin must emit *byte-identical* streams for every stream in the
batch — across signal types, stream lengths (padding buckets), and
compression-parameter settings (reference semantics anchor:
DCSEncoder.cpp:784-853 format search, :1502-1621 band encoding search).
"""

import numpy as np
import pytest

from dcsexplorer_tpu.encoder import analysis
from dcsexplorer_tpu.encoder import core94 as c94
from dcsexplorer_tpu.encoder import device94 as d94
from dcsexplorer_tpu.encoder.encoder import CompressionParams, frames_from_pcm


def _ci(pcm):
    coefs = analysis.analyze_frames(frames_from_pcm(
        np.asarray(pcm, dtype=np.float32)))
    return np.clip(np.rint(coefs), -(1 << 20), 1 << 20).astype(np.int32)


def _corpus(seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(31250) / 31250.0
    sigs = []
    # dense music-like: chords + AM + noise floor
    sigs.append(6000 * np.sin(2 * np.pi * 440 * t)
                + 3000 * np.sin(2 * np.pi * 554.4 * t)
                + 2000 * np.sin(2 * np.pi * 659.3 * t) * np.sin(2 * np.pi * 3 * t)
                + 300 * rng.standard_normal(t.size))
    # broadband noise
    sigs.append(9000 * rng.standard_normal(t.size // 2))
    # near-silence with a transient click (exercises silent bands + wrap)
    s = 20 * rng.standard_normal(t.size // 3)
    s[2000:2100] += 24000 * np.hanning(100)
    sigs.append(s)
    # pure low tone (band cutoff drops most bands)
    sigs.append(12000 * np.sin(2 * np.pi * 130.8 * t[: t.size // 4]))
    # full-scale square-ish (clipping / widest codes)
    sigs.append(28000 * np.sign(np.sin(2 * np.pi * 220 * t[: t.size // 3])))
    return [np.clip(s, -32000, 32000).astype(np.float32) for s in sigs]


PARAM_SETS = [
    CompressionParams(),
    CompressionParams(stream_format_type=0),
    CompressionParams(stream_format_type=1, stream_format_subtype=0),
    CompressionParams(power_band_cutoff=1.0, target_bit_rate=256000,
                      maximum_quantization_error=2.0 / 32768.0),
    CompressionParams(target_bit_rate=48000,
                      maximum_quantization_error=40.0 / 32768.0,
                      minimum_dynamic_range=60.0 / 32768.0),
]


def test_device_batch_byte_identical():
    cis = [_ci(p) for p in _corpus()]
    for params in PARAM_SETS:
        want = [c94.encode_stream94_np(ci, params) for ci in cis]
        got = d94.encode_batch(cis, params)
        for i, (w, g) in enumerate(zip(want, got)):
            assert g == w, (i, params)


def test_device_batch_mixed_lengths():
    # streams spanning different padding buckets in ONE batch
    rng = np.random.default_rng(3)
    cis = []
    for nf in (1, 5, 63, 64, 65, 130):
        ci = rng.integers(-(1 << 14), 1 << 14,
                          size=(nf, 255)).astype(np.int32)
        cis.append(ci)
    params = CompressionParams()
    want = [c94.encode_stream94_np(ci, params) for ci in cis]
    got = d94.encode_batch(cis, params)
    assert got == want


def test_device_single_stream():
    ci = _ci(_corpus()[0])
    params = CompressionParams()
    (got,) = d94.encode_batch([ci], params)
    assert got == c94.encode_stream94_np(ci, params)

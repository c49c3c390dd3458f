"""Encoder speed vs the compiled reference encoder, measured in-suite.

The reference encoder (the oracle shim's dcs94 path: libsamplerate resample
+ the full {type × subtype} format search, DCSEncoder.cpp:784-853) is timed
on the same clip and host core as this framework's single-stream encoder
(numpy analysis + the native integer-canonical search,
native/src/encoder94.cpp).  The framework must win per-core — the round-2
verdict measured the opposite for the then-Python encoder, and this pins
the regression."""

import time

import numpy as np
import pytest

from dcsexplorer_tpu.encoder import encoder as enc

from .oracle import get_lib
from . import oracle

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="oracle unavailable")


def _clip(seconds=2.0, rate=31250):
    rng = np.random.default_rng(7)
    t = np.arange(int(rate * seconds)) / rate
    x = np.zeros_like(t)
    for f0 in (220.0, 277.2, 329.6, 440.0):
        x += 0.2 * np.sin(2 * np.pi * f0 * t)
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)
    x += 0.01 * rng.standard_normal(t.size)
    return (x / np.abs(x).max() * 0.8 * 32767).astype(np.int16)


def _best_of(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def test_encoder_beats_reference_per_core():
    pcm = _clip()
    # warm both paths (lazy table builds, JIT-free)
    oracle.encode(pcm, fmt_type=-1, fmt_subtype=-1)
    enc.encode_pcm(pcm)

    dt_ref, (s_ref, _) = _best_of(
        lambda: oracle.encode(pcm, fmt_type=-1, fmt_subtype=-1))
    dt_us, (s_us, _) = _best_of(lambda: enc.encode_pcm(pcm))

    assert len(s_us) > 0 and len(s_ref) > 0
    # ours must win per core WITH MARGIN: in practice it is ~5-10× faster,
    # and asserting ≥1.5× (not just ≤) means a silent 20% regression like
    # the round-4 canonical-analysis switch turns the test red instead of
    # quietly shrinking the headroom
    assert dt_us * 1.5 <= dt_ref, (
        f"framework {dt_us * 1e3:.1f} ms vs reference {dt_ref * 1e3:.1f} ms "
        f"on the same clip/core (need >=1.5x margin)")


def test_encoder93_beats_reference_per_core():
    """1993-family sibling: the framework's 93 encoder (numpy analysis +
    the native full-stream search/emission, native/src/encoder93.cpp,
    searching BOTH Type 0 and Type 1) vs the reference encoder's 93 path
    (DCSEncoder.cpp:2053-2476) on the same clip and core."""
    from dcsexplorer_tpu.refdec.decoder import OS93B

    pcm = _clip()
    oracle.encode(pcm, fmt_type=0, fmt_subtype=-1)
    enc.encode_pcm(pcm, os_version=OS93B)

    dt_ref, (s_ref, _) = _best_of(
        lambda: oracle.encode(pcm, fmt_type=0, fmt_subtype=-1))
    dt_us, (s_us, _) = _best_of(
        lambda: enc.encode_pcm(pcm, os_version=OS93B))

    assert len(s_us) > 0 and len(s_ref) > 0
    # in practice ~4x faster; assert the margin so a silent regression
    # turns the test red (same rationale as the 94 guard above)
    assert dt_us * 1.5 <= dt_ref, (
        f"framework 93 {dt_us * 1e3:.1f} ms vs reference "
        f"{dt_ref * 1e3:.1f} ms on the same clip/core (need >=1.5x margin)")

"""Native encoder core (native/src/encoder94.cpp) parity vs the numpy core.

The native scalar pipeline must emit byte-identical streams to
core94.encode_stream94_np's vectorized numpy implementation for every
signal/parameter combination (both are integer-canonical twins; reference
semantics anchor: DCSEncoder.cpp:784-853, 1502-1621)."""

import numpy as np
import pytest

from dcsexplorer_tpu import native
from dcsexplorer_tpu.encoder import core94 as c94
from dcsexplorer_tpu.encoder.encoder import CompressionParams

from .test_encoder_device import PARAM_SETS, _ci, _corpus

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def test_native_byte_identical_corpus():
    cis = [_ci(p) for p in _corpus(seed=11)]
    for params in PARAM_SETS:
        for i, ci in enumerate(cis):
            want = c94.encode_stream94_np(ci, params, force_numpy=True)
            got = c94.encode_stream94_np(ci, params)
            assert got == want, (i, params)


def test_native_byte_identical_random():
    rng = np.random.default_rng(5)
    params = CompressionParams()
    for _ in range(6):
        nf = int(rng.integers(1, 90))
        mag = int(rng.choice([1 << 6, 1 << 12, 1 << 20]))
        ci = rng.integers(-mag, mag, size=(nf, 255)).astype(np.int32)
        want = c94.encode_stream94_np(ci, params, force_numpy=True)
        got = c94.encode_stream94_np(ci, params)
        assert got == want

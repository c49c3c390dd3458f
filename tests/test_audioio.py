"""Audio input-path tests: FLAC decode (native/src/flac.cpp) against a
test-built FLAC writer, and the read_audio magic-byte dispatch."""

import numpy as np
import pytest

from dcsexplorer_tpu import native
from dcsexplorer_tpu.utils import audioio


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, nbits):
        v &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def ws(self, v, nbits):
        self.w(v & ((1 << nbits) - 1), nbits)

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)


def _rice(bw, vals, param):
    bw.w(0, 2)              # method 0 (4-bit rice)
    bw.w(0, 4)              # partition order 0
    bw.w(param, 4)
    for v in vals:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q = u >> param
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        bw.w(u & ((1 << param) - 1), param)


def _subframe(bw, x, bps, kind, wasted=0):
    bw.w(0, 1)                          # pad
    if wasted:
        x = [v >> wasted for v in x]
        bps -= wasted
    if kind == "constant":
        bw.w(0, 6)
    elif kind == "verbatim":
        bw.w(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.w(8 + order, 6)
    elif kind.startswith("lpc"):
        order = int(kind[-1])
        bw.w(32 + order - 1, 6)
    if wasted:
        bw.w(0, 1 * 0)                  # (flag handled below)
    # wasted-bits flag comes right after the type per spec
    # — rebuild: we must emit it before payload, so this helper writes it
    # immediately after the 6-bit type:
    if wasted:
        bw.w(1, 1)
        for _ in range(wasted - 1):
            bw.w(0, 1)
        bw.w(1, 1)
    else:
        bw.w(0, 1)

    if kind == "constant":
        bw.ws(x[0], bps)
    elif kind == "verbatim":
        for v in x:
            bw.ws(v, bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        for v in x[:order]:
            bw.ws(v, bps)
        res = []
        for i in range(order, len(x)):
            if order == 0:
                p = 0
            elif order == 1:
                p = x[i - 1]
            elif order == 2:
                p = 2 * x[i - 1] - x[i - 2]
            elif order == 3:
                p = 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3]
            else:
                p = 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4]
            res.append(x[i] - p)
        param = max(1, max((abs(int(r)).bit_length() for r in res),
                           default=1))
        param = min(param + 1, 14)
        _rice(bw, res, param)
    elif kind.startswith("lpc"):
        order = int(kind[-1])
        # integer predictor: x[i] ~= (sum coef*x[i-1-j]) >> shift
        coefs = [3, -3, 1, 0, 0][:order] if order >= 3 else [2, -1][:order]
        shift = 1
        coefs = [c << shift for c in coefs]
        for v in x[:order]:
            bw.ws(v, bps)
        bw.w(14 - 1, 4)                 # precision 14
        bw.ws(shift, 5)
        for c in coefs:
            bw.ws(c, 14)
        res = []
        for i in range(order, len(x)):
            p = sum(coefs[j] * x[i - 1 - j] for j in range(order)) >> shift
            res.append(x[i] - p)
        param = max(1, max((abs(int(r)).bit_length() for r in res),
                           default=1))
        param = min(param + 1, 14)
        _rice(bw, res, param)


def _flac_bytes(channels, rate=31250, bps=16, blocksize=192,
                kinds=("fixed2",), ch_asgn=None, wasted=0):
    """Build a FLAC file from [C][N] integer sample lists."""
    nch = len(channels)
    total = len(channels[0])
    bw = _BitW()
    bw.buf += b"fLaC"
    # STREAMINFO (last metadata block)
    bw.w(1, 1)
    bw.w(0, 7)
    bw.w(34, 24)
    bw.w(blocksize, 16)
    bw.w(blocksize, 16)
    bw.w(0, 24)
    bw.w(0, 24)
    bw.w(rate, 20)
    bw.w(nch - 1, 3)
    bw.w(bps - 1, 5)
    bw.w(total, 36)
    for _ in range(16):
        bw.w(0, 8)

    asgn = ch_asgn if ch_asgn is not None else nch - 1
    frameno = 0
    for start in range(0, total, blocksize):
        n = min(blocksize, total - start)
        bw.align()
        bw.w(0x3FFE, 14)
        bw.w(0, 1)
        bw.w(0, 1)
        bw.w(7, 4)                      # blocksize: 16-bit value - 1
        bw.w(0, 4)                      # rate from STREAMINFO
        bw.w(asgn, 4)
        bw.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.w(0, 1)
        bw.w(frameno, 8)                # UTF-8 (frameno < 0x80)
        bw.w(n - 1, 16)
        bw.w(0, 8)                      # CRC-8 (unvalidated)

        segs = [list(map(int, c[start:start + n])) for c in channels]
        if asgn == 8:                   # left/side
            segs = [segs[0], [l - r for l, r in zip(segs[0], segs[1])]]
        elif asgn == 9:                 # side/right
            segs = [[l - r for l, r in zip(segs[0], segs[1])], segs[1]]
        elif asgn == 10:                # mid/side
            s = [l - r for l, r in zip(segs[0], segs[1])]
            m = [(l + r) >> 1 for l, r in zip(segs[0], segs[1])]
            segs = [m, s]
        for c, seg in enumerate(segs):
            cbps = bps
            if (asgn == 8 and c == 1) or (asgn == 9 and c == 0) \
                    or (asgn == 10 and c == 1):
                cbps += 1
            _subframe(bw, seg, cbps, kinds[(frameno + c) % len(kinds)],
                      wasted=wasted if c == 0 else 0)
        bw.align()
        bw.w(0, 16)                     # CRC-16 (unvalidated)
        frameno += 1
    bw.align()
    return bytes(bw.buf)


def _require_native():
    if native.get_lib() is None:
        pytest.skip("native library unavailable (no compiler?)")


def _sig(n, seed, amp=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t / 75.0) + rng.normal(0, 40, n)
    return np.round(x).astype(np.int64)


def test_flac_mono_all_subframe_types():
    _require_native()
    x = _sig(1000, 1)
    for kind in ("verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
                 "fixed4", "lpc2", "lpc3"):
        data = _flac_bytes([x], kinds=(kind,))
        samples, rate, bits = native.flac_decode(data)
        assert rate == 31250 and bits == 16
        assert samples.shape == (1000, 1), kind
        assert np.array_equal(samples[:, 0], x), f"lossless fail: {kind}"


def test_flac_constant_and_wasted_bits():
    _require_native()
    x = np.full(384, -1234, dtype=np.int64)
    data = _flac_bytes([x], kinds=("constant",))
    samples, _, _ = native.flac_decode(data)
    assert np.array_equal(samples[:, 0], x)

    x4 = (_sig(384, 7) // 4) * 4        # all multiples of 4: 2 wasted bits
    data = _flac_bytes([x4], kinds=("verbatim",), wasted=2)
    samples, _, _ = native.flac_decode(data)
    assert np.array_equal(samples[:, 0], x4)


@pytest.mark.parametrize("asgn", [1, 8, 9, 10])
def test_flac_stereo_decorrelation(asgn):
    _require_native()
    l = _sig(600, 2)
    r = _sig(600, 3, amp=7000)
    data = _flac_bytes([l, r], kinds=("fixed2", "lpc2"), ch_asgn=asgn)
    samples, rate, bits = native.flac_decode(data)
    assert samples.shape == (600, 2)
    assert np.array_equal(samples[:, 0], l), f"asgn {asgn} left"
    assert np.array_equal(samples[:, 1], r), f"asgn {asgn} right"


def test_read_audio_dispatch(tmp_path):
    _require_native()
    x = _sig(500, 5)
    p = tmp_path / "t.flac"
    p.write_bytes(_flac_bytes([x], kinds=("fixed2",)))
    a, rate = audioio.read_audio(str(p))
    assert rate == 31250
    assert np.allclose(a, x.astype(np.float32) / 32768.0)

    m = tmp_path / "t.mp3"
    m.write_bytes(b"ID3\x04" + b"\x00" * 64)      # tag but no audio frames
    with pytest.raises(ValueError, match="MP3"):
        audioio.read_audio(str(m))
    # a valid MP3 decodes through the native decoder (full coverage in
    # tests/test_mp3.py)
    from .test_mp3 import _spectrum, encode_frame
    rng2 = np.random.default_rng(3)
    m.write_bytes(b"".join(encode_frame([_spectrum(rng2)])
                           for _ in range(3)))
    a, rate = audioio.read_audio(str(m))
    assert rate == 44100 and len(a) == 3 * 1152 and np.abs(a).max() > 0
    o = tmp_path / "t.ogg"
    o.write_bytes(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="Ogg"):
        audioio.read_audio(str(o))
    with pytest.raises(ValueError, match="unrecognized"):
        audioio.read_audio(b"\x01\x02\x03\x04junk")


def test_flac_malformed():
    _require_native()
    with pytest.raises(ValueError):
        native.flac_decode(b"fLaC\x00\x00")
    with pytest.raises(ValueError):
        audioio.read_flac(b"fLaC" + b"\xff" * 64)

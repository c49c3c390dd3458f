"""1993-format family: differential validation against the compiled reference.

No 93-format encoder exists in the reference (it only emits 1994+ streams),
and original 1993 ROMs are not available — so these tests synthesize
valid-random 93-format streams directly from the decode grammar (builders
below) and require bit-exact PCM parity between this framework's scalar
decoder and the compiled reference decoder for OS93a/OS93b, covering format
types 0 and 1 and the OS93a Type-1 (Judge Dredd) format.
"""

import numpy as np
import pytest

from dcsexplorer_tpu.encoder.encoder import BitWriter
from dcsexplorer_tpu.format import tables as T
from dcsexplorer_tpu.refdec.decoder import OS93A, OS93B, ReferenceDecoder

from . import oracle


def _require_oracle():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")


def _header93(fmt_type, n_bands, rng):
    """16-byte header: per-band scale codes; $7F terminates."""
    hdr = bytearray(16)
    for b in range(16):
        if b >= n_bands:
            hdr[b] = 0x7F
        else:
            scale_idx = int(rng.integers(0, 4))
            shift = int(rng.integers(9, 13))   # moderate scale factors
            stride = int(rng.integers(0, 2))
            hdr[b] = (stride << 6) | (shift << 2) | scale_idx
    if fmt_type == 1:
        hdr[0] |= 0x80
    return bytes(hdr)


def build_stream93_fmt0(n_frames=12, n_bands=6, seed=0):
    """Format type 0: per-band explicit subtype bits + 4-bit type codes."""
    rng = np.random.default_rng(seed)
    hdr = _header93(0, n_bands, rng)
    w = BitWriter()
    for _ in range(n_frames):
        reuse = False
        for b in range(n_bands):
            if hdr[b] & 0x7F == 0x7F:
                break
            if reuse:
                again = int(rng.integers(0, 2))
                w.write(again, 1)
                if again:
                    continue
                reuse = False
            # optional subtype change
            change = int(rng.integers(0, 2))
            w.write(change, 1)
            if change:
                w.write(int(rng.integers(0, 2)), 1)
            t = int(rng.integers(0, 6))        # type code 0..5
            w.write(t, 4)
            if t == 0:
                reuse = True
            else:
                width = t + 1
                for _ in range(16):
                    w.write(int(rng.integers(0, 1 << width)), width)
    body = w.bytes()
    return n_frames.to_bytes(2, "big") + hdr + body + b"\xff" * 8


def _huff93_codes():
    """Invert the 93 band-type tree: value+inversion-flag → (code, nbits)."""
    tree = np.asarray(T.HUFFTREE93)
    codes = {}

    def walk(idx, bits, nb):
        ele = int(tree[idx])
        if ele & 0x8000:
            v = ele & 0x3F
            if v < 0x1E:
                key = (v - 0x0F, False)
            else:
                key = (v - 0x2E, True)
            if key not in codes:
                codes[key] = (bits, nb)
            return
        walk(ele & 0xFF, bits << 1, nb + 1)
        walk((ele >> 8) & 0x7F, (bits << 1) | 1, nb + 1)

    e0 = int(tree[0])
    walk(e0 & 0xFF, 0, 1)
    walk((e0 >> 8) & 0x7F, 1, 1)
    return codes


def build_stream93_fmt1(n_frames=12, n_bands=6, seed=1):
    """Format type 1: Huffman-coded differential band types."""
    rng = np.random.default_rng(seed)
    hdr = _header93(1, n_bands, rng)
    codes = _huff93_codes()
    w = BitWriter()
    band_type = [0] * 16
    for f in range(n_frames):
        reuse = False
        for b in range(n_bands):
            if hdr[b] & 0x7F == 0x7F:
                break
            if reuse:
                again = int(rng.integers(0, 2))
                w.write(again, 1)
                if again:
                    continue
                reuse = False
            target = int(rng.integers(0, 6))
            delta = target - band_type[b]
            invert = bool(rng.integers(0, 2))
            if (delta, invert) not in codes:
                invert = not invert
            if (delta, invert) not in codes:
                target = band_type[b]
                delta = 0
                invert = False
            cw, nb = codes[(delta, invert)]
            w.write(cw, nb)
            band_type[b] = target
            t = band_type[b]
            if t == 0:
                reuse = True
            else:
                n_samp = (15 if (b == 0 and f >= 0 and True) else 16)
                # sample count: stride code 0 → 15 on the first band else 16;
                # stride 1 → 8 (see refdec/frames.py)
                stride = (hdr[b] & 0x7F) >> 6
                if stride:
                    n_samp = 8
                else:
                    n_samp = 15 if b == 0 else 16
                for _ in range(n_samp):
                    w.write(int(rng.integers(0, 1 << t)), t)
    body = w.bytes()
    return n_frames.to_bytes(2, "big") + hdr + body + b"\xff" * 8


def build_stream93a_type1(n_frames=10, n_bands=8, selector=0, seed=2):
    """OS93a Type 1 (Judge Dredd): 1-byte header, pair-table samples."""
    rng = np.random.default_rng(seed)
    hdr = bytes([0x80 | (selector << 5) | n_bands])
    books = np.asarray(T.OS93A_BAND_BITS_CODEBOOKS)
    base = (selector << 5) >> 1
    # invert the band-bits codebook group: bandBits → (prefix codeword, len)
    prefix = {}
    for i in range(16):
        bb, nb = int(books[base + i][0]), int(books[base + i][1])
        key = bb & 0xFFFF
        if key not in prefix:
            prefix[key] = (i >> (4 - nb), nb)
    scale_book = np.asarray(T.OS93A_SCALE_CODEBOOK)
    # a known-simple scale codeword: entry 0 → value 0, 2 bits, code 00
    w = BitWriter()
    inputs_per_band = np.asarray(T.OS93A_INPUTS_PER_BAND)
    usable = sorted(k for k in prefix if k != 0xFFFF and k <= 6)
    for _ in range(n_frames):
        for b in range(n_bands):
            bits = int(rng.choice(usable))
            cw, nb = prefix[bits]
            w.write(cw, nb)
            if bits == 0:
                continue
            w.write(0, 2)        # scale codeword: delta 0
            for _ in range(int(inputs_per_band[b])):
                w.write(int(rng.integers(0, 1 << bits)), bits)
    body = w.bytes()
    return n_frames.to_bytes(2, "big") + hdr + body + b"\xff" * 8


def _compare(stream, os_code_ref, os_code_mine, n_frames, label):
    ref = oracle.OracleDecoder(os_version=os_code_ref, default_volume=255)
    ref.load_stream(stream, channel=0, mixing_level=0x64)
    golden = ref.next_samples(n_frames * 240)

    mine = ReferenceDecoder()
    mine.default_volume = 255
    mine.init_standalone(os_code_mine)
    mine.soft_boot()
    mine.load_audio_stream(0, stream, mixing_level=0x64)
    got = np.array(mine.next_samples(n_frames * 240), dtype=np.int16)

    mism = np.nonzero(golden != got)[0]
    assert mism.size == 0, (
        f"{label}: {mism.size} PCM mismatches, first at sample {mism[0]} "
        f"(frame {mism[0] // 240}) golden={golden[mism[0]]} got={got[mism[0]]}")
    return golden


@pytest.mark.parametrize("seed", range(5))
def test_93b_fmt0_parity(seed):
    _require_oracle()
    s = build_stream93_fmt0(seed=seed)
    g = _compare(s, oracle.OS93B, OS93B, 12, f"93b fmt0 seed{seed}")
    if seed == 0:
        assert np.abs(g).max() > 0, "all-silent fuzz stream (weak test)"


@pytest.mark.parametrize("seed", range(5))
def test_93b_fmt1_parity(seed):
    _require_oracle()
    s = build_stream93_fmt1(seed=seed)
    _compare(s, oracle.OS93B, OS93B, 12, f"93b fmt1 seed{seed}")


@pytest.mark.parametrize("seed", range(5))
def test_93a_fmt0_parity(seed):
    _require_oracle()
    # OS93a decodes Type-0 streams with the common 93 handler
    s = build_stream93_fmt0(seed=seed + 50)
    _compare(s, oracle.OS93A, OS93A, 12, f"93a fmt0 seed{seed}")


@pytest.mark.parametrize("seed,selector", [(0, 0), (1, 1), (2, 2), (3, 3)])
def test_93a_type1_parity(seed, selector):
    _require_oracle()
    s = build_stream93a_type1(selector=selector, seed=seed)
    _compare(s, oracle.OS93A, OS93A, 10, f"93a type1 sel{selector}")


def _device_decode93(stream, n_frames):
    """Decode a 93 stream on the device pipeline (single voice)."""
    import jax
    import jax.numpy as jnp
    from dcsexplorer_tpu.models.pipeline import ControlTracer
    from dcsexplorer_tpu.ops import band_decode as bd
    from dcsexplorer_tpu.ops import decode93, transform as tf

    idx = decode93.prescan93(stream, 0)
    tr = ControlTracer()
    tr.default_volume = 255
    tr.init_standalone(OS93B)
    tr.soft_boot()
    tr.load_audio_stream(0, stream, mixing_level=0x64)
    tr.trace_frames(idx.n_frames)
    mix = np.zeros(idx.n_frames, dtype=np.int32)
    for t, entries in enumerate(tr.trace_entries):
        for (c, _, fidx, m) in entries:
            if c == 0 and fidx == t:
                mix[t] = m
    vol = np.asarray(tr.trace_vol_shift, dtype=np.int32)

    pool = np.frombuffer(bytes(stream) + b"\xff" * 8, dtype=np.uint8).astype(np.int32)
    wwords = bd.window_rows(jnp.asarray(pool),
                            decode93.window_words_needed(idx))
    arrays = decode93.index_arrays(idx)

    def pipe(ww, arrs, mixv, volv):
        fb = decode93.decode93_frames(ww, arrs, mixv)
        raw = tf.transform93_raw(fb, volv)
        pcm, _ = tf.overlap_resolve93(raw, jnp.zeros(16, jnp.int32))
        return pcm

    pcm = np.asarray(jax.jit(pipe)(wwords, arrays, jnp.asarray(mix),
                                   jnp.asarray(vol)))
    return (((pcm & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int16).reshape(-1)[:n_frames * 240]


@pytest.mark.parametrize("builder,seed", [
    (build_stream93_fmt0, 7), (build_stream93_fmt0, 8),
    (build_stream93_fmt1, 7), (build_stream93_fmt1, 8),
])
def test_93_device_pipeline_parity(builder, seed):
    """Device 93 decode (prescan + scan-free kernel + batched transform)
    must match the scalar decoder bit-exactly."""
    s = builder(seed=seed)
    n = 12
    mine = ReferenceDecoder()
    mine.default_volume = 255
    mine.init_standalone(OS93B)
    mine.soft_boot()
    mine.load_audio_stream(0, s, mixing_level=0x64)
    golden = np.array(mine.next_samples(n * 240), dtype=np.int16)

    got = _device_decode93(s, n)
    mism = np.nonzero(golden != got)[0]
    assert mism.size == 0, (
        f"{mism.size} mismatches, first at {mism[0]} (frame {mism[0]//240}): "
        f"scalar={golden[mism[0]]} device={got[mism[0]]}")


def _device_decode93a(stream, n_frames):
    """Decode an OS93a Type-1 stream on the device kernel (single voice)."""
    import jax
    import jax.numpy as jnp
    from dcsexplorer_tpu.models.pipeline import ControlTracer
    from dcsexplorer_tpu.ops import band_decode as bd
    from dcsexplorer_tpu.ops import decode93a, transform as tf

    idx = decode93a.prescan93a(stream, 0)
    tr = ControlTracer()
    tr.default_volume = 255
    tr.init_standalone(OS93A)
    tr.soft_boot()
    tr.load_audio_stream(0, stream, mixing_level=0x64)
    tr.trace_frames(idx.n_frames)
    mix = np.zeros(idx.n_frames, dtype=np.int32)
    for t, entries in enumerate(tr.trace_entries):
        for (c, _, fidx, m) in entries:
            if c == 0 and fidx == t:
                mix[t] = m
    vol = np.asarray(tr.trace_vol_shift, dtype=np.int32)

    pool = np.frombuffer(bytes(stream) + b"\xff" * 8,
                         dtype=np.uint8).astype(np.int32)
    wwords = bd.window_rows(jnp.asarray(pool),
                            decode93a.window_words_needed(idx))
    arrays = decode93a.index_arrays(idx)

    def pipe(ww, arrs, mixv, volv):
        fb = decode93a.decode93a_frames(ww, arrs, mixv)
        raw = tf.transform93_raw(fb, volv)
        pcm, _ = tf.overlap_resolve93(raw, jnp.zeros(16, jnp.int32))
        return pcm

    pcm = np.asarray(jax.jit(pipe)(wwords, arrays, jnp.asarray(mix),
                                   jnp.asarray(vol)))
    return (((pcm & 0xFFFF) ^ 0x8000)
            - 0x8000).astype(np.int16).reshape(-1)[:n_frames * 240]


@pytest.mark.parametrize("seed,selector", [(11, 0), (12, 1), (13, 2), (14, 3)])
def test_93a_type1_device_pipeline_parity(seed, selector):
    """Device OS93a Type-1 decode (prescan + static kernel) must match the
    compiled reference bit-exactly."""
    _require_oracle()
    n = 10
    s = build_stream93a_type1(n_frames=n, n_bands=10, selector=selector,
                              seed=seed)
    ref = oracle.OracleDecoder(os_version=OS93A, default_volume=255)
    ref.load_stream(s, channel=0, mixing_level=0x64)
    golden = ref.next_samples(n * 240)
    got = _device_decode93a(s, n)
    mism = np.nonzero(golden != got)[0]
    assert mism.size == 0, (
        f"93a-T1 device (sel={selector}): {mism.size} mismatches, first at "
        f"{mism[0]} (frame {mism[0] // 240})")


# ---------------------------------------------------------------------------
# native 93 encoder twins: the full-stream C++ path (dcs93_encode_stream),
# the numpy-precompute + C++ body path (dcs93_encode_body), and the pure-
# Python emission loop must produce byte-identical streams

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("fmt_type", [0, 1])
def test_encoder93_native_twins_byte_identical(seed, fmt_type):
    from dcsexplorer_tpu import native
    from dcsexplorer_tpu.encoder import encoder93
    from dcsexplorer_tpu.encoder.encoder import CompressionParams

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    params = CompressionParams()
    F = int(rng.integers(2, 50))
    coefs = (rng.standard_normal((F, 254))
             * float(rng.choice([10, 200, 4000, 30000])))

    s_full = encoder93.encode_stream93(coefs, fmt_type, params)

    # numpy precompute + native body emitter, then the pure-Python emission
    # loop — one try/finally around the whole patched region so BOTH
    # monkeypatches are restored even if the first leg raises
    real_stream = native.encode93_stream
    real_emit = encoder93._emit_body93
    calls = {}

    def via_native_body(q0all, F_, ft, bk, counts, band_start,
                        best_full, best_no15, allzero):
        bstart16 = np.zeros(16, dtype=np.int32)
        bstart16[:len(band_start)] = band_start
        calls["hit"] = True
        return native.encode93_body(
            q0all, ft, bk, np.asarray(counts, dtype=np.int32), bstart16,
            best_full, best_no15, allzero,
            encoder93._HUFF93_CW, encoder93._HUFF93_NB)

    try:
        native.encode93_stream = lambda *a, **k: None
        encoder93._emit_body93 = via_native_body
        s_body = encoder93.encode_stream93(coefs, fmt_type, params)
        assert calls.get("hit")
        encoder93._emit_body93 = real_emit
        s_py = encoder93.encode_stream93(coefs, fmt_type, params)
    finally:
        encoder93._emit_body93 = real_emit
        native.encode93_stream = real_stream

    assert s_full == s_body == s_py


@pytest.mark.parametrize("k", list(range(1, 9)))
def test_encoder93_long_huffman_codewords(k):
    """Regression for the BitW 32-bit accumulator overflow: force the 30-bit
    (delta=+13, invert) Type-1 band-code codeword at 8 different bit
    alignments and require the native body emitter to stay byte-identical
    to the Python twin.  Deterministic construction: frame 0 pins band 0 at
    code k (the alignment knob: 15*k sample bits shift everything after)
    and band 1 at code 1; frame 1's band 1 then drops to subtype 1 with
    code 14, a +13 delta with subtype inversion."""
    from dcsexplorer_tpu import native
    from dcsexplorer_tpu.encoder import encoder93

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    F, bands_keep = 2, 2
    counts = np.asarray(encoder93.SAMPLES93_T1, dtype=np.int32)  # [15,16,..]
    bstart = np.zeros(16, dtype=np.int32)
    bstart[1:] = np.cumsum(counts)[:15]

    q0all = np.zeros((F, 256), dtype=np.int64)
    # band 0, both frames: huge alternating values => code1 >= 15, so the
    # explicit subtype-0 code (k) always wins
    alt = np.where(np.arange(15) % 2 == 0, 9000, -9000)
    q0all[0, 0:15] = alt
    q0all[1, 0:15] = alt
    # band 1 frame 0: huge values again; best code 1 wins (delta +1, keep)
    q0all[0, 15:31] = np.where(np.arange(16) % 2 == 0, 9000, -9000)
    # band 1 frame 1: deltas of +-5000 from the entering prv_sample
    # (the last reconstructed band-0 value: +9000 clamped to 2^(k-1)-1)
    # => code1 = 14 < code0 = 15 => subtype 1, new_code 14, delta +13, invert
    a = (1 << (k - 1)) - 1
    q0all[1, 15:31] = np.where(np.arange(16) % 2 == 0, a + 5000, a)

    best_full = np.zeros((16, F), dtype=np.int32)
    best_no15 = np.zeros((16, F), dtype=np.int32)
    best_full[0, :] = best_no15[0, :] = k
    best_full[1, 0] = best_no15[1, 0] = 1
    best_full[1, 1] = best_no15[1, 1] = 15
    allzero = np.zeros((16, F), dtype=np.uint8)

    # Python twin, with the Huffman lookups recorded to prove the long
    # codeword is actually exercised
    class RecordingHuff(dict):
        def __init__(self, base):
            super().__init__(base)
            self.used = []

        def __getitem__(self, key):
            self.used.append(key)
            return super().__getitem__(key)

    rec = RecordingHuff(encoder93._HUFF93)
    real = encoder93._HUFF93
    try:
        encoder93._HUFF93 = rec
        body_py = encoder93._emit_body93(
            q0all, F, 1, bands_keep, counts.tolist(), bstart.tolist(),
            best_full, best_no15, allzero)
    finally:
        encoder93._HUFF93 = real
    assert (13, True) in rec.used, f"construction broke: used={rec.used}"
    assert max(real[key][1] for key in rec.used) == 30

    body_native = native.encode93_body(
        q0all, 1, bands_keep, counts, bstart, best_full, best_no15,
        allzero, encoder93._HUFF93_CW, encoder93._HUFF93_NB)
    assert body_native == body_py, (
        f"native/python divergence at alignment k={k}: "
        f"{body_native.hex()} vs {body_py.hex()}")


@pytest.mark.parametrize("fmt_type", [0, 1])
def test_encoder93_native_roundtrips(fmt_type):
    """The native-encoded stream decodes bit-exactly (framework decoder vs
    reference oracle) and yields real audio — the encode path changed
    engines, not the format."""
    from dcsexplorer_tpu.encoder import encoder as enc
    from dcsexplorer_tpu.encoder.encoder import CompressionParams

    _require_oracle()
    rate = 31250
    t = np.arange(rate // 2) / rate
    x = 0.5 * np.sin(2 * np.pi * 330 * t) * np.hanning(t.size)
    pcm = (x * 32767).astype(np.int16)
    params = CompressionParams()
    params.stream_format_type = fmt_type
    stream, nf = enc.encode_pcm(pcm, params, os_version=OS93B)
    assert nf > 0

    golden = _compare(stream, oracle.OS93B, OS93B, nf,
                      f"native-encoded 93b type {fmt_type}")
    assert np.abs(golden.astype(np.int32)).max() > 100

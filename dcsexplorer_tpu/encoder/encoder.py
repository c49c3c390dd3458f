"""DCS stream encoder (1994+ format family).

From-scratch design driven by the decode grammar (which this framework
implements bit-exactly): PCM → 240-sample frames with 16-sample overlap →
MXU-batched analysis transform (encoder/analysis.py) → per-band scale
selection and quantization → per-frame band-type selection (differential,
Huffman-coded) → codebook/raw bit packing.

Capability parity with the reference encoder (DCSEncoder/DCSEncoder.h:44-253):
OpenStream/WriteStream/CloseStream-style API, CompressionParams (target bit
rate, power band cutoff, max quantization error, format type/subtype search),
WAV input, resampling to 31,250 Hz.  The emitted streams are Type 0 (fixed
per-band scale codes) — decodable by this framework AND the reference
decoder, verified by round-trip tests.
"""

from dataclasses import dataclass

import numpy as np

from ..format import tables as T
from . import analysis

FRAME = 240
WIN = 256
RATE = 31250

# band layout over frame-buffer slots 1..255 (transmit dims 0..254):
# sizes 7, 8, 16×13, 32 (reference: DCSDecoderNative.cpp:1848-1850)
BAND_SIZES = np.asarray(T.BAND_OUTPUT_COUNT)
BAND_START = np.concatenate([[0], np.cumsum(BAND_SIZES)])[:16]

_SCALE_MANT = np.asarray(T.SCALE_MANTISSA)


@dataclass
class CompressionParams:
    """Quality knobs (reference: DCSEncoder.h:70-181)."""
    stream_format_type: int = 0       # 0 supported natively; -1 = auto (=0)
    stream_format_subtype: int = 0
    power_band_cutoff: float = 0.97   # fraction of RMS power to keep
    target_bit_rate: int = 128000
    maximum_quantization_error: float = 10.0 / 32768.0


# ----------------------------------------------------------------------
# codeword tables inverted from the decode tables

def _invert_codebooks():
    books = {}
    for k in range(1, 7):
        flat = np.asarray(T.CODEBOOKS[k])
        maxw = int(T.MAX_BIT_WIDTH[k])
        by_val = {}
        two_zero = None
        for i, e in enumerate(flat):
            e = int(e)
            ln, val = e >> 8, e & 0xFF
            if val & 0x80:
                if two_zero is None:
                    two_zero = (i >> (maxw - ln), ln)
            elif (val & 0x7F) not in by_val:
                by_val[val & 0x7F] = (i >> (maxw - ln), ln)
        books[k] = (by_val, two_zero)
    return books


def _invert_delta_tree():
    tree = np.asarray(T.HUFFTREE94)
    codes = {}

    def walk(node, bits, nbits):
        for b in (0, 1):
            nxt = node + (int(tree[node]) if b else 1)
            v = int(tree[nxt])
            nb = (bits << 1) | b
            if v & 0x8000:
                codes[(v & 0xFF) - 0x2E] = (nb, nbits + 1)
            else:
                walk(nxt, nb, nbits + 1)

    walk(0, 0, 0)
    return codes


_CODEBOOK_CODES = _invert_codebooks()
_DELTA_CODES = _invert_delta_tree()
DELTA_RANGE = (min(_DELTA_CODES), max(_DELTA_CODES))


class BitWriter:
    """MSB-first bit packer (counterpart of reference BitWriter,
    DCSEncoder.h:333-389)."""

    def __init__(self):
        self.chunks = []
        self.acc = 0
        self.nbits = 0

    def write(self, val, n):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.chunks.append((self.acc >> self.nbits) & 0xFF)

    def bytes(self):
        out = bytearray(self.chunks)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)


# ----------------------------------------------------------------------

def _scale_code_for(limit):
    """Smallest Type-0 scale code whose factor covers |coef| ≤ limit·q_max.

    Scale factor = mantissa[m] >> (15 - e); code = (e << 2) | m
    (reference: DCSDecoderNative.cpp:1963-1979)."""
    best = None
    for e in range(16):
        for m in range(4):
            sf = int(_SCALE_MANT[m]) >> (15 - e)
            if sf >= limit and (best is None or sf < best[0]):
                best = (sf, (e << 2) | m)
    if best is None:
        return int(_SCALE_MANT[3]), (15 << 2) | 3
    return best


def encode_frames(coefs, params: CompressionParams):
    """Quantize + pack analysis coefficients into a DCS Type-0 stream.

    coefs: [F, 255] float (±32768 domain).  Returns stream bytes.
    """
    F = coefs.shape[0]

    # --- band cutoff by cumulative per-band RMS share (reference semantics:
    # DCSEncoder.cpp:743-771 — size-normalized RMS per band; the band that
    # crosses the cutoff fraction and everything above it are discarded)
    rms = np.zeros(16)
    for b in range(16):
        s, n = BAND_START[b], BAND_SIZES[b]
        rms[b] = np.sqrt(np.mean(coefs[:, s:s + n] ** 2))
    total = rms.sum()
    bands_keep = 16
    if total > 0:
        cum = np.cumsum(rms) / total
        over = np.nonzero(cum >= params.power_band_cutoff)[0]
        if over.size:
            bands_keep = int(over[0])
    bands_keep = max(1, min(16, bands_keep))

    # --- per-band scale selection from amplitude + rate target
    # bits/sample budget from the target rate, shaped to give low bands more
    nominal_bits = params.target_bit_rate / (RATE / FRAME) / 255.0
    share = np.array([1.6, 1.5, 1.3, 1.2, 1.1, 1.0, 1.0, 0.95, 0.9, 0.9,
                      0.85, 0.85, 0.8, 0.8, 0.75, 0.7])
    widths = np.clip(np.round(nominal_bits * share), 2, 12).astype(int)

    amax = np.zeros(16)
    for b in range(16):
        s, n = BAND_START[b], BAND_SIZES[b]
        amax[b] = np.abs(coefs[:, s:s + n]).max() if b < bands_keep else 0.0

    scale_code = np.zeros(16, dtype=int)
    scale_factor = np.ones(16)
    max_err_abs = params.maximum_quantization_error * 32768.0
    for b in range(bands_keep):
        if amax[b] < 1.0:
            scale_code[b], scale_factor[b] = 0, 1.0
            continue
        w = int(widths[b])
        # quantization step = scale factor; honor the max-error parameter by
        # capping the step, widening the width if needed (≤ 15)
        qmax = (1 << (w - 1)) - 1
        step = amax[b] / qmax
        while step > 2 * max_err_abs and w < 15:
            w += 1
            qmax = (1 << (w - 1)) - 1
            step = amax[b] / qmax
        sf, code = _scale_code_for(int(np.ceil(step)))
        scale_code[b] = code
        scale_factor[b] = sf

    # --- quantize (values must also respect each chosen width's range)
    q = np.zeros((F, 255), dtype=np.int32)
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        qb = np.round(coefs[:, s:s + n] / scale_factor[b]).astype(np.int32)
        q[:, s:s + n] = qb

    # --- per-frame band type codes: bit width needed (0 = silent band).
    # capped at 14 because the delta tree encodes steps of -16..+14, so a
    # 0→15 transition would be unrepresentable in one frame
    band_type = np.zeros((F, 16), dtype=np.int32)
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        np.clip(q[:, s:s + n], -(1 << 13), (1 << 13) - 1, out=q[:, s:s + n])
        mn = q[:, s:s + n].min(axis=1)
        mx = q[:, s:s + n].max(axis=1)
        w = np.zeros(F, dtype=np.int32)
        for wi in range(1, 15):
            lo_, hi_ = -(1 << (wi - 1)), (1 << (wi - 1)) - 1
            ok = (mn >= lo_) & (mx <= hi_)
            w = np.where((w == 0) & ok, wi, w)
        silent = (mn == 0) & (mx == 0)
        band_type[:, b] = np.where(silent, 0, np.maximum(w, 1))

    # band-type deltas must stay within the Huffman tree's range; a clamped
    # (lowered) type narrows the representable sample range, so re-clip q
    lo, hi = DELTA_RANGE
    prev = np.zeros(16, dtype=np.int32)
    for f in range(F):
        d = np.clip(band_type[f] - prev, lo, hi)
        band_type[f] = np.clip(prev + d, 0, 14)
        prev = band_type[f].copy()
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        for f in range(F):
            t = int(band_type[f, b])
            if t == 0:
                q[f, s:s + n] = 0
            else:
                np.clip(q[f, s:s + n], -(1 << (t - 1)), (1 << (t - 1)) - 1,
                        out=q[f, s:s + n])

    # --- header: Type 0, subtype 0; scale codes per band; terminator
    header = bytearray(16)
    for b in range(16):
        header[b] = scale_code[b] & 0x3F if b < bands_keep else 0x7F
    if bands_keep == 16:
        pass  # all bands live; no terminator
    # subtype bits live in hdr[1]/hdr[2] high bits: 0/0 → subtype 0

    # --- pack frames
    w = BitWriter()
    prev = np.zeros(16, dtype=np.int32)
    for f in range(F):
        bt = band_type[f]
        for b in range(bands_keep):
            code, nb = _DELTA_CODES[int(bt[b] - prev[b])]
            w.write(code, nb)
        prev = bt.copy()
        for b in range(bands_keep):
            t = int(bt[b])
            if t == 0:
                continue
            s, n = BAND_START[b], BAND_SIZES[b]
            vals = q[f, s:s + n]
            if t <= 6:
                by_val, two_zero = _CODEBOOK_CODES[t]
                ref = 1 << (t - 1)
                i = 0
                while i < n:
                    v = int(vals[i])
                    if (two_zero is not None and v == 0 and i + 1 < n
                            and int(vals[i + 1]) == 0):
                        w.write(*two_zero)
                        i += 2
                        continue
                    cw, ln = by_val[(v + ref) & 0x7F]
                    w.write(cw, ln)
                    i += 1
            else:
                for v in vals:
                    w.write(int(v) & ((1 << t) - 1), t)

    body = w.bytes()
    out = bytearray()
    out += F.to_bytes(2, "big")
    out += header
    out += body
    return bytes(out)


# ----------------------------------------------------------------------

# level calibration: the decode chain at default settings (mixing level 0x64,
# master volume 255) applies a net gain to the frame-buffer coefficients; the
# encoder pre-compensates so decoded PCM matches the source at those settings
# (matching the reference encoder's level convention, verified in tests).
_DECODE_GAIN = None


def _decode_gain():
    global _DECODE_GAIN
    if _DECODE_GAIN is None:
        from ..refdec.decoder import OS94, ReferenceDecoder
        # measure through the real decoder: a stream with one known coefficient
        probe = np.zeros((8, 255), dtype=np.float32)
        probe[:, 40] = 8000.0
        params = CompressionParams()
        stream = encode_frames(probe, params)
        dec = ReferenceDecoder()
        dec.default_volume = 255
        dec.init_standalone(OS94)
        dec.soft_boot()
        dec.load_audio_stream(0, stream, mixing_level=0x64)
        pcm = np.array(dec.next_samples(8 * FRAME), dtype=np.float64)
        # reconstruct the expected unit-gain output
        fb = np.zeros((1, 255), dtype=np.float32)
        fb[0, 40] = 8000.0
        ideal = (fb @ analysis.decoder_matrix())[0]
        # skip the 16-sample overlap crossfade at the frame head
        seg = pcm[2 * FRAME + 16:3 * FRAME].astype(np.float64)
        ref = ideal[16:FRAME].astype(np.float64)
        _DECODE_GAIN = float(np.dot(seg, ref) / np.dot(ref, ref))
    return _DECODE_GAIN


def _encoder_window():
    """Complementary pre-window for frame edges.

    The decoder crossfades frame k+1's head with frame k's tail through the
    overlap coefficients w (ops/transform.py), which are NOT complementary by
    themselves.  Perfect reconstruction requires the encoder to pre-window
    each frame's first/last 16 samples with wf satisfying
        wf[j]·w[j] + wf[15-j]·w[15-j] = 1.
    We use the energy-normalized solution wf[j] = w[j] / (w[j]² + w[15-j]²),
    which satisfies the constraint exactly.
    """
    w = np.asarray(T.OVERLAP_COEFF, dtype=np.float64) / 32768.0
    return (w / (w ** 2 + w[::-1] ** 2)).astype(np.float32)


_WF = _encoder_window()


def frames_from_pcm(pcm):
    """Split PCM (float ±32768 domain) into [F, 256] overlapped frames
    (stride 240, 16-sample carry), edge-windowed, zero-padded at the tail."""
    pcm = np.asarray(pcm, dtype=np.float32)
    F = max(1, int(np.ceil(len(pcm) / FRAME)))
    padded = np.zeros(F * FRAME + 16, dtype=np.float32)
    padded[:len(pcm)] = pcm
    idx = np.arange(WIN)[None, :] + FRAME * np.arange(F)[:, None]
    frames = padded[idx].copy()
    frames[:, :16] *= _WF[None, :]
    frames[:, 240:] *= _WF[None, ::-1]
    return frames


def encode_pcm(pcm, params: CompressionParams = None, sample_rate=RATE):
    """Encode int16/float PCM into a DCS stream.  Returns (bytes, n_frames)."""
    if params is None:
        params = CompressionParams()
    pcm = np.asarray(pcm)
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32)
    if sample_rate != RATE:
        from .resample import resample
        pcm = resample(pcm, sample_rate, RATE)
    frames = frames_from_pcm(pcm)
    # level convention matches the reference encoder: coefficients are the
    # plain analysis output (decoding at master volume 255 / mixing level
    # 0x64 then plays at ≈0.48× the source level, exactly as reference-
    # encoded streams do; see tests/test_encoder.py)
    coefs = analysis.analyze_frames(frames)
    stream = encode_frames(coefs.astype(np.float32), params)
    return stream, frames.shape[0]

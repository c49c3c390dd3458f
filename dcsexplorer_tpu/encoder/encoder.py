"""DCS stream encoder (1994+ format family).

From-scratch design driven by the decode grammar (which this framework
implements bit-exactly): PCM → 240-sample frames with 16-sample overlap →
MXU-batched analysis transform (encoder/analysis.py) → per-band scale
selection and quantization → per-frame band-type selection (differential,
Huffman-coded) → codebook/raw bit packing.

Capability parity with the reference encoder (DCSEncoder/DCSEncoder.h:44-253):
OpenStream/WriteStream/CloseStream-style API, CompressionParams (target bit
rate, power band cutoff, dynamic-range floor, max quantization error), WAV
input, resampling to 31,250 Hz, and the full stream-format search — both
major types (0 = direct bit widths, 1 = per-band translation tables with
scale-code pre-adjustments) × both subtypes (0/3), keeping the smallest
encoding (reference: DCSEncoder.cpp:784-853).  Every emitted format decodes
bit-exactly in this framework's scalar and TPU decoders AND in the compiled
reference decoder (tests/test_encoder.py).
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
    stream_format_type: int = -1      # 0/1, or -1 = try both, keep smallest
    stream_format_subtype: int = -1   # 0/3, or -1 = try both, keep smallest
    power_band_cutoff: float = 0.97   # fraction of RMS power to keep
    target_bit_rate: int = 128000
    minimum_dynamic_range: float = 10.0 / 32768.0
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

# array forms for the vectorized packer: LUT[bw, value] → codeword/bits,
# the per-book two-zero codeword, and the delta tree over its range
_CB_LUT_CODE = np.zeros((7, 64), dtype=np.int64)
_CB_LUT_BITS = np.zeros((7, 64), dtype=np.int64)
_CB_TZ_CODE = np.zeros(7, dtype=np.int64)
_CB_TZ_BITS = np.zeros(7, dtype=np.int64)
for _k, (_bv, _tz) in _CODEBOOK_CODES.items():
    for _v, (_c, _nb) in _bv.items():
        _CB_LUT_CODE[_k, _v] = _c
        _CB_LUT_BITS[_k, _v] = _nb
    if _tz is not None:
        _CB_TZ_CODE[_k], _CB_TZ_BITS[_k] = _tz
_DELTA_VAL_ARR = np.zeros(DELTA_RANGE[1] - DELTA_RANGE[0] + 1, np.int64)
_DELTA_BITS_ARR = np.zeros_like(_DELTA_VAL_ARR)
for _d, (_c, _nb) in _DELTA_CODES.items():
    _DELTA_VAL_ARR[_d - DELTA_RANGE[0]] = _c
    _DELTA_BITS_ARR[_d - DELTA_RANGE[0]] = _nb


def _pack_bits(values, bits):
    """MSB-first pack of variable-width symbols (bits == 0 emits nothing);
    bit-identical to feeding each (value, width) through BitWriter."""
    values = np.asarray(values, dtype=np.int64).reshape(-1)
    bits = np.asarray(bits, dtype=np.int64).reshape(-1)
    total = int(bits.sum())
    if total == 0:
        return b""
    reps = np.repeat(np.arange(bits.size), bits)
    offs = np.concatenate([[0], np.cumsum(bits)[:-1]])
    k = np.arange(total) - offs[reps]
    shift = bits[reps] - 1 - k
    bitarr = ((values[reps] >> shift) & 1).astype(np.uint8)
    return np.packbits(bitarr).tobytes()


class BitWriter:
    """MSB-first bit packer (counterpart of reference BitWriter,
    DCSEncoder.h:333-389)."""

    def __init__(self):
        self.chunks = []
        self.acc = 0
        self.nbits = 0

    def write(self, val, n):
        acc = (self.acc << n) | (val & ((1 << n) - 1))
        nbits = self.nbits + n
        chunks = self.chunks
        while nbits >= 8:
            nbits -= 8
            chunks.append((acc >> nbits) & 0xFF)
        # keep only the unflushed residue (an unbounded accumulator would
        # make packing O(N^2) in the stream length)
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

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


# the decoder's scale-factor rule: factor(code) = mantissa[code&3] >>
# (15 - ((code>>2) & 0xF)); using it directly (wrap semantics included)
# guarantees the encoder and decoder always agree on the factor
def _scale_factor(code):
    return int(_SCALE_MANT[code & 3]) >> (15 - ((code >> 2) & 0xF))


_SCALE64 = [_scale_factor(j) for j in range(64)]

# fixed psychoacoustic bit-allocation curve (reference: DCSEncoder.cpp:884)
_BAND_SHARE = [16, 14, 12, 10, 9, 8, 6, 5, 4, 4, 3, 3, 3, 3, 2, 2]

_XLATS = [np.asarray(T.XLAT02), np.asarray(T.XLAT35), np.asarray(T.XLAT6F)]


def _xlat_for(band):
    return _XLATS[0 if band < 3 else 1 if band < 6 else 2]


def _band_coding(band, code, fmt_type, hdr_scale, preadj):
    """Interpret a band-type code → (bit_width, effective scale code).

    Type 0: the code IS the bit width; the header scale applies directly.
    Type 1: the code indexes a per-band-group table giving the width and a
    scale-code adjustment; bands 0-2 add a pre-adjustment derived from the
    previous frame's code (reference: DCSEncoder.cpp:1840-1925).
    """
    if code == 0:
        return 0, 0
    if fmt_type == 0:
        return code, hdr_scale
    row = _xlat_for(band)[code]
    width = int(row[0])
    adj = int(row[1]) + (preadj if band < 3 else 0)
    return width, hdr_scale + adj


def _band_err_tables(coefs_band, band, fmt_type, hdr_scale, preadj_values):
    """Round-trip squared-error per (frame, code[, preadj]) for one band.

    Mirrors the reference's FindBestBandEncoding round trip
    (DCSEncoder.cpp:1502-1572): quantize by the code's scale factor, bias to
    the width's midpoint, wrap by the width mask, reconstruct, accumulate
    squared error.  Returns err[F, 16, P] and width[16] arrays.
    """
    F = coefs_band.shape[0]
    P = len(preadj_values)
    err = np.zeros((F, 16, P))
    width = np.zeros((16, P), dtype=np.int32)
    for c in range(1, 16):
        for pi, p in enumerate(preadj_values):
            w, sc = _band_coding(band, c, fmt_type, hdr_scale, p)
            width[c, pi] = w
            if w == 0:
                err[:, c, pi] = np.sum(coefs_band ** 2, axis=1)
                continue
            scale = float(max(_scale_factor(sc), 1))
            ref = 1 << (w - 1)
            mask = (1 << w) - 1
            stored = (np.round(coefs_band / scale).astype(np.int64) + ref) \
                & mask
            recon = (stored - ref) * scale
            err[:, c, pi] = np.sum((recon - coefs_band) ** 2, axis=1)
    return err, width


def _encode_stream(coefs, fmt_type, sub_type, params: CompressionParams):
    """Quantize + pack analysis coefficients into one specific stream
    format.  coefs: [F, 255] float (±32768 domain).  Returns stream bytes.
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

    # --- per-band header scale codes from the bit-rate allocation
    # (reference: DCSEncoder.cpp:876-956)
    bits_per_frame = params.target_bit_rate / (RATE / FRAME)
    share_norm = sum(_BAND_SHARE[b] * int(BAND_SIZES[b])
                     for b in range(bands_keep))
    hdr_scale = [0] * 16
    for b in range(bands_keep):
        bits_b = int(_BAND_SHARE[b] / share_norm * bits_per_frame)
        s, n = BAND_START[b], BAND_SIZES[b]
        full = float(np.abs(coefs[:, s:s + n]).max()) if F else 0.0
        target = int(np.ceil(full / (1 << bits_b))) if full > 0 else 1
        code = 0
        for j in range(64):
            if _SCALE64[j] < target:
                code = j
            else:
                break
        if fmt_type == 1:
            # re-center so the type-1 tables' 6-bit encodings land near the
            # type-0 target (reference: DCSEncoder.cpp:931-955)
            adjust = (0x0D if b < 3 else 0x17) + (1 if sub_type == 0 else 3)
            code = max(0, code - adjust)
        hdr_scale[b] = code

    # --- stream header: per-band scale codes, $FF terminator for unused
    # bands, type bit in [0], subtype bits in [1]/[2]
    header = bytearray(16)
    for b in range(16):
        header[b] = hdr_scale[b] if b < bands_keep else 0xFF
    if fmt_type != 0:
        header[0] |= 0x80
    header[1] |= (sub_type & 0x02) << 6
    header[2] |= (sub_type & 0x01) << 7

    # --- precompute per-band round-trip error tables
    preadj_map = np.asarray(T.PREADJ0 if sub_type == 0 else T.PREADJ3)
    preadj_values = sorted(set(int(x) for x in preadj_map)) \
        if fmt_type == 1 else [0]
    pa_index = {p: i for i, p in enumerate(preadj_values)}
    err_tabs, width_tabs = [], []
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        pv = preadj_values if (fmt_type == 1 and b < 3) else [preadj_values[0]]
        e, wd = _band_err_tables(coefs[:, s:s + n], b, fmt_type,
                                 hdr_scale[b], pv)
        err_tabs.append(e)
        width_tabs.append(wd)

    min_rng = params.minimum_dynamic_range * 2 * 32768.0
    err_max_per_sample = (params.maximum_quantization_error * 32768.0) ** 2

    # --- band-type selection, vectorized over frames.  The delta-range
    # constraint [prev-16, prev+14] ∩ [1,15] equals 1..15 for any prev ≥ 1
    # and 1..14 for prev = 0, so per (band, preadj) we precompute the best
    # code under both candidate sets and the cheap sequential pass merely
    # picks by the previous frame's code.
    def _best_codes(errs, widths, n, hi_code):
        # errs [F, 16, P], widths [16, P] → best [F, P]
        cand = np.zeros(16, dtype=bool)
        cand[1:hi_code + 1] = True
        thr = err_max_per_sample * n
        pass_ = (errs <= thr) & cand[None, :, None]
        wb = np.where(cand[:, None], widths, 99)[None]
        wpass = np.where(pass_, wb, 99)
        wmin = wpass.min(axis=1, keepdims=True)
        has_pass = wmin < 99
        pool = np.where(has_pass, pass_ & (wb == wmin), cand[None, :, None])
        merr = np.where(pool, errs, np.inf)
        return merr.argmin(axis=1)

    codes = np.zeros((F, 16), dtype=np.int64)
    padj_of = np.zeros((F, 16), dtype=np.int64)   # chosen preadj per frame
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        seg = coefs[:, s:s + n]
        silent = (seg.max(axis=1) - seg.min(axis=1)) < min_rng
        best15 = _best_codes(err_tabs[b], width_tabs[b], n, 15)   # [F, P]
        best14 = _best_codes(err_tabs[b], width_tabs[b], n, 14)
        sil = silent.tolist()
        b15 = best15.tolist()
        b14 = best14.tolist()
        dep = fmt_type == 1 and b < 3
        pmap = preadj_map.tolist()
        prev_c = 0
        col = codes[:, b]
        pcol = padj_of[:, b]
        for f in range(F):
            if sil[f]:
                c = 0
                pi = pa_index[pmap[prev_c]] if dep else 0
            else:
                pi = pa_index[pmap[prev_c]] if dep else 0
                c = b14[f][pi] if prev_c == 0 else b15[f][pi]
            col[f] = c
            pcol[f] = pmap[prev_c] if dep else 0
            prev_c = c

    # --- packing (frame-major, as the decoder reads it).  Fully
    # vectorized: one [F, C] symbol matrix — the per-frame delta codes
    # followed by every band's sample slots in band order — flattened
    # row-major IS the global emission order, with zero-width symbols
    # (skipped bands, paired-zero shadows) contributing no bits.
    prev_rows = np.vstack([np.zeros((1, 16), np.int64), codes[:-1]])
    deltas = (codes - prev_rows)[:, :bands_keep]
    parts_v = [_DELTA_VAL_ARR[deltas - DELTA_RANGE[0]]]
    parts_b = [_DELTA_BITS_ARR[deltas - DELTA_RANGE[0]]]
    pv_arr = np.asarray(preadj_values)
    for b in range(bands_keep):
        s, n = BAND_START[b], BAND_SIZES[b]
        # (code, preadj) → (width, scale) as a small LUT instead of one
        # _band_coding call per frame
        P = len(preadj_values)
        bw_lut = np.zeros((16, P), dtype=np.int64)
        sf_lut = np.zeros((16, P), dtype=np.float64)
        for c in range(16):
            for pi, pvv in enumerate(preadj_values):
                bw_lut[c, pi], sc_c = _band_coding(b, c, fmt_type,
                                                   hdr_scale[b], pvv)
                sf_lut[c, pi] = max(_scale_factor(int(sc_c)), 1)
        pidx = np.searchsorted(pv_arr, padj_of[:, b])
        bw = bw_lut[codes[:, b], pidx]
        scale = sf_lut[codes[:, b], pidx]
        q = np.round(coefs[:, s:s + n] / scale[:, None]).astype(np.int64)
        ref = np.where((bw >= 1) & (bw <= 6), 1 << np.maximum(bw - 1, 0), 0)
        mask = (1 << np.maximum(bw, 1)) - 1
        vals = (q + ref[:, None]) & mask[:, None]

        live = ((codes[:, b] != 0) & (bw != 0))[:, None]    # band emits
        is_cb = ((bw >= 1) & (bw <= 6))[:, None]
        bwc = np.clip(bw, 0, 6)

        # greedy left-to-right zero pairing, closed form: within each
        # maximal zero run, pair heads sit at even run offsets
        zero = (q == 0) & is_cb & live & (_CB_TZ_BITS[bwc] > 0)[:, None]
        col = np.arange(n)[None, :]
        starts = zero & ~np.concatenate(
            [np.zeros((F, 1), bool), zero[:, :-1]], axis=1)
        run_start = np.maximum.accumulate(np.where(starts, col, -1), axis=1)
        offset = col - run_start
        next_zero = np.concatenate(
            [zero[:, 1:], np.zeros((F, 1), bool)], axis=1)
        pair_head = zero & (offset % 2 == 0) & next_zero
        shadow = np.concatenate(
            [np.zeros((F, 1), bool), pair_head[:, :-1]], axis=1)

        cb_code = _CB_LUT_CODE[bwc[:, None], vals & 63]
        cb_bits = _CB_LUT_BITS[bwc[:, None], vals & 63]
        code = np.where(is_cb, cb_code, vals)
        bits = np.where(is_cb, cb_bits, bw[:, None])
        code = np.where(pair_head, _CB_TZ_CODE[bwc][:, None], code)
        bits = np.where(pair_head, _CB_TZ_BITS[bwc][:, None], bits)
        bits = np.where(live & ~shadow, bits, 0)
        parts_v.append(code)
        parts_b.append(bits)

    body = _pack_bits(np.concatenate(parts_v, axis=1),
                      np.concatenate(parts_b, axis=1))
    out = bytearray()
    out += F.to_bytes(2, "big")
    out += header
    out += body
    return bytes(out)


def encode_frames(coefs, params: CompressionParams):
    """Encode analysis coefficients, searching the requested stream formats
    and keeping the smallest result — {type 0,1} × {subtype 0,3}, with -1 as
    a wildcard (reference: DCSEncoder.cpp:784-853)."""
    formats = [(0, 0), (0, 3), (1, 0), (1, 3)]
    want_t = params.stream_format_type
    want_s = params.stream_format_subtype
    best = None
    for (t, s) in formats:
        if (want_t >= 0 and want_t != t) or (want_s >= 0 and want_s != s):
            continue
        stream = _encode_stream(coefs, t, s, params)
        if best is None or len(stream) < len(best):
            best = stream
    if best is None:
        raise ValueError(
            "No available stream format types match the requested "
            "encoding parameters")
    return best


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


def encode_pcm(pcm, params: CompressionParams = None, sample_rate=RATE,
               os_version=None):
    """Encode int16/float PCM into a DCS stream.  Returns (bytes, n_frames).

    os_version selects the format family (refdec.decoder OS constants):
    OS94/OS95 (default) → the 1994+ codec with the type/subtype search;
    OS93A/OS93B → the 1993 codec (reference: formatVersion 0x9300/0x9301).
    """
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
    from ..refdec.decoder import OS93A, OS93B
    if os_version in (OS93A, OS93B):
        from . import encoder93
        coefs93 = analysis.analyze_frames93(frames)
        want_t = params.stream_format_type
        types = [0] if os_version == OS93A and want_t < 0 else \
            [t for t in (0, 1) if want_t < 0 or want_t == t]
        best = None
        for t in types:
            s = encoder93.encode_stream93(coefs93.astype(np.float64), t,
                                          params,
                                          os93a=(os_version == OS93A))
            if best is None or len(s) < len(best):
                best = s
        if best is None:
            raise ValueError(
                "No available stream format types match the requested "
                "encoding parameters")
        return best, frames.shape[0]
    coefs = analysis.analyze_frames(frames)
    stream = encode_frames(coefs.astype(np.float32), params)
    return stream, frames.shape[0]


def encode_files(jobs, params: CompressionParams = None, os_version=None,
                 workers=None):
    """Encode many PCM buffers in parallel (data parallel over files,
    each running the format-candidate search; SURVEY.md §2.5).

    jobs: list of (pcm, sample_rate).  Returns list of (stream, n_frames)
    in order.  workers defaults to the CPU count.
    """
    import concurrent.futures as cf
    import multiprocessing as _mp
    import os as _os
    if params is None:
        params = CompressionParams()
    workers = workers or min(len(jobs), _os.cpu_count() or 1)
    if workers <= 1 or len(jobs) <= 1:
        return [encode_pcm(p, params, sample_rate=r, os_version=os_version)
                for (p, r) in jobs]
    # spawn, not fork: the parent may hold JAX's thread pools, and forking
    # a multithreaded process can deadlock the children
    ctx = _mp.get_context("spawn")
    with cf.ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as ex:
        futs = [ex.submit(encode_pcm, p, params, r, os_version)
                for (p, r) in jobs]
        return [f.result() for f in futs]


def _decode_stream_pcm(stream, os_version):
    """Decode a raw stream through the scalar runtime at master volume 255 /
    mixing level 0x64 (the standalone nominal playback level)."""
    from ..refdec.decoder import ReferenceDecoder
    dec = ReferenceDecoder()
    dec.default_volume = 255
    dec.init_standalone(os_version)
    dec.soft_boot()
    dec.load_audio_stream(0, bytes(stream), mixing_level=0x64)
    nf = (stream[0] << 8) | stream[1]
    return np.array(dec.next_samples(nf * 240), dtype=np.float64)


_GAIN_CACHE = {}


def _playback_gain(os_version):
    """End-to-end gain of the scalar runtime at volume 255 / mixing 0x64
    (≈0.48; the encoder itself is level-transparent, so the composite
    encode→decode gain isolates the decode side).  Measured once per format
    family with a short sine and cached."""
    if os_version not in _GAIN_CACHE:
        t = np.arange(240 * 8, dtype=np.float64) / RATE
        src = (8000.0 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
        stream, nf = encode_pcm(src, CompressionParams(),
                                os_version=os_version)
        out = _decode_stream_pcm(stream, os_version)[:src.size]
        _GAIN_CACHE[os_version] = (
            float(np.dot(out, src)) / max(float(np.dot(src, src)), 1e-9))
    return _GAIN_CACHE[os_version]


def transcode_stream(stream, src_os, dst_os, params: CompressionParams = None):
    """Re-encode a raw DCS stream into another format family, keeping the
    playback level (counterpart of the reference's automatic re-encode of
    .dcs inputs whose format version mismatches the target ROM's,
    DCSEncoder.cpp:358-589 EncodeDCSFile).  Returns (stream, n_frames)."""
    if params is None:
        params = CompressionParams()
    pcm = _decode_stream_pcm(stream, src_os)
    g = _playback_gain(src_os)
    return encode_pcm((pcm / max(g, 1e-9)).astype(np.float32), params,
                      os_version=dst_os)

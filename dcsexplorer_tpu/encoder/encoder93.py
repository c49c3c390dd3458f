"""1993-format stream encoder (OS93a Type 0, OS93b Type 0 and Type 1).

Counterpart of the reference's CompressFrame93b (reference:
DCSEncoder.cpp:2053-2476) driven by this framework's 93 decode grammar
(refdec/frames.py:185-306):

 - per band: three candidate codings — direct samples (subtype 0), deltas
   from the previous input (subtype 1), deltas of deltas (subtype 2, Type 0
   streams only) — with the narrowest acceptable bit width winning;
 - band types are explicit 4-bit codes (Type 0, width = code + 1) or
   frame-to-frame Huffman deltas (Type 1, width = code) where the choice of
   "keep" vs "invert" codeword doubles as the subtype toggle;
 - a band type of 0 enables the 1-bit repeat coding for runs of empty bands;
 - the prv-input/prv-delta state carries ACROSS bands in their unscaled
   integer domain, exactly as the decoder tracks it.

OS93a Type 1 (the Judge Dredd pair-table format) has no encoder, matching
the reference, which also declines to encode it (DCSEncoder.cpp:811-819).

Slots 0/1 of the frame buffer are never transmitted (see
analysis.LIVE_SLOTS93): they feed the decoder's nonlinear element-0
magnitude fixup, and leaving them at zero keeps the analysis linear.
"""

import numpy as np

from ..format import tables as T
from .encoder import BitWriter, CompressionParams, _BAND_SHARE, _scale_factor

RATE = 31250
FRAME = 240

SAMPLES93_T0 = [16] * 16
SAMPLES93_T1 = [15] + [16] * 15


def _huff93_codes():
    """Invert the 93 band-type tree: (delta, invert_subtype) → (code, nbits).

    Leaf values < 0x1E carry deltas −15..+14 with the subtype kept;
    values ≥ 0x1E carry deltas −16..+15 with the subtype inverted
    (refdec/frames.py:165-182)."""
    tree = np.asarray(T.HUFFTREE93)
    codes = {}

    def walk(idx, bits, nb):
        ele = int(tree[idx])
        if ele & 0x8000:
            v = ele & 0x3F
            key = (v - 0x0F, False) if v < 0x1E else (v - 0x2E, True)
            if key not in codes:
                codes[key] = (bits, nb)
            return
        walk(ele & 0xFF, bits << 1, nb + 1)
        walk((ele >> 8) & 0x7F, (bits << 1) | 1, nb + 1)

    e0 = int(tree[0])
    walk(e0 & 0xFF, 0, 1)
    walk((e0 >> 8) & 0x7F, 1, 1)
    return codes


_HUFF93 = _huff93_codes()


def _huff93_arrays():
    """Flatten the (delta, invert) → (code, nbits) map into the native
    body encoder's table layout: idx = invert*32 + delta + 16."""
    cw = np.full(64, 0, dtype=np.int32)
    nb = np.full(64, -1, dtype=np.int32)
    for (delta, invert), (code, nbits) in _HUFF93.items():
        idx = (32 if invert else 0) + delta + 16
        cw[idx] = code
        nb[idx] = nbits
    return cw, nb


_HUFF93_CW, _HUFF93_NB = _huff93_arrays()


def _delta_band_code(vals, fmt_type):
    """Narrowest band code whose 2's-complement width fits all values."""
    hi = max(max(vals), -min(vals)) if len(vals) else 0
    if hi == 0:
        return 0
    nbits = 1
    while hi != 0:
        hi >>= 1
        nbits += 1
    return nbits - (1 if fmt_type == 0 else 0)


def encode_stream93(coefs, fmt_type, params: CompressionParams,
                    os93a=False):
    """Encode [F, 254] coefficients (fb slots 2..255) into a 93 stream.

    fmt_type 0 → explicit band types (all OS93 software); fmt_type 1 →
    Huffman-delta band types (OS93b / STTNG only).
    """
    if os93a and fmt_type == 1:
        raise ValueError(
            "No encoder is available for OS93a Type 1 streams (the reference "
            "encoder declines them as well)")
    F = coefs.shape[0]
    counts = SAMPLES93_T0 if fmt_type == 0 else SAMPLES93_T1

    # transmit-position layout: position 0 ↔ fb slot 1 (zeroed), positions
    # k ↔ slot k+1; slot 256 (type 0 only) is dead and zeroed
    tx = np.zeros((F, 256), dtype=np.float64)
    tx[:, 1:255] = coefs

    band_start = np.concatenate([[0], np.cumsum(counts)])[:16]

    # --- band cutoff by RMS share (same policy as the 94 encoder)
    rms = np.zeros(16)
    for b in range(16):
        s, n = band_start[b], counts[b]
        rms[b] = np.sqrt(np.mean(tx[:, s:s + n] ** 2))
    total = rms.sum()
    bands_keep = 16
    if total > 0:
        cum = np.cumsum(rms) / total
        over = np.nonzero(cum >= params.power_band_cutoff)[0]
        if over.size:
            bands_keep = int(over[0])
    bands_keep = max(1, min(16, bands_keep))

    # --- header scale codes from the bit-rate allocation
    bits_per_frame = params.target_bit_rate / (RATE / FRAME)
    share_norm = sum(_BAND_SHARE[b] * counts[b] for b in range(bands_keep))
    hdr_scale = [0] * 16
    for b in range(bands_keep):
        bits_b = int(_BAND_SHARE[b] / share_norm * bits_per_frame)
        s, n = band_start[b], counts[b]
        full = float(np.abs(tx[:, s:s + n]).max()) if F else 0.0
        target = int(np.ceil(full / (1 << bits_b))) if full > 0 else 1
        code = 0
        for j in range(64):
            if _scale_factor(j) < target:
                code = j
            else:
                break
        hdr_scale[b] = code

    header = bytearray(16)
    for b in range(16):
        header[b] = hdr_scale[b] if b < bands_keep else 0xFF
    if fmt_type != 0:
        header[0] |= 0x80

    max_err = params.maximum_quantization_error * 32768.0

    from .. import native
    bstart16 = np.zeros(16, dtype=np.int32)
    bstart16[:len(band_start)] = band_start
    counts16 = np.asarray(counts, dtype=np.int32)
    scales16 = np.asarray(
        [float(max(_scale_factor(c), 1)) for c in hdr_scale], np.float64)
    body = native.encode93_stream(tx, fmt_type, bands_keep, counts16,
                                  bstart16, scales16, max_err,
                                  _HUFF93_CW, _HUFF93_NB)
    if body is not None:
        out = bytearray()
        out += F.to_bytes(2, "big")
        out += header
        out += body
        return bytes(out)

    # --- per-band precomputation, vectorized over frames: the quantized
    # samples and the subtype-0 candidate search.  Widths grow strictly
    # with the code, so "narrowest passing width then lowest error" is
    # simply the lowest passing code (else the first min-error code);
    # the Type-1 delta-range constraint only ever excludes code 15
    # (when the previous frame's code was 0 under the 'keep' family).
    q0all = np.zeros((F, 256), dtype=np.int64)
    best_full = np.zeros((16, F), dtype=np.int32)
    best_no15 = np.zeros((16, F), dtype=np.int32)
    allzero = np.zeros((16, F), dtype=np.uint8)
    for b in range(bands_keep):
        s, n = band_start[b], counts[b]
        seg = tx[:, s:s + n]
        scale = float(max(_scale_factor(hdr_scale[b]), 1))
        q0 = np.round(seg / scale).astype(np.int64)
        q0all[:, s:s + n] = q0
        allzero[b] = ~np.any(q0, axis=1)
        widths = np.arange(1, 16) + (1 if fmt_type == 0 else 0)
        ref = 1 << (widths - 1)
        mask = (1 << widths) - 1
        stored = (q0[:, :, None] + ref[None, None]) & mask[None, None]
        recon = (stored - ref[None, None]) * scale
        err = np.sum((recon - seg[:, :, None]) ** 2, axis=1)      # [F, 15]
        ok = err <= max_err * max_err * n

        def pick(okc, errc):
            any_ok = okc.any(axis=1)
            first_ok = okc.argmax(axis=1)
            return np.where(any_ok, first_ok, errc.argmin(axis=1)) + 1

        best_full[b] = pick(ok, err)
        best_no15[b] = pick(ok[:, :14], err[:, :14])

    body = _emit_body93(q0all, F, fmt_type, bands_keep, counts,
                        band_start, best_full, best_no15, allzero)

    out = bytearray()
    out += F.to_bytes(2, "big")
    out += header
    out += body
    return bytes(out)


def _emit_body93(q0all, F, fmt_type, bands_keep, counts, band_start,
                 best_full, best_no15, allzero):
    """Python twin of the native body emitter (native/src/encoder93.cpp):
    the sequential per-frame emission loop.  Byte-identical by contract
    (fuzz-compared in tests/test_format93.py); used when the native
    library is unavailable."""
    w = BitWriter()
    frame_codes = [0] * 16            # frame-to-frame memory (Type 1)
    q0_l = [q0all[:, band_start[b]:band_start[b] + counts[b]].tolist()
            for b in range(bands_keep)]

    for f in range(F):
        last_code = -1
        last_sub = 0 if fmt_type == 1 else 2
        prv_sample = 0
        prv_delta = 0
        for b in range(bands_keep):
            n = counts[b]

            # candidate codings in the decoder's unscaled integer domain
            buf0 = q0_l[b][f]
            buf1 = [0] * n
            buf2 = [0] * n
            ps, pd = prv_sample, prv_delta
            for i in range(n):
                cur = buf0[i]
                buf1[i] = cur - ps
                buf2[i] = cur - ps - pd
                pd = buf1[i]
                ps = cur
            prv_frame_sample, prv_frame_delta = prv_sample, prv_delta

            def code_range(new_sub):
                if fmt_type == 0:
                    return 0, 15
                if new_sub == last_sub:
                    return frame_codes[b] - 15, frame_codes[b] + 14
                return frame_codes[b] - 16, frame_codes[b] + 15

            lo0, hi0 = code_range(0)
            code0 = (best_no15[b][f] if hi0 <= 14 else best_full[b][f])
            code1 = _delta_band_code(buf1, fmt_type)
            code2 = _delta_band_code(buf2, fmt_type)
            # subtype-0 silence: a zero band code only if truly all zero
            if allzero[b][f]:
                code0 = 0

            new_code, new_sub = code0, 0
            if code1 < new_code or (code1 == new_code and last_sub == 1):
                new_code, new_sub = code1, 1
            if fmt_type == 0 and code2 < new_code:
                new_code, new_sub = code2, 2
            # Type 1 streams only use subtypes 0 and 1; respect the delta
            # range the chosen codeword family can express
            if fmt_type == 1:
                lo, hi = code_range(new_sub)
                new_code = max(lo, min(hi, max(0, new_code)))
            new_code = max(0, min(15, new_code))

            if (last_code == 0 and new_code == 0 and new_sub == last_sub):
                w.write(1, 1)         # repeat the empty band
            else:
                if last_code == 0:
                    w.write(0, 1)     # not repeating
                if fmt_type == 0:
                    if new_sub == last_sub:
                        w.write(0, 1)
                    else:
                        w.write(1, 1)
                        inc = (new_sub - last_sub) % 3 == 1
                        w.write(1 if inc else 0, 1)
                    w.write(new_code, 4)
                else:
                    invert = new_sub != last_sub
                    delta = new_code - frame_codes[b]
                    cw, nb = _HUFF93[(delta, invert)]
                    w.write(cw, nb)
                    frame_codes[b] = new_code

                if new_code == 0:
                    # empty band: update prv state per subtype semantics
                    if new_sub == 0:
                        prv_sample, prv_delta = 0, 0
                    elif new_sub == 1:
                        prv_sample, prv_delta = prv_frame_sample, 0
                    else:
                        prv_sample = prv_frame_sample
                        prv_delta = prv_frame_delta
                else:
                    width = new_code + (1 if fmt_type == 0 else 0)
                    mask = (1 << width) - 1
                    buf = (buf0, buf1, buf2)[new_sub]
                    lim = 1 << (width - 1)
                    for i in range(n):
                        v = min(max(buf[i], -lim), lim - 1)
                        w.write(v & mask, width)
                    # track what the decoder reconstructs (s16 wrap domain)
                    def w16s(x):
                        return ((int(x) + 0x8000) & 0xFFFF) - 0x8000

                    ps, pd = prv_frame_sample, prv_frame_delta
                    for i in range(n):
                        v = min(max(buf[i], -lim), lim - 1)
                        if new_sub == 0:
                            pd = w16s(v - ps)
                            ps = v
                        elif new_sub == 1:
                            pd = v
                            ps = w16s(ps + v)
                        else:
                            pd = w16s(pd + v)
                            ps = w16s(ps + pd)
                    prv_sample, prv_delta = ps, pd

            last_code = new_code
            last_sub = new_sub

    return w.bytes()

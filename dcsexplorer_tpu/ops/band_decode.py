"""Device frame decode (1994+ family): batched Huffman value decode, dequant,
scale and mix — every frame in parallel.

Given the host prescan index (ops/prescan.py), each frame is independent:
its bit offset and absolute band types are known, so the kernel runs a
256-step ``lax.scan`` over sample symbols with the *frame batch* as the
vector axis (each step = a few gathers + integer ALU over all frames at
once), then dequantizes and mixes into per-frame 512-word frame buffers with
the exact fixed-point accumulate.

Semantics anchors: reference DCSDecoderNative.cpp:1836-2261 (band loop,
codebooks, scaling, accumulate), ops/fixmath.py for the numerics contract.

All arrays use u16-in-int32 storage; arithmetic relies on int32 wrapping
(see ops/fixmath.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..format import tables as T
from .fixmath import M16, s16, sat16

# flattened codebooks: entry = (consumed_bits << 8) | value; value bit $80 =
# "emit two zeros"
_CB_SIZES = [4, 8, 32, 128, 256, 512]
_CB_BASE = np.zeros(7, dtype=np.int32)
for _i in range(1, 7):
    _CB_BASE[_i] = _CB_BASE[_i - 1] + (_CB_SIZES[_i - 2] if _i >= 2 else 0)
_CB_FLAT = np.concatenate([np.asarray(T.CODEBOOKS[i], dtype=np.int32)
                           for i in range(1, 7)])
_MAXW = np.asarray(T.MAX_BIT_WIDTH, dtype=np.int32)          # [7]
_XLAT_TYPE = np.stack([  # [3 groups, 16] translated band type
    np.asarray(T.XLAT02[:, 0]), np.asarray(T.XLAT35[:, 0]),
    np.asarray(T.XLAT6F[:, 0])]).astype(np.int32)
_XLAT_ADJ = np.stack([
    np.asarray(T.XLAT02[:, 1]), np.asarray(T.XLAT35[:, 1]),
    np.asarray(T.XLAT6F[:, 1])]).astype(np.int32)
_BAND_GROUP = np.array([0] * 3 + [1] * 3 + [2] * 10, dtype=np.int32)  # [16]
_PREADJ = np.stack([np.asarray(T.PREADJ0), np.asarray(T.PREADJ3)]).astype(np.int32)
_OUT_COUNT = np.asarray(T.BAND_OUTPUT_COUNT, dtype=np.int32)  # [16]
_SCALE_MANT = np.asarray(T.SCALE_MANTISSA, dtype=np.int32)    # [4]


def band_controls(header, sub_type, fmt_type, band_type, band_type_prev):
    """Per-band control vectors for a batch of frames (all int32).

    header: [16] stream header bytes; sub_type/fmt_type: python ints;
    band_type, band_type_prev: [F, 16].

    Returns dict of [F, 16] arrays: code (effective band type; 0 = no data),
    scale (u16 scale factor), out_count (dense outputs), out_inc (1|2),
    advance (frame-buffer index advance for the band).
    """
    hdr = jnp.asarray(header, jnp.int32).reshape(1, 16)
    active = (hdr & 0x7F) != 0x7F
    # the $7F terminator ends the band list: mask every band at or after it
    active = jnp.cumprod(active.astype(jnp.int32), axis=1).astype(bool)

    cur_hdr = hdr & 0x7F
    out_count = jnp.asarray(_OUT_COUNT).reshape(1, 16) * jnp.ones_like(band_type)
    out_inc = jnp.where((cur_hdr & 0x40) != 0, 2, 1) * jnp.ones_like(band_type)
    out_count = jnp.where(out_inc == 2, out_count // 2, out_count)

    if fmt_type == 0:
        code = band_type
        scale_code = cur_hdr * jnp.ones_like(band_type)
    else:
        group = jnp.asarray(_BAND_GROUP).reshape(1, 16)
        padd = jnp.asarray(_PREADJ[1 if sub_type != 0 else 0])
        pre = jnp.where(jnp.arange(16).reshape(1, 16) < 3,
                        padd[jnp.clip(band_type_prev, 0, 15)], 0)
        hdr_adj = cur_hdr + pre
        bt = jnp.clip(band_type, 0, 15)
        code = jnp.asarray(_XLAT_TYPE)[group, bt]
        scale_code = hdr_adj + jnp.asarray(_XLAT_ADJ)[group, bt]
        code = jnp.where(band_type == 0, 0, code)

    scale = (jnp.asarray(_SCALE_MANT)[scale_code & 3]
             >> (15 - ((scale_code >> 2) & 0xF)))

    has_data = active & (band_type != 0)
    code = jnp.where(has_data, code, 0)
    dense = jnp.where(has_data, out_count, 0)
    # frame-buffer advance: halved count when skipped, count*inc when decoded
    # (replicates the reference's asymmetric skip advance, :1886 vs :2244)
    advance = jnp.where(active & (band_type == 0), out_count,
                        jnp.where(has_data, out_count * out_inc, 0))
    return {"code": code, "scale": scale, "dense": dense,
            "out_inc": out_inc, "advance": advance}


def slot_controls(ctl):
    """Expand per-band controls to per-dense-output-slot controls [F, 256].

    Returns (code, scale, fb_idx, ref_val, maxw, cb_base, valid).
    """
    dense = ctl["dense"]
    bounds = jnp.cumsum(dense, axis=1)                       # [F,16]
    total = bounds[:, -1]                                    # [F]
    band_start = bounds - dense                              # [F,16]
    fb_base = 1 + jnp.cumsum(ctl["advance"], axis=1) - ctl["advance"]

    d = jnp.arange(256, dtype=jnp.int32).reshape(1, 256, 1)
    band_of = jnp.sum(d >= bounds[:, None, :], axis=2)       # [F,256] in 0..16
    band_of = jnp.clip(band_of, 0, 15)

    take = lambda a: jnp.take_along_axis(a, band_of, axis=1)
    code = take(ctl["code"])
    scale = take(ctl["scale"])
    inc = take(ctl["out_inc"])
    start = take(band_start)
    base = take(fb_base)
    dgrid = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)
    fb_idx = base + (dgrid - start) * inc
    valid = dgrid < total[:, None]
    ref_val = jnp.where(code >= 1, 1 << jnp.clip(code - 1, 0, 14), 0)
    is_cb = (code >= 1) & (code <= 6)
    maxw = jnp.where(is_cb, jnp.asarray(_MAXW)[jnp.clip(code, 0, 6)],
                     jnp.clip(code, 0, 17))
    cb_base = jnp.asarray(_CB_BASE)[jnp.clip(code, 0, 6)]
    return code, scale, fb_idx, ref_val, maxw, cb_base, valid


def decode_frames94(stream_bytes, start_bit, header, fmt_type, sub_type,
                    band_type, band_type_prev):
    """Decode all frames of one stream in parallel.

    stream_bytes: [L] int32 (byte values); start_bit: [F]; band_type /
    band_type_prev: [F, 16].  fmt_type/sub_type/header are static.

    Returns (values [F, 256] dense sample values in u16 storage,
             code/scale/fb_idx/valid slot controls) for dequant_mix.
    """
    ctl = band_controls(header, sub_type, fmt_type, band_type, band_type_prev)
    code, scale, fb_idx, ref_val, maxw, cb_base, valid = slot_controls(ctl)
    F = start_bit.shape[0]
    cb_flat = jnp.asarray(_CB_FLAT)

    def step(carry, _):
        cursor, didx = carry
        # per-frame slot controls at the current dense index
        g = lambda a: jnp.take_along_axis(a, didx[:, None], axis=1)[:, 0]
        c = g(code)
        mw = g(maxw)
        cb = g(cb_base)
        rv = g(ref_val)
        ok = g(valid)

        byte_idx = cursor >> 3
        w24 = ((stream_bytes[byte_idx] << 16)
               | (stream_bytes[byte_idx + 1] << 8)
               | (stream_bytes[byte_idx + 2]))
        look = (w24 >> (24 - mw - (cursor & 7))) & ((1 << mw) - 1)

        is_cb = (c >= 1) & (c <= 6)
        entry = cb_flat[jnp.clip(cb + look, 0, _CB_FLAT.size - 1)]
        nbits_cb = entry >> 8
        val_cb = entry & 0xFF
        two_zero = is_cb & ((val_cb & 0x80) != 0)
        sample_cb = (val_cb & 0x7F) - rv

        # raw: sign-extend mw bits
        sample_raw = look - ((look >> (jnp.maximum(mw, 1) - 1)) << jnp.maximum(mw, 1))
        nbits = jnp.where(is_cb, nbits_cb, mw)
        sample = jnp.where(is_cb, sample_cb, sample_raw) & M16
        sample = jnp.where(two_zero, 0, sample)

        nbits = jnp.where(ok, nbits, 0)
        emit_idx = jnp.where(ok, didx, 255)
        new_cursor = cursor + nbits
        new_didx = jnp.minimum(didx + jnp.where(ok, 1 + two_zero.astype(jnp.int32), 0), 255)
        return (new_cursor, new_didx), (emit_idx, jnp.where(ok, sample, 0))

    cursor0 = start_bit.astype(jnp.int32)
    didx0 = jnp.zeros(F, jnp.int32)
    _, (idxs, vals) = jax.lax.scan(step, (cursor0, didx0), None, length=256)
    idxs = jnp.transpose(idxs)   # [F, 256 steps]
    vals = jnp.transpose(vals)

    # scatter dense values: steps → dense slots (two-zero emits are zeros and
    # the value array is zero-initialized, so only explicit emits are set)
    dense_vals = jnp.zeros((F, 257), jnp.int32)
    rows = jnp.arange(F, dtype=jnp.int32)[:, None] * jnp.ones((1, 256), jnp.int32)
    dense_vals = dense_vals.at[rows.reshape(-1), jnp.clip(idxs, 0, 256).reshape(-1)].set(
        vals.reshape(-1), mode="drop")
    dense_vals = dense_vals[:, :256]
    return dense_vals, (scale, fb_idx, valid)


def dequant_mix(dense_vals, slot_ctl, mix, fb_prev=None, active=None):
    """Dequantize/scale dense samples and mix into frame buffers [F, 512].

    mix: [F] per-frame mixing multiplier (u16 storage).  fb_prev: prior
    accumulated frame buffers (other channels), or None for silence.
    active: [F] bool — frames where this channel actually plays (inactive
    frames pass fb_prev through untouched, exactly as the reference skips
    DecompressFrame for idle channels).
    Implements the exact accumulate + first-sample delta fixup
    (reference: DCSDecoderNative.cpp:2244-2257).
    """
    scale, fb_idx, valid = slot_ctl
    F = dense_vals.shape[0]
    if fb_prev is None:
        fb_prev = jnp.zeros((F, 512), jnp.int32)
    if active is not None:
        valid = valid & active[:, None]
    outbuf1 = fb_prev[:, 1]

    out_old = jnp.take_along_axis(fb_prev, jnp.clip(fb_idx, 0, 511), axis=1)
    scaled = (s16(dense_vals) * (scale & M16)) & M16
    prod = (s16(out_old) << 16) | scaled
    prod = prod + s16(scaled) * (mix[:, None] & M16)
    new_val = (prod >> 16) & M16
    new_val = jnp.where(valid, new_val, out_old)

    rows = jnp.arange(F, dtype=jnp.int32)[:, None] * jnp.ones((1, 256), jnp.int32)
    tgt = jnp.where(valid, fb_idx, 512)
    fb = jnp.concatenate([fb_prev, jnp.zeros((F, 1), jnp.int32)], axis=1)
    fb = fb.at[rows.reshape(-1), jnp.clip(tgt, 0, 512).reshape(-1)].set(
        new_val.reshape(-1), mode="drop")
    fb = fb[:, :512]

    # first-sample delta fixup (only where the channel is active)
    delta = sat16(s16(fb[:, 1]) - s16(outbuf1))
    fb0 = sat16(s16(delta) + s16(fb[:, 0]))
    if active is not None:
        fb0 = jnp.where(active, fb0, fb[:, 0])
        fb1 = jnp.where(active, outbuf1, fb[:, 1])
    else:
        fb1 = outbuf1
    fb = fb.at[:, 0].set(fb0)
    fb = fb.at[:, 1].set(fb1)
    return fb

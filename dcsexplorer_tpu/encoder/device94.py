"""Batched JAX twin of the integer-canonical encoder core (core94.py).

Every decision here is integer (or an exact-floor float32 division, see
``core94.rdiv``), so this jitted pipeline emits *byte-identical* streams to
the numpy core from the same canonical coefficients — on the CPU backend
(single-stream encode) and on the TPU (the batched ``encode_files_device``
path, data parallel over files × the ×4 format-candidate search; reference
anchor: DCSEncoder.cpp:784-853, 1502-1621).

Device layout: the per-band work runs on a padded [16, 32] grid (bands ×
lanes — band sizes are 7, 8, 13×16, 32), the emission on the flat [255]
transmit order.  The whole format search is one fused program: (optionally
the analysis matmul itself, from raw int16 PCM planes on the MXU —
_analyze_device) → per-slot LUT derivation from the 16 header scale codes
(_derive_luts; widths/scale factors/fit windows never travel) → decision
tables → wrap refinement → sequential band-type scan (lax.scan over frames,
carry = 16 previous codes) → per-format exact sizes → winner gather → ONE
packed uint8 result row per stream (one device→host fetch per batch).  The
host re-derives the winner's emission from its own coefficients
(native dcs94_emit_with_codes) and prepends the 16-byte header.
"""

import functools

import numpy as np

from . import core94 as c94

FRAME = c94.FRAME
RATE = c94.RATE
PMAX = c94.PMAX
NBANDS = 16
NPAD = 32
NFMT = len(c94.FORMATS)
WRAP_CMAX = c94.WRAP_CMAX
D_CLAMP = c94.D_CLAMP

# padded-grid index maps (host constants)
_PAD_SRC = np.zeros((NBANDS, NPAD), dtype=np.int32)
_PAD_MASK = np.zeros((NBANDS, NPAD), dtype=bool)
for _b in range(NBANDS):
    _n = int(c94.BAND_SIZES[_b])
    _PAD_SRC[_b, :_n] = c94.BAND_START[_b] + np.arange(_n)
    _PAD_MASK[_b, :_n] = True

# (the previous-code-dependent pre-adjustment flags — type 1, bands 0-2 —
# ride in the per-stream ``dep`` array built by setup_arrays)


def _jnp():
    import jax.numpy as jnp
    return jnp


def _rdiv(a, s):
    """Exact-floor round-half-away division, float32 (see core94.rdiv:
    every intermediate is an integer < 2^24, so f32 arithmetic is exact
    and the fixup rounds make q the true floor)."""
    jnp = _jnp()
    af = jnp.abs(a).astype(jnp.float32)
    sf = s.astype(jnp.float32)
    x = 2.0 * af + sf
    y = 2.0 * sf
    q = jnp.floor(x / y)
    r = x - q * y
    q = q + (r >= y).astype(jnp.float32) - (r < 0).astype(jnp.float32)
    return jnp.where(a < 0, -q, q).astype(jnp.int32)


def _refine_ok(cpad, padmask, w_c, sf_c, thr, dlim, cape):
    """Exact capped error-sum pass test for the wrap-refinement candidates.

    cpad [F, nb, 32] int32 (padded coefficients), w_c/sf_c [nb, C, P] int32,
    thr/dlim/cape [nb] int32.  Returns ok [F, nb, C, P] bool — identical to
    the numpy core's exact test (its feasibility prefilter is conservative:
    skipped frames provably fail, see core94._wrap_refine_np)."""
    jnp = _jnp()
    a = cpad[:, :, :, None, None]                     # [F, nb, 32, 1, 1]
    sf = sf_c[None, :, None, :, :]                    # [1, nb, 1, C, P]
    w = w_c[None, :, None, :, :]
    q = _rdiv(a, jnp.broadcast_to(sf, a.shape[:3] + sf.shape[3:]))
    ref = jnp.left_shift(jnp.int32(1), jnp.maximum(w - 1, 0))
    mask = jnp.left_shift(jnp.int32(1), jnp.maximum(w, 1)) - 1
    stored = (q + ref) & mask
    diff = (stored - ref) * sf - a
    dc = jnp.minimum(jnp.abs(diff), D_CLAMP)
    e = jnp.minimum(dc * dc, cape[None, :, None, None, None])
    e = e * padmask[None, :, :, None, None]
    es = jnp.sum(e, axis=2)                           # [F, nb, C, P]
    valid = (w_c >= 1) & (
        (jnp.left_shift(jnp.int32(1), jnp.maximum(w_c, 1)) * sf_c
         - sf_c // 2) <= (dlim[:, None, None] - 1))
    return (es <= thr[None, :, None, None]) & valid[None]


def _encode_format(ci, cpad, mn, mx, mask_f, silent, keep, thr, dlim, cape,
                   w_lut, sf_lut, amin, amax, pip, dep):
    """One format candidate: decision → refine → scan → emission → size.

    ci [F, 255] i32, cpad [F, 16, 32] i32, mn/mx [F, 16] i32,
    mask_f [F] bool, silent [F, 16] bool, keep [16] bool,
    thr/dlim/cape [16] i32, w_lut/sf_lut/amin/amax [16, 16, PMAX] i32,
    pip [16] i32, dep [16] bool.
    Returns (vals, bits) [F, 16+255] i32 and nbytes scalar i32.
    """
    import jax
    jnp = _jnp()
    F = ci.shape[0]
    band_of = jnp.asarray(c94.BAND_OF.astype(np.int32))
    pos_in_band = jnp.asarray(c94.POS_IN_BAND.astype(np.int32))
    not_band_last = jnp.asarray(c94.NOT_BAND_LAST)
    padmask = jnp.asarray(_PAD_MASK.astype(np.int32))

    # --- decision tables: first code (1..hi) whose coefficient window
    # contains the band min/max (core94.decision_tables_np)
    fit = ((mn[:, :, None, None] >= amin[None, :, 1:, :])
           & (mx[:, :, None, None] <= amax[None, :, 1:, :]))  # [F,16,15,P]
    codes15 = jnp.arange(1, 16, dtype=jnp.int32)[None, None, :, None]
    key = jnp.where(fit, codes15, jnp.int32(99))
    best = jnp.min(key, axis=2)
    out15 = jnp.where(best < 99, best, jnp.int32(15))     # [F,16,P]

    # --- wrap refinement (core94._wrap_refine_np): candidates are codes
    # 1..WRAP_CMAX; pre-adjustment columns beyond 0 only exist for type-1
    # bands 0-2, so the exact error pass runs in two slabs
    w_c = w_lut[:, 1:WRAP_CMAX + 1, :]                  # [16, C, P]
    sf_c = sf_lut[:, 1:WRAP_CMAX + 1, :]
    ok0 = _refine_ok(cpad, padmask, w_c[:, :, :1], sf_c[:, :, :1],
                     thr, dlim, cape)                   # [F, 16, C, 1]
    okB = _refine_ok(cpad[:, :3], padmask[:3],
                     w_c[:3, :, 1:], sf_c[:3, :, 1:],
                     thr[:3], dlim[:3], cape[:3])       # [F, 3, C, P-1]
    okB = jnp.concatenate(
        [okB, jnp.zeros((F, 13) + okB.shape[2:], bool)], axis=1)
    ok = jnp.concatenate([ok0, okB], axis=3)            # [F, 16, C, P]

    cands = jnp.arange(1, WRAP_CMAX + 1, dtype=jnp.int32)[None, None, :,
                                                          None]

    bidx = jnp.arange(16, dtype=jnp.int32)
    pidx_cols = jnp.arange(PMAX, dtype=jnp.int32)

    # min candidate key (width·16 + code); candidates have c ≤ 6, so the
    # c < out15 mask serves both variants (they differ only at 15 vs 14)
    cok = ok & (cands < out15[:, :, None, :]) & keep[None, :, None, None]
    key_c = jnp.where(cok, w_c[None] * 16 + cands, jnp.int32(1 << 14))
    candmin = jnp.min(key_c, axis=2)                    # [F, 16, P]
    w_orig = w_lut[bidx[None, :, None], out15, pidx_cols[None, None, :]]
    new15 = jnp.minimum(candmin, w_orig * 16 + out15) & 15
    key14 = w_lut[bidx[:, None], 14, pidx_cols[None, :]][None] * 16 + 14
    out14 = jnp.where(out15 == 15,
                      jnp.minimum(candmin, key14) & 15, new15)
    out15 = new15

    # --- sequential band-type scan (core94.scan_codes_np)
    def step(prev, xs):
        sil, b15, b14 = xs                              # [16], [16,P], [16,P]
        pi = jnp.where(dep, pip[prev], 0)
        row = jnp.where((prev == 0)[:, None], b14, b15)
        c = jnp.take_along_axis(row, pi[:, None], axis=1)[:, 0]
        c = jnp.where(sil | ~keep, 0, c)
        return c, (c, pi)

    _, (codes, pidx) = jax.lax.scan(
        step, jnp.zeros(16, jnp.int32), (silent, out15, out14))

    # --- exact stream size (bits only — core94.emit94_np's widths).  The
    # symbol VALUES never leave the device: the host re-derives the
    # winner's emission from its own coefficients plus the fetched codes
    # (native dcs94_emit_with_codes); the device's job is the exact size
    # of every candidate so the winner choice is canonical.
    prev_rows = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.int32), codes[:-1]], axis=0)
    deltas = codes - prev_rows
    db = jnp.where(keep[None, :] & mask_f[:, None],
                   jnp.asarray(c94.DELTA_BITS.astype(np.int32))[
                       deltas - c94.DELTA_LO], 0)

    bw_b = w_lut[bidx[None, :], codes, pidx]             # [F, 16]
    sf_b = sf_lut[bidx[None, :], codes, pidx]
    live_b = (codes != 0) & (bw_b != 0)
    bw = jnp.take(bw_b, band_of, axis=1)                 # [F, 255]
    q = _rdiv(ci, jnp.take(sf_b, band_of, axis=1))
    is_cb = (bw >= 1) & (bw <= 6)
    ref = jnp.where(is_cb,
                    jnp.left_shift(jnp.int32(1), jnp.maximum(bw - 1, 0)), 0)
    msk = jnp.left_shift(jnp.int32(1), jnp.maximum(bw, 1)) - 1
    stored = (q + ref) & msk

    live = jnp.take(live_b, band_of, axis=1)
    bwc = jnp.clip(bw, 0, 6)
    tz_bits_l = jnp.asarray(c94.TZ_BITS.astype(np.int32))
    tz_ok = tz_bits_l[bwc] > 0

    zero = (q == 0) & is_cb & live & tz_ok
    in_run = jnp.concatenate(
        [jnp.zeros((F, 1), bool), zero[:, :-1]], axis=1) & (pos_in_band != 0)
    starts = zero & ~in_run
    gcol = jnp.arange(255, dtype=jnp.int32)[None, :]
    run_start = jax.lax.cummax(
        jnp.where(starts, gcol, jnp.int32(-1)), axis=1)
    offset = gcol - run_start
    next_zero = jnp.concatenate(
        [zero[:, 1:], jnp.zeros((F, 1), bool)], axis=1) & not_band_last
    pair_head = zero & (offset % 2 == 0) & next_zero
    shadow = jnp.concatenate(
        [jnp.zeros((F, 1), bool), pair_head[:, :-1]], axis=1)

    # codeword lengths as step functions of the stored value (a dozen
    # vectorized compares, core94._bits_steps) — no per-sample gathers,
    # which TPUs scalarize
    bwc_b = jnp.clip(bw_b, 0, 6)                         # [F, 16]
    oh_k = (bwc_b[:, :, None] == jnp.arange(7, dtype=jnp.int32)[None, None])
    ohk_i = oh_k.astype(jnp.int32)
    b0_b = jnp.sum(ohk_i * jnp.asarray(c94.BITS_B0)[None, None], axis=2)
    t_b = jnp.sum(ohk_i[:, :, :, None]
                  * jnp.asarray(c94.BITS_T)[None, None], axis=2)
    d_b = jnp.sum(ohk_i[:, :, :, None]
                  * jnp.asarray(c94.BITS_D)[None, None], axis=2)
    t_p = jnp.take(t_b, band_of, axis=1)                 # [F, 255, J]
    d_p = jnp.take(d_b, band_of, axis=1)
    cb_bits = (jnp.take(b0_b, band_of, axis=1)
               + jnp.sum(jnp.where(stored[:, :, None] >= t_p, d_p, 0),
                         axis=2))
    sbits = jnp.where(is_cb, cb_bits, bw)
    sbits = jnp.where(pair_head, tz_bits_l[bwc], sbits)
    sbits = jnp.where(live & ~shadow & mask_f[:, None], sbits, 0)

    nbits = (jnp.sum(db, dtype=jnp.int32)
             + jnp.sum(sbits, dtype=jnp.int32))
    nbytes = 18 + (nbits + 7) // 8
    return codes, pidx, nbytes


def _static_format_tables(slots):
    """Per-format-slot static tables (numpy; depend only on the (type,
    subtype) slot list, not on any stream): w_tab/xa_tab [K,16,16],
    peff_tab [K,16,PMAX], pip [K,16], dep [K,16], and the band→table maps.
    Mirrors core94._format_setup's structure with hdr_scale factored out —
    the only per-stream input the device needs is the 16 header scale
    codes per slot."""
    K = len(slots)
    w_tab = np.zeros((K, 16, 16), dtype=np.int32)
    xa_tab = np.zeros((K, 16, 16), dtype=np.int32)
    peff_tab = np.zeros((K, 16, PMAX), dtype=np.int32)
    pip = np.zeros((K, 16), dtype=np.int32)
    dep = np.zeros((K, 16), dtype=bool)
    for k, (t, sub) in enumerate(slots):
        if t == 0:
            w_tab[k] = np.arange(16)[None, :]
        else:
            preadj_map = np.asarray(
                c94.T.PREADJ0 if sub == 0 else c94.T.PREADJ3)
            pvals = sorted(set(int(x) for x in preadj_map))
            n_p = len(pvals)
            pip[k] = [pvals.index(int(preadj_map[c])) for c in range(16)]
            dep[k, :3] = True
            for b in range(16):
                xl = c94._xlat_for(b)
                w_tab[k, b] = xl[:, 0]
                xa_tab[k, b] = xl[:, 1]
            peff_tab[k, :3, :] = [pvals[min(pi, n_p - 1)]
                                  for pi in range(PMAX)]
    is1 = np.asarray([t != 0 for (t, _) in slots])
    return w_tab, xa_tab, peff_tab, pip, dep, is1


def _derive_luts(hdr_scale, keep, tabs):
    """Device half of core94._format_setup: (w, sf, amin, amax) for every
    (slot, band, code, preadj column) from the per-stream header scale
    codes [K, 16] plus the static slot tables.  Integer-identical to the
    numpy LUTs (whose int64 build carries a < 2^31 assert that also
    guards this int32 evaluation — setup_compact re-asserts it)."""
    jnp = _jnp()
    w_tab, xa_tab, peff_tab, pip, dep, is1 = tabs
    wt = jnp.asarray(w_tab)                          # [K,16,16]
    hs = hdr_scale.astype(jnp.int32)                 # [K,16]
    sc = (hs[:, :, None, None]
          + jnp.where(jnp.asarray(is1)[:, None, None, None],
                      jnp.asarray(xa_tab)[:, :, :, None]
                      + jnp.asarray(peff_tab)[:, :, None, :], 0))
    codes = jnp.arange(16, dtype=jnp.int32)
    live = keep[None, :, None, None] & (codes >= 1)[None, None, :, None]
    w_lut = jnp.broadcast_to(jnp.where(live, wt[:, :, :, None], 0),
                             sc.shape)
    # scale-factor rule incl. wrap semantics (core94._scale_factor)
    mant = jnp.asarray(np.asarray([0x8000, 0x9838, 0xB505, 0xD745],
                                  dtype=np.int32))
    m = mant[sc & 3]
    sf = jnp.right_shift(m, 15 - ((sc >> 2) & 0xF))
    sf_lut = jnp.maximum(jnp.where(live, sf, 1), 1)
    half = jnp.left_shift(jnp.int32(1), jnp.maximum(w_lut - 1, 0))
    hprod = sf_lut * half
    amax = hprod - ((sf_lut + 2) >> 1)
    amin = -(hprod + ((sf_lut - 1) >> 1))
    return w_lut, sf_lut, amin, amax, jnp.asarray(pip), jnp.asarray(dep)


def _encode_all(ci, mask_f, sil_max, keep, thr, dlim, cape,
                hdr_scale, wanted, tabs):
    """All selected format candidates for one stream + winner selection,
    packed into ONE uint8 result row (a single device→host fetch):

      [ nbytes[K] as 4 LE bytes each | winner | codes[F,16] | pidx[F,16] ]

    ci [F,255] i32; hdr_scale [K,16] (K = selected candidates only — the
    wildcard search computes 3, not 4: (0,3) is body-identical to (0,0),
    core94.skip_dup_format); wanted [K] bool."""
    import jax
    jnp = _jnp()
    K = hdr_scale.shape[0]
    F = ci.shape[0]
    pad_src = jnp.asarray(_PAD_SRC)
    padmask = jnp.asarray(_PAD_MASK)
    cpad = jnp.take(ci, pad_src.reshape(-1), axis=1).reshape(
        ci.shape[0], NBANDS, NPAD)
    cpad = cpad * padmask[None]
    big = jnp.int32(1 << 30)
    mn = jnp.min(jnp.where(padmask[None], cpad, big), axis=2)
    mx = jnp.max(jnp.where(padmask[None], cpad, -big), axis=2)
    silent = (mx - mn) <= sil_max

    w_lut, sf_lut, amin, amax, pip, dep = _derive_luts(hdr_scale, keep, tabs)

    fmt = jax.vmap(
        lambda w, s, an, ax, pp, dp: _encode_format(
            ci, cpad, mn, mx, mask_f, silent, keep, thr, dlim, cape,
            w, s, an, ax, pp, dp))
    codes, pidx, nbytes = fmt(w_lut, sf_lut, amin, amax, pip, dep)

    key = jnp.where(wanted, nbytes * K
                    + jnp.arange(K, dtype=jnp.int32), big)
    winner = jnp.argmin(key).astype(jnp.int32)
    # only the winner's CODES travel host-ward (32 bytes/frame, uint8):
    # the host re-derives the winner's symbol emission from its own copy
    # of the coefficients — the host↔device link is the scarce resource
    # on serving hosts, and the decisions are the only thing the device
    # knows that the host doesn't
    nb_u8 = jnp.right_shift(nbytes[:, None],
                            jnp.asarray([0, 8, 16, 24], np.int32)[None, :])
    out = jnp.concatenate([
        (nb_u8 & 0xFF).reshape(4 * K).astype(jnp.uint8),
        winner[None].astype(jnp.uint8),
        codes[winner].astype(jnp.uint8).reshape(F * 16),
        pidx[winner].astype(jnp.uint8).reshape(F * 16)])
    return out


# ----------------------------------------------------------------------
# on-device integer-canonical analysis (the PCM→coefficients half):
# int8-plane MXU matmuls that reproduce encoder.analyze_frames_canonical
# bit-for-bit (see the contract comment there).

def _analyze_device(pcm, n_frames_max):
    """pcm int16 [B, Fmax*240 + 240] (zero-padded) → ci int32 [B,Fmax,255].

    frames[f] = pcm[f*240 : f*240+256]; the matmul runs as four int8-plane
    dots with int32 accumulation (every partial < 2^24), and the 2^21
    rounding shift is evaluated by an exact nested-shift decomposition —
    identical to the host's float64 evaluation for every input."""
    from jax import lax
    jnp = _jnp()
    from . import encoder as enc_mod  # matrix constant (numpy)
    assert enc_mod.FQ_SHIFT == 21, "shift decomposition is tuned to 2^21"
    fq = np.asarray(enc_mod.forward_matrix_q(), dtype=np.int16)
    a0 = (fq.astype(np.int32) & 255).astype(np.uint8)
    a1 = (fq.astype(np.int32) >> 8).astype(np.int8)

    B = pcm.shape[0]
    F = n_frames_max
    head = pcm[:, :F * 240].reshape(B, F, 240)
    tail = pcm[:, 240:240 + F * 240].reshape(B, F, 240)[:, :, :16]
    frames = jnp.concatenate([head, tail], axis=2)    # [B, F, 256] i16
    x = frames.astype(jnp.int32).reshape(B * F, 256)
    x0 = (x & 255).astype(jnp.uint8)
    x1 = (x >> 8).astype(jnp.int8)

    def dot(u, v):
        return lax.dot_general(u, jnp.asarray(v),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    p00 = dot(x0, a0)
    p01 = dot(x0, a1)
    p10 = dot(x1, a0)
    p11 = dot(x1, a1)
    k1 = (p01 + p10) + ((p00 + (1 << 20)) >> 8)
    ci = (p11 + (k1 >> 8)) >> 5
    ci = jnp.clip(ci, -(1 << 20), 1 << 20)
    return ci.reshape(B, F, 255)


def _select_formats(params):
    """The format-candidate slot list (params-only; shared by every
    stream — preserves the numpy core's filter semantics)."""
    sel = [f for f in c94.FORMATS
           if (params.stream_format_type < 0
               or params.stream_format_type == f[0])
           and (params.stream_format_subtype < 0
                or params.stream_format_subtype == f[1])]
    if not sel:
        raise ValueError(
            "No available stream format types match the requested "
            "encoding parameters")
    if (0, 0) in sel and (0, 3) in sel:
        sel.remove((0, 3))             # body-identical (core94.skip_dup_format)
    return tuple(sel)


@functools.lru_cache(maxsize=None)
def _compiled(fmax, slots, from_pcm):
    """One jitted program per (frame bucket, format-slot list, input kind).

    from_pcm=True takes int16 PCM and runs the analysis matmul on the MXU
    (_analyze_device); otherwise it takes ready int32 coefficients.  Both
    share the search body and return the packed uint8 result rows."""
    import jax
    jnp = _jnp()
    tabs = _static_format_tables(list(slots))

    def body(ci, nf, sil_max, keep, thr, dlim, cape, hdr_scale, wanted):
        mask = (jnp.arange(ci.shape[1], dtype=jnp.int32)[None, :]
                < nf[:, None])
        return jax.vmap(
            lambda c, m, k, h, w: _encode_all(
                c, m, sil_max, k, thr, dlim, cape, h, w, tabs)
        )(ci, mask, keep, hdr_scale, wanted)

    if from_pcm:
        def run(pcm, nf, sil_max, keep, thr, dlim, cape, hdr_scale, wanted):
            ci = _analyze_device(pcm, fmax)
            return body(ci, nf, sil_max, keep, thr, dlim, cape,
                        hdr_scale, wanted)
    else:
        def run(ci, nf, sil_max, keep, thr, dlim, cape, hdr_scale, wanted):
            return body(ci, nf, sil_max, keep, thr, dlim, cape,
                        hdr_scale, wanted)
    return jax.jit(run)


def _bucket(f):
    """Frame-count bucket for compiled-program reuse.  16-frame
    granularity: the PCM upload is the binding term of the on-chip
    encode on a slow link (see encode_jobs_pcm), and 64-frame buckets
    padded typical 261-frame files to 320 — 23% dead wire bytes; 16
    cuts that to ~5% for ~4× the worst-case compile-variant count."""
    return max(16, -(-f // 16) * 16)


def setup_compact(ci_list, params, slots):
    """Host setup for a batch: per-stream StreamSetup (kept for emission)
    plus the COMPACT device arrays — only what the device can't derive
    (hdr_scale [B,K,16] u8, bands-keep mask, wanted) travels; widths,
    scale factors and fit windows are derived on device (_derive_luts)."""
    import math
    B = len(ci_list)
    K = len(slots)
    setups = []
    hdr_scale = np.zeros((B, K, 16), dtype=np.uint8)
    keep = np.zeros((B, 16), dtype=bool)
    wanted = np.ones((B, K), dtype=bool)
    for i, ci in enumerate(ci_list):
        st = c94.setup94(ci, params, wanted=list(slots))
        setups.append(st)
        for k, fs in enumerate(st.formats):
            # the int64 host build carries the < 2^31 range assert that
            # also guards the device's int32 lut derivation
            assert (np.abs(fs.amax_lut) < (1 << 31)).all()
            assert (np.abs(fs.amin_lut) < (1 << 31)).all()
            assert fs.hdr_scale.max() < 256 and fs.hdr_scale.min() >= 0
            hdr_scale[i, k] = fs.hdr_scale
        keep[i, :st.bands_keep] = True
    thr = setups[0].thr.astype(np.int32) if setups else \
        np.zeros(16, np.int32)
    dlim = np.asarray([math.isqrt(max(int(t), 0)) + 1 for t in thr],
                      np.int32)
    cape = np.minimum(thr.astype(np.int64) + 1, 1 << 25).astype(np.int32)
    sil_max = np.int32(setups[0].sil_max if setups else 0)
    return setups, dict(hdr_scale=hdr_scale, keep=keep, wanted=wanted,
                        thr=thr, dlim=dlim, cape=cape, sil_max=sil_max)


def _emit_from_packed(buf_row, ci, st, slots):
    """Host emission for one stream from its packed device result row."""
    from .. import native
    K = len(slots)
    F = st.n_frames
    nbytes = (buf_row[:4 * K].reshape(K, 4).astype(np.int64)
              * (1 << np.arange(4) * 8)[None, :]).sum(axis=1)
    winner = int(buf_row[4 * K])
    fmax16 = (buf_row.size - 4 * K - 1) // 32
    codes = buf_row[4 * K + 1: 4 * K + 1 + fmax16 * 16] \
        .reshape(fmax16, 16)[:F].astype(np.int8)
    pidx = buf_row[4 * K + 1 + fmax16 * 16:] \
        .reshape(fmax16, 16)[:F].astype(np.int8)
    fs = st.formats[winner]
    body = native.emit94_with_codes(ci, fs, codes, pidx, st.bands_keep)
    if body is None:                   # no native toolchain: numpy emission
        vals, bits = c94.emit94_np(ci, st, fs, codes.astype(np.int64),
                                   pidx.astype(np.int64))
        body = c94.pack_bits(vals, bits)
    stream = st.n_frames.to_bytes(2, "big") + fs.header + body
    assert len(stream) == int(nbytes[winner]), \
        (len(stream), int(nbytes[winner]))
    return bytes(stream)


def encode_batch(ci_list, params, backend=None):
    """Encode a batch of coefficient arrays ([F_i, 255] int32) in one
    device program.  Returns list of stream bytes, byte-identical to
    core94.encode_stream94_np for every stream."""
    import jax
    import jax.numpy as jnp
    B = len(ci_list)
    fmax = _bucket(max(ci.shape[0] for ci in ci_list))
    ci = np.zeros((B, fmax, 255), dtype=np.int32)
    nf = np.asarray([c.shape[0] for c in ci_list], np.int32)
    for i, c in enumerate(ci_list):
        ci[i, :c.shape[0]] = c

    slots = _select_formats(params)
    setups, arrs = setup_compact(ci_list, params, slots)
    fn = _compiled(fmax, slots, False)
    dev = jax.devices(backend)[0] if backend else None
    put = (lambda a: jax.device_put(a, dev)) if dev else jnp.asarray
    buf = np.asarray(fn(put(ci), put(nf), arrs["sil_max"], put(arrs["keep"]),
                        put(arrs["thr"]), put(arrs["dlim"]),
                        put(arrs["cape"]), put(arrs["hdr_scale"]),
                        put(arrs["wanted"])))
    return [_emit_from_packed(buf[i], ci_list[i], st, slots)
            for i, st in enumerate(setups)]


def encode_jobs_pcm(jobs, params, backend=None, chunk=None):
    """End-to-end on-chip batched encode from PCM (BASELINE #4 on the
    TPU): per chunk of files the host canonicalizes PCM to int16, computes
    its own coefficients (float64 BLAS — needed for emission) and the
    per-stream setup; the device program re-derives bit-identical
    coefficients from the raw PCM planes on the MXU (_analyze_device) and
    runs the whole format search; one packed uint8 row per file returns.

    Four-stage overlap across chunks on a serial link: the uploader
    thread pushes chunk k+1's PCM AND dispatches it (keeping the ~30 ms
    dispatch RTT off the main thread), the device searches chunk k, a
    fetch thread drains finished results, and the main thread preps
    chunk k+2 / emits finished streams (same software pipeline as the
    serving bench, bench.bench_session6).  Even so, the configuration
    is WIRE-BOUND on this tunnel — see ARCHITECTURE.md "Encoder cost
    accounting" for the measured ceiling.

    jobs: list of (pcm, sample_rate).  Returns list of (stream, n_frames),
    byte-identical to encode_pcm for every input."""
    import jax
    from concurrent.futures import ThreadPoolExecutor
    from . import encoder as enc_mod

    slots = _select_formats(params)
    n = len(jobs)
    if n == 0:
        return []
    chunk = chunk or min(16, n)
    dev = jax.devices(backend)[0] if backend else jax.devices()[0]

    def prep(lo, hi):
        cis, fs, pcms = [], [], []
        for pcm, rate in jobs[lo:hi]:
            p16 = enc_mod.pcm_to_int16(pcm, rate)
            frames = enc_mod.frames_from_pcm_raw(p16)
            cis.append(enc_mod.analyze_frames_canonical(frames))
            fs.append(frames.shape[0])
            pcms.append(p16)
        fmax = _bucket(max(fs))
        B = hi - lo
        pcm_pad = np.zeros((B, fmax * 240 + 240), np.int16)
        for i, p16 in enumerate(pcms):
            pcm_pad[i, :p16.size] = p16[:fmax * 240 + 240]
        setups, arrs = setup_compact(cis, params, slots)
        nf = np.asarray(fs, np.int32)
        return (fmax, cis, setups, arrs,
                dict(pcm=pcm_pad, nf=nf, keep=arrs["keep"],
                     hdr_scale=arrs["hdr_scale"], wanted=arrs["wanted"],
                     thr=arrs["thr"], dlim=arrs["dlim"], cape=arrs["cape"]))

    def up_and_dispatch(host, fmax, arrs):
        """Upload thread: push the chunk over the link AND dispatch it.
        On the live tunnel a dispatch costs a ~30 ms round trip; paying
        it here (instead of on the main thread) keeps the main thread
        free for the next chunk's analysis/setup and the finished
        chunks' emission."""
        d = {k: jax.device_put(v, dev) for k, v in host.items()}
        fn = _compiled(fmax, slots, True)
        return fn(d["pcm"], d["nf"], arrs["sil_max"], d["keep"], d["thr"],
                  d["dlim"], d["cape"], d["hdr_scale"], d["wanted"])

    ranges = [(i, min(i + chunk, n)) for i in range(0, n, chunk)]
    ex_up = ThreadPoolExecutor(1)
    ex_fetch = ThreadPoolExecutor(1)
    out = [None] * n
    disp_q = []                   # (dispatch future, lo, cis, setups)
    fetch_q = []                  # (fetch future, lo, cis, setups)

    def emit_ready(block=False):
        """Chain completed dispatches into the fetch thread, and emit
        chunks whose fetch has landed (main-thread work, overlapped
        with the link and device)."""
        while disp_q and (block or disp_q[0][0].done()):
            fb, lo0, cis0, setups0 = disp_q.pop(0)
            fetch_q.append((ex_fetch.submit(np.asarray, fb.result()),
                            lo0, cis0, setups0))
        while fetch_q and (block or fetch_q[0][0].done()):
            fut, lo0, cis0, setups0 = fetch_q.pop(0)
            buf_np = fut.result()
            for i, st in enumerate(setups0):
                out[lo0 + i] = (_emit_from_packed(buf_np[i], cis0[i], st,
                                                  slots), st.n_frames)

    fmax0, cis0, setups0, arrs0, host0 = prep(*ranges[0])
    fut_buf = ex_up.submit(up_and_dispatch, host0, fmax0, arrs0)
    meta = (cis0, setups0)
    for idx, (lo, hi) in enumerate(ranges):
        cis, setups = meta
        disp_q.append((fut_buf, lo, cis, setups))
        if idx + 1 < len(ranges):
            fmax1, cis1, setups1, arrs1, host1 = prep(*ranges[idx + 1])
            fut_buf = ex_up.submit(up_and_dispatch, host1, fmax1, arrs1)
            meta = (cis1, setups1)
        emit_ready()
    emit_ready(block=True)
    ex_up.shutdown()
    ex_fetch.shutdown()
    return out

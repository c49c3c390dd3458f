"""Batched JAX twin of the integer-canonical encoder core (core94.py).

Every decision here is integer (or an exact-floor float32 division, see
``core94.rdiv``), so this jitted pipeline emits *byte-identical* streams to
the numpy core from the same canonical coefficients — on the CPU backend
(single-stream encode) and on the TPU (the batched ``encode_files_device``
path, data parallel over files × the ×4 format-candidate search; reference
anchor: DCSEncoder.cpp:784-853, 1502-1621).

Device layout: the per-band work runs on a padded [16, 32] grid (bands ×
lanes — band sizes are 7, 8, 13×16, 32), the emission on the flat [255]
transmit order.  The whole format search is one fused program: decision
tables → wrap refinement → sequential band-type scan (lax.scan over frames,
carry = 16 previous codes) → symbol emission → per-format bit sizes →
winner gather.  The host packs the winner's (values, widths) pairs into
bytes (core94.pack_bits) and prepends the 16-byte header.
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


def _encode_all(ci, mask_f, sil_max, keep, thr, dlim, cape,
                w_lut, sf_lut, amin, amax, pip, dep, wanted):
    """All selected format candidates for one stream + winner selection.

    ci [F,255] i32; luts carry the format-slot axis [K, 16, 16, PMAX]
    (K = selected candidates only — the wildcard search computes 3, not
    4: (0,3) is body-identical to (0,0), core94.skip_dup_format);
    dep [K, 16] bool, wanted [K] bool.  Returns (nbytes [K], winner,
    vals, bits)."""
    import jax
    jnp = _jnp()
    K = w_lut.shape[0]
    pad_src = jnp.asarray(_PAD_SRC)
    padmask = jnp.asarray(_PAD_MASK)
    cpad = jnp.take(ci, pad_src.reshape(-1), axis=1).reshape(
        ci.shape[0], NBANDS, NPAD)
    cpad = cpad * padmask[None]
    big = jnp.int32(1 << 30)
    mn = jnp.min(jnp.where(padmask[None], cpad, big), axis=2)
    mx = jnp.max(jnp.where(padmask[None], cpad, -big), axis=2)
    silent = (mx - mn) <= sil_max

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
    return (nbytes, winner, codes[winner].astype(jnp.uint8),
            pidx[winner].astype(jnp.uint8))


@functools.lru_cache(maxsize=None)
def _compiled(fmax, k):
    import jax
    del fmax, k                    # cache key only (shapes bake into jit)
    return jax.jit(jax.vmap(_encode_all))


def _bucket(f):
    return max(64, -(-f // 64) * 64)


def setup_arrays(ci_list, params):
    """Host setup for a batch: per-stream StreamSetup → stacked device
    arrays + per-stream (setup, wanted mask, headers)."""
    setups = []
    slots = []                         # per stream: slot index → FormatSetup
    B = len(ci_list)
    # preserve the numpy core's format filter semantics (shared by every
    # stream — the filter depends only on params)
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
    K = len(sel)
    w_lut = np.ones((B, K, 16, 16, PMAX), dtype=np.int32)
    sf_lut = np.ones_like(w_lut)
    amin = np.zeros_like(w_lut)
    amax = np.zeros_like(w_lut)
    pip = np.zeros((B, K, 16), dtype=np.int32)
    dep = np.zeros((B, K, 16), dtype=bool)
    keep = np.zeros((B, 16), dtype=bool)
    thr = np.zeros((B, 16), dtype=np.int32)
    dlim = np.zeros((B, 16), dtype=np.int32)
    cape = np.zeros((B, 16), dtype=np.int32)
    sil_max = np.zeros(B, dtype=np.int32)
    wanted = np.ones((B, K), dtype=bool)
    import math
    for i, ci in enumerate(ci_list):
        st = c94.setup94(ci, params, wanted=sel)
        setups.append(st)
        slots.append(list(st.formats))
        for k, fs in enumerate(st.formats):
            assert (np.abs(fs.amax_lut) < (1 << 31)).all()
            assert (np.abs(fs.amin_lut) < (1 << 31)).all()
            w_lut[i, k] = fs.w_lut
            sf_lut[i, k] = fs.sf_lut
            amin[i, k] = np.clip(fs.amin_lut, -(1 << 31) + 1, (1 << 31) - 1)
            amax[i, k] = np.clip(fs.amax_lut, -(1 << 31) + 1, (1 << 31) - 1)
            pip[i, k] = fs.pidx_of_prev
            dep[i, k, :3] = fs.fmt_type == 1
        keep[i, :st.bands_keep] = True
        thr[i] = st.thr
        dlim[i] = np.asarray(
            [math.isqrt(max(int(t), 0)) + 1 for t in st.thr], np.int32)
        cape[i] = np.minimum(thr[i].astype(np.int64) + 1, 1 << 25)
        sil_max[i] = st.sil_max
    return setups, slots, (w_lut, sf_lut, amin, amax, pip, dep, keep, thr,
                           dlim, cape, sil_max, wanted)


def encode_batch(ci_list, params, backend=None):
    """Encode a batch of coefficient arrays ([F_i, 255] int32) in one
    device program.  Returns list of stream bytes, byte-identical to
    core94.encode_stream94_np for every stream."""
    import jax.numpy as jnp
    B = len(ci_list)
    fmax = _bucket(max(ci.shape[0] for ci in ci_list))
    ci = np.zeros((B, fmax, 255), dtype=np.int32)
    mask = np.zeros((B, fmax), dtype=bool)
    for i, c in enumerate(ci_list):
        ci[i, :c.shape[0]] = c
        mask[i, :c.shape[0]] = True

    setups, slots, arrs = setup_arrays(ci_list, params)
    (w_lut, sf_lut, amin, amax, pip, dep, keep, thr, dlim, cape,
     sil_max, wanted) = arrs
    fn = _compiled(fmax, w_lut.shape[1])
    import jax
    dev = jax.devices(backend)[0] if backend else None
    put = (lambda a: jax.device_put(a, dev)) if dev else jnp.asarray
    nbytes, winner, codes, pidx = fn(
        put(ci), put(mask), put(sil_max), put(keep), put(thr), put(dlim),
        put(cape), put(w_lut), put(sf_lut), put(amin), put(amax), put(pip),
        put(dep), put(wanted))
    nbytes = np.asarray(nbytes)
    winner = np.asarray(winner)
    codes = np.asarray(codes).astype(np.int8)
    pidx = np.asarray(pidx).astype(np.int8)

    from .. import native
    out = []
    for i, st in enumerate(setups):
        k = int(winner[i])
        fs = slots[i][k]
        F = st.n_frames
        body = native.emit94_with_codes(ci_list[i], fs, codes[i, :F],
                                        pidx[i, :F], st.bands_keep)
        if body is None:               # no native toolchain: numpy emission
            vals, bits = c94.emit94_np(ci_list[i], st, fs,
                                       codes[i, :F].astype(np.int64),
                                       pidx[i, :F].astype(np.int64))
            body = c94.pack_bits(vals, bits)
        stream = (st.n_frames.to_bytes(2, "big") + fs.header + body)
        assert len(stream) == int(nbytes[i, k]), \
            (len(stream), int(nbytes[i, k]))
        out.append(bytes(stream))
    return out

"""Batched catalog sweep: decode many tracks end-to-end on device.

This is the throughput model (BASELINE config #3): every stream's frames
decode in parallel (symbol scan batched over frames), then dequant/scale,
inverse transform, and overlap-add resolve — one jitted program per stream
shape, vmappable over a padded stream batch for whole-catalog sweeps.

Sharding: the stream axis is pure data parallel ('tracks'); the frame axis
can additionally be sharded ('frames') — the only cross-frame coupling is the
16-word overlap shift, which XLA lowers to a neighbor collective-permute.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import band_decode as bd
from ..ops import prescan
from ..ops import transform as tf


def stream_decode(stream_bytes, rel_start, header, fmt_type, sub_type,
                  band_type, band_type_prev, mix, vol_shift, overlap0,
                  n_steps=256):
    """Fully decode one stream's F frames on device (single voice).

    stream_bytes: [L] int32; rel_start: [F]; header: [16]; band_type(_prev):
    [F, 16]; mix, vol_shift: [F]; overlap0: [16].
    Returns (pcm [F, 240] u16 storage, final overlap [16]).
    """
    dense, ctl = bd.decode_frames94(stream_bytes, rel_start, header,
                                    fmt_type, sub_type,
                                    band_type, band_type_prev, n_steps=n_steps)
    fb = bd.dequant_mix(dense, ctl, mix)
    re, im = tf.transform94_planar(fb, vol_shift)
    return tf.overlap_resolve_planar_state(re, im, overlap0)


def batch_decode(stream_bytes, rel_start, headers, fmt_type, sub_type,
                 band_type, band_type_prev, mix, vol_shift, n_steps=256):
    """Catalog sweep over a stream batch: vmap of stream_decode.

    stream_bytes: [S, L]; rel_start: [S, F]; headers: [S, 16];
    band_type(_prev): [S, F, 16]; mix/vol_shift: [S, F].
    fmt_type/sub_type are static (batch streams of one format family per
    call; the host sweep driver groups streams by family).
    Returns pcm [S, F, 240] u16 storage.
    """
    S = stream_bytes.shape[0]
    ov0 = jnp.zeros((S, 16), jnp.int32)
    fn = jax.vmap(stream_decode,
                  in_axes=(0, 0, 0, None, None, 0, 0, 0, 0, 0, None))
    pcm, _ = fn(stream_bytes, rel_start, headers, fmt_type, sub_type,
                band_type, band_type_prev, mix, vol_shift, ov0, n_steps)
    return pcm


class SweepInputs:
    """Host-side packing of a set of streams into padded device arrays."""

    def __init__(self, streams, mixing_level=0x64, master_volume=0x67):
        """streams: list of raw DCS stream byte buffers (1994+ family)."""
        idxs = [prescan.prescan94(s, 0) for s in streams]
        S = len(streams)
        F = max(i.n_frames for i in idxs)
        L = max(int(i.end_bit[-1] // 8) + 8 for i in idxs)
        self.n_frames = np.array([i.n_frames for i in idxs], dtype=np.int32)

        sb = np.zeros((S, L), dtype=np.int32)
        rs = np.zeros((S, F), dtype=np.int32)
        hd = np.zeros((S, 16), dtype=np.int32)
        bt = np.zeros((S, F, 16), dtype=np.int32)
        btp = np.zeros((S, F, 16), dtype=np.int32)
        for k, (s, i) in enumerate(zip(streams, idxs)):
            b = np.frombuffer(bytes(s) + b"\xff" * (L - min(L, len(s))),
                              dtype=np.uint8)[:L]
            sb[k, :b.size] = b
            n = i.n_frames
            rs[k, :n] = i.start_bit
            rs[k, n:] = i.start_bit[n - 1] if n else 0   # pad: re-decode last
            hd[k] = i.header
            bt[k, :n] = i.band_type
            bt[k, n:] = i.band_type[n - 1] if n else 0
            btp[k, :n] = i.band_type_prev
            btp[k, n:] = i.band_type_prev[n - 1] if n else 0
        self.fmt_type = idxs[0].fmt_type
        self.sub_type = idxs[0].sub_type
        max_dense = max(int(prescan.scan_totals(i).max()) for i in idxs
                        if i.n_frames)
        self.n_steps = min(256, (max_dense + 7) & ~7)

        # exact per-frame single-voice controls from the host VM tracer
        # (the first frames differ from steady state; replicate exactly)
        from .pipeline import ControlTracer
        from ..refdec import decoder as rd
        mix = np.zeros((S, F), dtype=np.int32)
        vol = np.zeros((S, F), dtype=np.int32)
        for k, s in enumerate(streams):
            tr = ControlTracer()
            tr.default_volume = master_volume
            tr.init_standalone(rd.OS94)
            tr.soft_boot()
            tr.load_audio_stream(0, s, mixing_level=mixing_level)
            tr.trace_frames(int(self.n_frames[k]))
            for t, entries in enumerate(tr.trace_entries):
                for (c, _, fidx, m) in entries:
                    if c == 0 and fidx == t:
                        mix[k, t] = m
            vol[k, :self.n_frames[k]] = tr.trace_vol_shift
            if self.n_frames[k] < F:
                mix[k, self.n_frames[k]:] = mix[k, max(0, self.n_frames[k] - 1)]
                vol[k, self.n_frames[k]:] = vol[k, max(0, self.n_frames[k] - 1)]

        self.stream_bytes = sb
        self.rel_start = rs
        self.headers = hd
        self.band_type = bt
        self.band_type_prev = btp
        self.mix = mix
        self.vol_shift = vol

    def args(self):
        return (jnp.asarray(self.stream_bytes), jnp.asarray(self.rel_start),
                jnp.asarray(self.headers), self.fmt_type, self.sub_type,
                jnp.asarray(self.band_type), jnp.asarray(self.band_type_prev),
                jnp.asarray(self.mix), jnp.asarray(self.vol_shift),
                self.n_steps)


# ----------------------------------------------------------------------
# Hybrid fast path: native host symbol decode + device numerics
# ----------------------------------------------------------------------

def hybrid_stage_device(dense, scale, fb_idx, valid, mix, vol_shift):
    """Device stage of the hybrid path for one stream: exact dequant/scale,
    inverse transform, overlap resolve.  dense/scale/fb_idx/valid: [F, 256];
    mix/vol_shift: [F]."""
    fb = bd.dequant_mix_dense(dense, (scale, fb_idx, valid), mix)
    re, im = tf.transform94_planar(fb, vol_shift)
    return tf.overlap_resolve_planar_state(re, im, jnp.zeros(16, jnp.int32))[0]


def hybrid_batch_device(dense, scale, fb_idx, valid, mix, vol_shift):
    """[S, F, ...] batched hybrid device stage."""
    return jax.vmap(hybrid_stage_device)(dense, scale, fb_idx, valid,
                                         mix, vol_shift)


def hybrid_host_stage(streams):
    """Native host symbol decode for a stream batch; returns packed arrays
    [S, F, 256] (padded to the max frame count) or None if the native
    runtime is unavailable."""
    from .. import native
    results = native.decode_dense_batch(streams)
    if results is None:
        return None
    S = len(results)
    F = max(r.n_frames for r in results)
    dense = np.zeros((S, F, 256), dtype=np.int32)
    scale = np.zeros((S, F, 256), dtype=np.int32)
    fbix = np.zeros((S, F, 256), dtype=np.int32)
    valid = np.zeros((S, F, 256), dtype=bool)
    for k, r in enumerate(results):
        n = r.n_frames
        dense[k, :n] = r.dense
        scale[k, :n] = r.scale
        fbix[k, :n] = r.fb_idx
        valid[k, :n] = r.valid.astype(bool)
    return dense, scale, fbix, valid, [r.n_frames for r in results]

"""TPU decode pipeline: host VM control + device numerics.

Architecture (SURVEY.md §7): the branchy, pointer-chasing runtime — track
byte-code VM, command queue, mixer fades, volume — runs on host as a cheap
*control tracer* (a stubbed ``ReferenceDecoder`` that skips all per-sample
math), emitting per-frame control vectors: which stream frame plays on which
channel at what mixing multiplier, plus the global volume shift.  The device
then executes the entire numeric pipeline for ALL frames in parallel:

  bitstream symbol decode (ops/band_decode.decode_frames94)
  → dequant/scale/mix accumulate over channels (dequant_mix)
  → inverse transform (ops/transform.transform94_planar)
  → overlap-add resolve (pure shift, no scan)

Every PCM word is bit-exact with the scalar reference decoder.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..format import tables as T
from ..ops import band_decode as bd
from ..ops import prescan
from ..ops import transform as tf
from ..refdec import decoder as rd
from ..vm.tracer import ControlTracer


class StreamBank:
    """Prescanned + device-decoded streams (the HBM-resident bitstream pool).

    Holds, for every registered stream, the dense per-frame sample values and
    slot controls produced by the device symbol-decode kernel, concatenated
    into global arrays indexed by (stream, frame).
    """

    def __init__(self, os_version):
        self.os_version = os_version
        # 94/95 family decodes ahead of time into dense arrays; the 93
        # family decodes per session from the bitstream pool + prescan index
        self.family93 = os_version in (rd.OS93A, rd.OS93B)
        self.keys = {}
        self._streams = []

    def add(self, mem, pos=0):
        key = (id(mem), pos)
        if key in self.keys:
            return key
        if self.family93:
            fmt1_93a = (self.os_version == rd.OS93A
                        and (int(mem[pos + 2]) & 0x80) != 0)
            if fmt1_93a:
                from ..ops import decode93a
                idx = decode93a.prescan93a(mem, pos)
            else:
                from ..ops import decode93
                idx = decode93.prescan93(mem, pos)
            data_end = (int(idx.end_bit[-1]) // 8 + 8) if idx.n_frames \
                else pos + 18
            raw = np.frombuffer(bytes(mem[pos:data_end + 4]) + b"\xff" * 8,
                                dtype=np.uint8)
            self.keys[key] = len(self._streams)
            self._streams.append((idx, raw, pos, fmt1_93a))
            return key
        idx = prescan.prescan94(mem, pos)
        if idx.error_frame >= 0:
            raise ValueError(f"stream error at frame {idx.error_frame}")
        data_end = int(idx.end_bit[-1] // 8 + 8) if idx.n_frames else pos + 18
        raw = np.frombuffer(bytes(mem[pos:data_end + 4]) + b"\xff" * 8, dtype=np.uint8)
        self.keys[key] = len(self._streams)
        self._streams.append((idx, raw, pos))
        return key

    def decode_all(self):
        """Run the device symbol-decode kernel for every stream; build the
        global dense-value/slot-control arrays."""
        if self.family93:
            return self._build93()
        vals, scales, totals, offsets = [], [], [], {}
        total = 1  # row 0 is the silent dummy row
        for key, si in self.keys.items():
            idx, raw, pos = self._streams[si]
            sb = jnp.asarray(raw.astype(np.int32))
            # prescan bit offsets are absolute in mem; raw starts at pos
            rel_start = (idx.start_bit - pos * 8).astype(np.int32)
            n_steps = (min(256, (int(prescan.scan_totals(idx).max()) + 7) & ~7)
                       if idx.n_frames else 8)
            dense, (scale, tot) = jax.jit(
                bd.decode_frames94, static_argnums=(3, 4, 7))(
                sb, jnp.asarray(rel_start), jnp.asarray(idx.header, jnp.int32),
                int(idx.fmt_type), int(idx.sub_type),
                jnp.asarray(idx.band_type, jnp.int32),
                jnp.asarray(idx.band_type_prev, jnp.int32), n_steps)
            vals.append(np.asarray(dense))
            scales.append(np.asarray(scale))
            totals.append(np.asarray(tot))
            offsets[key] = total
            total += idx.n_frames
        z = np.zeros((1, 256), dtype=np.int32)
        self.dense = jnp.asarray(np.concatenate([z] + vals, axis=0))
        self.scale = jnp.asarray(np.concatenate([z] + scales, axis=0))
        self.total = jnp.asarray(np.concatenate(
            [np.zeros(1, np.int32)] + totals, axis=0))
        self.offsets = offsets
        return self

    def _build93(self):
        """93-family: concatenate the streams into one bitstream pool and
        stack the prescan indices into global per-frame-row arrays (row 0 =
        silent dummy); decode runs per session in device_decode."""
        from ..ops import decode93, decode93a
        pool = bytearray()
        offsets = {}
        rows93, rows93a = [], []
        total = 1
        nwords = 1
        for key, si in self.keys.items():
            idx, raw, pos, is93a = self._streams[si]
            bit_base = len(pool) * 8 - pos * 8
            pool += bytes(raw)
            F = idx.n_frames
            if is93a:
                a = decode93a.index_arrays(idx, bit_base=bit_base)
                rows93a.append((total, {k: np.asarray(v) for k, v in a.items()}, F))
                nwords = max(nwords,
                             decode93a.window_words_needed(idx, bit_base))
            else:
                a = decode93.index_arrays(idx, bit_base=bit_base)
                rows93.append((total, {k: np.asarray(v) for k, v in a.items()}, F))
                nwords = max(nwords,
                             decode93.window_words_needed(idx, bit_base))
            offsets[key] = total
            total += F

        def stack(rows, keys_shapes):
            out = {k: np.zeros((total,) + shp, dtype=np.int32)
                   for k, shp in keys_shapes.items()}
            for (base, arrs, F) in rows:
                for k in out:
                    out[k][base:base + F] = arrs[k]
            return {k: jnp.asarray(v) for k, v in out.items()}

        self.idx93 = stack(rows93, {
            "frame_word": (), "kind": (16,), "width": (16,), "n_samp": (16,),
            "bit_start": (16,), "out_start": (16,), "out_inc": (16,),
            "scale": (16,), "prv_in": (16,), "prv_dl": (16,)})
        self.idx93a = stack(rows93a, {
            "frame_word": (),
            "bits": (decode93a.N_BANDS,),
            "bit_start": (decode93a.N_BANDS,),
            "scale32": (decode93a.N_BANDS,)})
        self.has93 = bool(rows93)
        self.has93a = bool(rows93a)
        pool += b"\xff" * 8
        pool_bytes = np.frombuffer(bytes(pool), dtype=np.uint8).astype(np.int32)
        # one row gather per frame: rows wide enough for the largest frame
        self.pool_quads = bd.window_rows(jnp.asarray(pool_bytes), nwords)
        self.offsets = offsets
        return self

    def total_rows(self):
        """Number of global dense rows (incl. the silent dummy row 0)."""
        return 1 + sum(
            self._streams[si][0].n_frames for si in self.keys.values())

    def jitted(self):
        """A cached jit of device_decode (reused across sessions so each
        new session with the same bank skips retracing)."""
        if not hasattr(self, "_jitted"):
            self._jitted = jax.jit(self.device_decode)
        return self._jitted

    def device_decode(self, rows, mix, vol_shift, overlap0=None):
        """Decode T runtime frames on device for this bank's format family."""
        if not self.family93:
            return device_decode((self.dense, self.scale, self.total),
                                 rows, mix, vol_shift, overlap0)
        from ..ops import decode93, decode93a
        rows = jnp.asarray(rows, jnp.int32)
        mix = jnp.asarray(mix, jnp.int32)
        vol_shift = jnp.asarray(vol_shift, jnp.int32)
        Tn = rows.shape[0]
        if overlap0 is None:
            overlap0 = jnp.zeros(16, jnp.int32)
        fb = jnp.zeros((Tn, 512), jnp.int32)
        for c in range(rd.MAX_CHANNELS):
            r = rows[:, c]
            # zero-filled rows of the other kind contribute nothing, so both
            # kernels chain unconditionally
            if self.has93:
                arrs = {k: v[r] for k, v in self.idx93.items()}
                fb = decode93.decode93_frames(self.pool_quads, arrs,
                                              mix[:, c], fb_prev=fb)
            if self.has93a:
                arrs = {k: v[r] for k, v in self.idx93a.items()}
                fb = decode93a.decode93a_frames(self.pool_quads, arrs,
                                                mix[:, c], fb_prev=fb)
        raw = tf.transform93_raw(fb, vol_shift)
        return tf.overlap_resolve93(raw, overlap0)


def assemble_controls(tracer: ControlTracer, bank: StreamBank):
    """Convert the VM trace into dense device control arrays.

    Returns (rows [T, 8] global dense-row per channel (0 = silent),
             mix [T, 8], vol_shift [T])."""
    T_ = len(tracer.trace_vol_shift)
    rows = np.zeros((T_, rd.MAX_CHANNELS), dtype=np.int32)
    mix = np.zeros((T_, rd.MAX_CHANNELS), dtype=np.int32)
    for t, entries in enumerate(tracer.trace_entries):
        for (c, key, fidx, m) in entries:
            rows[t, c] = bank.offsets[key] + fidx
            mix[t, c] = m
    vol = np.asarray(tracer.trace_vol_shift, dtype=np.int32)
    return rows, mix, vol


def device_decode(bank_arrays, rows, mix, vol_shift, overlap0=None):
    """Decode T runtime frames on device; bit-exact with the scalar decoder.

    bank_arrays: (dense, scale, total) global stream-frame arrays;
    rows/mix: [T, 8]; vol_shift: [T].  Returns pcm [T, 240] u16 storage.
    """
    dense_all, scale_all, total_all = bank_arrays
    rows = jnp.asarray(rows, jnp.int32)
    mix = jnp.asarray(mix, jnp.int32)
    vol_shift = jnp.asarray(vol_shift, jnp.int32)
    Tn = rows.shape[0]
    if overlap0 is None:
        overlap0 = jnp.zeros(16, jnp.int32)

    fb = jnp.zeros((Tn, 512), jnp.int32)
    for c in range(rd.MAX_CHANNELS):
        r = rows[:, c]
        active = r > 0
        ctl = (scale_all[r], total_all[r])
        fb = bd.dequant_mix(dense_all[r], ctl, mix[:, c], fb_prev=fb,
                            active=active)

    re, im = tf.transform94_planar(fb, vol_shift)
    pcm, last_ov = tf.overlap_resolve_planar_state(re, im, overlap0)
    return pcm, last_ov


def decode_standalone(streams, os_version=rd.OS94, default_volume=0x67,
                      n_frames=None, events=None):
    """End-to-end standalone decode on device.

    streams: list of (mem, channel, mixing_level) loaded at frame 0.
    Returns int16 PCM [n_frames * 240].
    """
    bank = StreamBank(os_version)
    for (mem, _, _) in streams:
        bank.add(mem, 0)
    bank.decode_all()

    tracer = ControlTracer()
    tracer.default_volume = default_volume
    tracer.init_standalone(os_version)
    tracer.soft_boot()
    for (mem, ch, lvl) in streams:
        tracer.load_audio_stream(ch, mem, mixing_level=lvl)
    if n_frames is None:
        n_frames = 4 + max(prescan.prescan94(mem, 0).n_frames
                           for (mem, _, _) in streams)
    tracer.trace_frames(n_frames, events=events)

    rows, mix, vol = assemble_controls(tracer, bank)
    pcm, _ = jax.jit(bank.device_decode)(rows, mix, vol)
    pcm = np.asarray(pcm).reshape(-1)
    return ((pcm & 0xFFFF) ^ 0x8000).astype(np.int32) - 0x8000

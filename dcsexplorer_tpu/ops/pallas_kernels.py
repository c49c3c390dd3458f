"""Pallas TPU kernels for the decode pipeline's elementwise stages.

Scope and honesty notes (measured on a v5e chip, see ARCHITECTURE.md):

- The pipeline's dominant cost is the symbol-decode scan, whose per-lane
  bitstream-window gather is NOT expressible in Mosaic's supported gather
  forms (only same-shape take_along_axis lowers; see
  jax/_src/pallas/mosaic/lowering.py `_gather_lowering_rule`), so the scan
  stays a lax.scan where XLA's gather is the best available lowering.
- The position-order dequant/scale/mix stage IS Pallas-friendly: pure
  elementwise int32 arithmetic.  This module provides it as a fused Pallas
  kernel — one VMEM-resident pass per block instead of whatever fusion XLA
  chooses — with bit-exact semantics (ops/band_decode.dequant_mix).

The kernel exists as a drop-in alternative; the default pipeline keeps the
XLA path, which fuses the dequant into its neighbors and measures on par.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M16 = 0xFFFF


def _s16(x):
    return x - ((x & 0x8000) << 1)


def _dequant_kernel(pos_ref, scale_ref, total_ref, mix_ref, prev_ref,
                    out_ref):
    """One block: [B, 512] accumulator update from [B, 256] positions."""
    pos_vals = pos_ref[:]                   # [B, 256]
    scale = scale_ref[:]
    total = total_ref[:]                    # [B, 1]
    mix = mix_ref[:]                        # [B, 1]
    fb_prev = prev_ref[:]                   # [B, 512]

    S = pos_vals.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, pos_vals.shape, 1)
    valid = idx < total

    scaled = (_s16(pos_vals) * (scale & M16)) & M16
    scaled = jnp.where(valid, scaled, 0)
    mixprod = _s16(scaled) * (mix & M16)

    outbuf1 = fb_prev[:, 1:2]
    out_old = fb_prev[:, 1:1 + S]
    prod = ((_s16(out_old) << 16) | scaled) + mixprod
    new_val = (prod >> 16) & M16

    # pass the untouched tail through, then overwrite positions 1..S
    out_ref[:] = fb_prev
    out_ref[:, 1:1 + S] = new_val

    # first-sample delta fixup (saturating); position 1's payload lands in
    # position 0, and position 1 keeps its prior value
    delta = jnp.clip(_s16(new_val[:, 0:1]) - _s16(outbuf1), -32768, 32767)
    fb0 = jnp.clip(delta + _s16(fb_prev[:, 0:1]), -32768, 32767) & M16
    out_ref[:, 0:1] = fb0
    out_ref[:, 1:2] = outbuf1


def dequant_mix_pallas(pos_vals, slot_ctl, mix, fb_prev=None, block=512,
                       interpret=False):
    """Pallas version of ops/band_decode.dequant_mix (single-voice form:
    active-channel masking folds into `total`/`mix` by the caller)."""
    scale, total = slot_ctl
    F, S = pos_vals.shape
    if fb_prev is None:
        fb_prev = jnp.zeros((F, 512), jnp.int32)
    pad = (-F) % block
    if pad:
        pos_vals = jnp.pad(pos_vals, ((0, pad), (0, 0)))
        scale = jnp.pad(scale, ((0, pad), (0, 0)))
        total = jnp.pad(total, (0, pad))
        mix = jnp.pad(mix, (0, pad))
        fb_prev = jnp.pad(fb_prev, ((0, pad), (0, 0)))
    N = pos_vals.shape[0]
    grid = N // block

    out = pl.pallas_call(
        _dequant_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 512), jnp.int32),
        interpret=interpret,
    )(pos_vals, scale, total.reshape(-1, 1), mix.reshape(-1, 1), fb_prev)
    return out[:F]

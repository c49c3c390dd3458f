"""Pallas kernel parity: the fused dequant kernel must match the XLA
reference implementation bit-for-bit."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcsexplorer_tpu.ops import band_decode as bd
from dcsexplorer_tpu.ops import pallas_kernels as pk
from dcsexplorer_tpu.ops import prescan

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "streams")


def test_dequant_pallas_bit_exact():
    streams = [open(p, "rb").read()
               for p in sorted(glob.glob(os.path.join(ASSETS, "*.dcs94")))]
    assert streams
    s = streams[0]
    idx = prescan.prescan94(s, 0)
    pool = np.frombuffer(bytes(s) + b"\xff" * 8, dtype=np.uint8).astype(np.int32)
    n_steps = min(256, (int(prescan.scan_totals(idx).max()) + 7) & ~7)
    dense, ctl = jax.jit(bd.decode_frames94, static_argnums=(3, 4, 7))(
        jnp.asarray(pool), jnp.asarray(idx.start_bit, jnp.int32),
        jnp.asarray(idx.header, jnp.int32), int(idx.fmt_type),
        int(idx.sub_type), jnp.asarray(idx.band_type, jnp.int32),
        jnp.asarray(idx.band_type_prev, jnp.int32), n_steps)
    F = idx.n_frames
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.integers(0, 1 << 16, size=F), jnp.int32)
    prev = jnp.asarray(rng.integers(0, 1 << 16, size=(F, 512)), jnp.int32)

    ref = bd.dequant_mix(dense, ctl, mix, fb_prev=prev)
    try:
        interp = jax.devices()[0].platform != "tpu"
        got = pk.dequant_mix_pallas(dense, ctl, mix, fb_prev=prev,
                                    block=128, interpret=interp)
    except Exception as e:                       # pragma: no cover
        pytest.skip(f"pallas unavailable on this backend: {e}")
    r = np.asarray(ref) & 0xFFFF
    g = np.asarray(got) & 0xFFFF
    assert np.array_equal(r, g), \
        f"mismatch at {np.argwhere(r != g)[:4]}"

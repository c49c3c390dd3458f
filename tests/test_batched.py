"""Batched catalog sweep: bit-exact vs. the compiled reference, per stream."""

import glob
import os

import numpy as np
import pytest

import jax

from dcsexplorer_tpu.models import batched

from . import oracle

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "streams")


def _asset_streams():
    return [open(p, "rb").read()
            for p in sorted(glob.glob(os.path.join(ASSETS, "*.dcs94")))]


def test_batch_decode_bit_exact_vs_oracle():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")
    streams = _asset_streams()
    assert streams, "missing stream assets"

    # the padded model takes fmt/sub as static arguments — its contract is
    # one format family per batch (models/batched.py:46); the flagship flat
    # sweep handles mixed-format catalogs.  Group accordingly.
    groups = {}
    for s in streams:
        hdr = s[2:18]
        fmt = (hdr[0] & 0x80) >> 7
        sub = ((hdr[1] & 0x80) >> 6) | ((hdr[2] & 0x80) >> 7)
        groups.setdefault((fmt, sub), []).append(s)

    for (fmt, sub), grp in groups.items():
        inputs = batched.SweepInputs(grp)
        pcm = jax.jit(batched.batch_decode,
                      static_argnums=(3, 4, 9))(*inputs.args())
        pcm = np.asarray(pcm)
        pcm_i16 = (((pcm & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int16)

        for k, s in enumerate(grp):
            n = int(inputs.n_frames[k])
            ref = oracle.OracleDecoder(os_version=oracle.OS94,
                                       default_volume=0x67)
            ref.load_stream(s, channel=0, mixing_level=0x64)
            golden = ref.next_samples(n * 240)
            got = pcm_i16[k, :n].reshape(-1)
            mism = np.nonzero(golden != got)[0]
            assert mism.size == 0, (
                f"fmt {fmt}/{sub} stream {k}: {mism.size} mismatches, "
                f"first at {mism[0]} (frame {mism[0]//240})")


def test_flat_sweep_bit_exact_vs_oracle():
    if oracle.get_lib() is None:
        pytest.skip("reference oracle unavailable")
    from dcsexplorer_tpu.models import flatsweep
    streams = _asset_streams()
    sw = flatsweep.FlatSweep(streams).pack()
    pcm = flatsweep.run_flat(sw)
    pos = 0
    for k, s in enumerate(streams):
        nf = (s[0] << 8) | s[1]
        ref = oracle.OracleDecoder(os_version=oracle.OS94, default_volume=0x67)
        ref.load_stream(s, channel=0, mixing_level=0x64)
        golden = ref.next_samples(nf * 240)
        got = pcm[pos:pos + nf * 240]
        assert np.array_equal(golden, got), f"flat sweep stream {k} mismatch"
        pos += nf * 240


def test_flat_packed_matches_wide():
    """The transfer-compact packed pipeline (uint8 pool, derived
    btp/sstart, per-stream header table) is bit-identical to the wide
    flat pipeline on a mixed-format catalog."""
    from dcsexplorer_tpu.models import flatsweep
    from dcsexplorer_tpu.ops import band_decode as bd
    import jax.numpy as jnp

    streams = _asset_streams() * 2          # repeated entries: sid must
    sw = flatsweep.FlatSweep(streams).pack()  # still mark stream starts
    wide = flatsweep.run_flat(sw)

    ca = sw.compact_host_arrays()
    n_steps = ca.pop("n_steps")
    fn = jax.jit(flatsweep.flat_pipeline_packed, static_argnums=(9,))
    pcm = np.asarray(fn(*[jnp.asarray(v) for v in ca.values()], n_steps))
    got = (((pcm & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int16).reshape(-1)
    assert np.array_equal(wide, got)

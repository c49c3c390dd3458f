"""Flat multi-stream 93-family sweep + fused mixed-catalog program.

The heterogeneous cold catalog sweep (models/catalogsweep.py) concatenates
many 1993-family streams on one flat frame axis with globalized bit
offsets and a stream-start overlap reset — this suite pins that the flat
path is bit-exact against per-stream scalar decode, and that the fused
all-family program (94 + 93b + 93a-T1 in one dispatch) reproduces the
per-family checksums.  Integration shape anchor:
/root/reference/DCSDecoder/Tests/test-all.bat:27-76.
"""

import os

import numpy as np
import pytest

from dcsexplorer_tpu.models import catalogsweep
from dcsexplorer_tpu.refdec.decoder import OS93A, OS93B, ReferenceDecoder

from .test_format93 import (build_stream93_fmt0, build_stream93_fmt1,
                            build_stream93a_type1)

HERE = os.path.dirname(os.path.abspath(__file__))
STREAMS = os.path.join(HERE, "..", "assets", "streams")


def _read(name):
    with open(os.path.join(STREAMS, name), "rb") as f:
        return f.read()


def _scalar_pcm(stream, os_version, n_frames):
    dec = ReferenceDecoder()
    dec.default_volume = 255
    dec.init_standalone(os_version)
    dec.soft_boot()
    dec.load_audio_stream(0, bytes(stream), mixing_level=0x64)
    return np.array(dec.next_samples(n_frames * 240), dtype=np.int16)


def test_flat93_multi_stream_bit_exact():
    """Three heterogeneous 93b streams (both format types, different
    lengths) on one flat axis == per-stream scalar decode."""
    streams = [build_stream93_fmt0(seed=7), build_stream93_fmt1(seed=8),
               build_stream93_fmt0(seed=9)]
    sweep = catalogsweep.Flat93Sweep(streams, t1=False)
    got = catalogsweep.run_flat93(sweep)
    pos = 0
    for s in streams:
        nf = (s[0] << 8) | s[1]
        want = _scalar_pcm(s, OS93B, nf)
        seg = got[pos:pos + nf * 240]
        mism = np.nonzero(want != seg)[0]
        assert mism.size == 0, (
            f"stream@{pos}: {mism.size} mismatches, first at {mism[0]}")
        pos += nf * 240
    assert pos == got.size


def test_flat93a_multi_stream_bit_exact():
    """Two OS93a Type-1 streams (different selectors) on one flat axis ==
    per-stream scalar decode."""
    streams = [build_stream93a_type1(n_frames=10, n_bands=10, selector=0,
                                     seed=11),
               build_stream93a_type1(n_frames=7, n_bands=12, selector=2,
                                     seed=13)]
    sweep = catalogsweep.Flat93Sweep(streams, t1=True)
    got = catalogsweep.run_flat93(sweep)
    pos = 0
    for s in streams:
        nf = (s[0] << 8) | s[1]
        want = _scalar_pcm(s, OS93A, nf)
        seg = got[pos:pos + nf * 240]
        mism = np.nonzero(want != seg)[0]
        assert mism.size == 0, (
            f"stream@{pos}: {mism.size} mismatches, first at {mism[0]}")
        pos += nf * 240


def test_flat93_asset_streams_bit_exact():
    """The bench's music corpus (93b + 93a Type-0 in ONE batch) decodes
    bit-exactly on the flat axis."""
    streams = [_read("music_a.dcs93b"), _read("music_b.dcs93a")]
    sweep = catalogsweep.Flat93Sweep(streams, t1=False)
    got = catalogsweep.run_flat93(sweep)
    pos = 0
    for s in streams:
        nf = (s[0] << 8) | s[1]
        want = _scalar_pcm(s, OS93B, nf)
        seg = got[pos:pos + nf * 240]
        assert np.array_equal(want, seg)
        pos += nf * 240


def test_catalog_pipeline_fused_checksum():
    """The fused all-family program's checksum == the sum of the three
    family pipelines run separately (one dispatch covers the whole mixed
    catalog)."""
    import jax
    import jax.numpy as jnp
    from dcsexplorer_tpu.models import flatsweep

    s94 = [_read("music_a.dcs94"), _read("tone_low.dcs94")]
    s93 = [_read("music_a.dcs93b"), _read("music_b.dcs93a")]
    s93a = [build_stream93a_type1(n_frames=9, n_bands=10, selector=1,
                                  seed=5)]

    sw94 = flatsweep.FlatSweep(s94)
    sw94.pack()
    a94 = sw94.compact_host_arrays()
    n_steps = a94.pop("n_steps")
    sw93 = catalogsweep.Flat93Sweep(s93, t1=False)
    a93 = sw93.compact_host_arrays()
    sw93a = catalogsweep.Flat93Sweep(s93a, t1=True)
    a93a = sw93a.compact_host_arrays()

    fn = jax.jit(catalogsweep.catalog_pipeline, static_argnums=(3, 4, 5))
    total = int(fn(a94, a93, a93a, n_steps, sw93.nwords, sw93a.nwords))

    pcm94 = flatsweep.run_flat(sw94)
    want = int(np.sum(np.asarray(pcm94).astype(np.int64) & 0xFF))
    want += int(np.sum(catalogsweep.run_flat93(sw93).astype(np.int64)
                       & 0xFF))
    want += int(np.sum(catalogsweep.run_flat93(sw93a).astype(np.int64)
                       & 0xFF))
    # the fused checksum is int32; compare mod 2^32
    assert total % (1 << 32) == want % (1 << 32)

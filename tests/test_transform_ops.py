"""Bit-exactness of the batched device transform vs. the scalar oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcsexplorer_tpu.ops import transform as dev
from dcsexplorer_tpu.refdec import transform as ref


def _random_frames(n, seed):
    rng = np.random.default_rng(seed)
    fb = rng.integers(0, 0x10000, size=(n, 512), dtype=np.int64)
    ov = rng.integers(0, 0x10000, size=(n, 16), dtype=np.int64)
    vs = rng.integers(0, 9, size=(n,), dtype=np.int64)
    return fb, ov, vs


def _scalar94(fb_row, ov_row, vs):
    fb = [int(v) for v in fb_row]
    ov = [int(v) for v in ov_row]
    out = [0] * 240
    ref.transform_frame_94x(fb, ov, out, int(vs))
    return np.array(out), np.array(ov)


def test_transform94_batched_bit_exact():
    fb, ov, vs = _random_frames(24, seed=11)
    pcm, new_ov = jax.jit(dev.transform94)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(ov, jnp.int32),
        jnp.asarray(vs, jnp.int32))
    pcm, new_ov = np.asarray(pcm), np.asarray(new_ov)
    for i in range(fb.shape[0]):
        want_pcm, want_ov = _scalar94(fb[i], ov[i], vs[i])
        assert np.array_equal(pcm[i], want_pcm), f"frame {i} pcm mismatch"
        assert np.array_equal(new_ov[i], want_ov), f"frame {i} overlap mismatch"


def test_transform94_raw_overlap_resolve_chain():
    # F consecutive frames of one stream: raw+resolve must equal the scalar
    # sequential transform with carried overlap
    F = 10
    fb, _, vs = _random_frames(F, seed=23)
    ov0 = np.zeros(16, dtype=np.int64)

    raw = jax.jit(dev.transform94_raw)(jnp.asarray(fb, jnp.int32), jnp.asarray(vs, jnp.int32))
    pcm, last_ov = jax.jit(dev.overlap_resolve)(raw, jnp.asarray(ov0, jnp.int32))
    pcm, last_ov = np.asarray(pcm), np.asarray(last_ov)

    ov = [0] * 16
    for f in range(F):
        fbl = [int(v) for v in fb[f]]
        out = [0] * 240
        ref.transform_frame_94x(fbl, ov, out, int(vs[f]))
        assert np.array_equal(pcm[f], np.array(out)), f"frame {f} mismatch"
    assert np.array_equal(last_ov, np.array(ov))


def test_transform94_saturation_edges():
    # extreme values exercise saturation and the convergent-rounding quirk
    fb = np.zeros((4, 512), dtype=np.int64)
    fb[0, :256] = 0x8000             # all -32768
    fb[1, :256] = 0x7FFF             # all +32767
    fb[2, :258] = 0x8000
    rng = np.random.default_rng(3)
    fb[3] = rng.choice([0x8000, 0x7FFF, 0, 1, 0xFFFF], size=512)
    ov = np.zeros((4, 16), dtype=np.int64)
    vs = np.array([0, 8, 3, 1], dtype=np.int64)

    pcm, new_ov = jax.jit(dev.transform94)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(ov, jnp.int32),
        jnp.asarray(vs, jnp.int32))
    pcm, new_ov = np.asarray(pcm), np.asarray(new_ov)
    for i in range(4):
        want_pcm, want_ov = _scalar94(fb[i], ov[i], vs[i])
        assert np.array_equal(pcm[i], want_pcm), f"edge case {i} mismatch"
        assert np.array_equal(new_ov[i], want_ov)


def test_transform94_planar_bit_exact():
    # planar layout must reproduce transform94_raw exactly: re[k] = raw[2k],
    # im[k] = raw[2k+1], including saturation/rounding edges
    fb, _, vs = _random_frames(64, seed=31)
    fb[0, :256] = 0x8000
    fb[1, :256] = 0x7FFF
    fb[2, :258] = 0x8000
    raw = np.asarray(jax.jit(dev.transform94_raw)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(vs, jnp.int32)))
    re, im = jax.jit(dev.transform94_planar)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(vs, jnp.int32))
    assert np.array_equal(np.asarray(re), raw[:, 0::2])
    assert np.array_equal(np.asarray(im), raw[:, 1::2])


def test_overlap_resolve_planar_matches_flat_composition():
    # the planar resolve must equal resolving the interleaved raw with the
    # stream-start-aware flat composition (three streams in one flat axis)
    F = 30
    fb, _, vs = _random_frames(F, seed=37)
    sstart = np.zeros(F, dtype=bool)
    sstart[[0, 11, 19]] = True
    raw = jax.jit(dev.transform94_raw)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(vs, jnp.int32))
    heads = raw[:, dev._OVL_POS]
    tails = raw[:, dev._SAVE]
    carried = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.int32), tails[:-1]], axis=0)
    carried = jnp.where(jnp.asarray(sstart)[:, None], 0, carried)
    from dcsexplorer_tpu.ops.fixmath import overlap_mix
    blended = overlap_mix(heads, carried,
                          jnp.asarray(dev._OVL_NEW)[None, :],
                          jnp.asarray(dev._OVL_OLD)[None, :])
    want = np.asarray(raw.at[:, dev._OVL_POS].set(blended)[:, dev._EXTRACT])

    re, im = jax.jit(dev.transform94_planar)(
        jnp.asarray(fb, jnp.int32), jnp.asarray(vs, jnp.int32))
    got = np.asarray(jax.jit(dev.overlap_resolve_planar)(
        re, im, jnp.asarray(sstart)))
    assert np.array_equal(got, want)

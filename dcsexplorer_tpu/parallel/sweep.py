"""Multi-chip catalog sweep: shard the batched decode over a device mesh.

Parallel dimensions (SURVEY.md §2.5):
- ``tracks``: pure data parallelism over streams/tracks — each chip decodes a
  shard of the catalog; no collectives in the main body.
- ``frames``: sequence parallelism over the frame axis within streams — the
  only cross-frame coupling is the 16-word overlap-add shift, which XLA
  lowers to a neighbor collective-permute over the ``frames`` axis.

Everything rides jax.sharding + jit: annotate in/out shardings and let XLA
insert the collectives.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import batched


def make_mesh(devices=None, frame_shards=1):
    """Mesh over (tracks, frames).  frame_shards divides the device count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % frame_shards == 0
    dev = np.array(devices).reshape(n // frame_shards, frame_shards)
    return Mesh(dev, ("tracks", "frames"))


def shard_args(mesh, args):
    """Place SweepInputs.args() onto the mesh.

    Layout: stream data and per-frame metadata shard over 'tracks'; the frame
    axis of per-frame arrays additionally shards over 'frames'.
    """
    (sb, rs, hd, fmt, sub, bt, btp, mix, vol, n_steps) = args
    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    return (
        jax.device_put(sb, sh("tracks", None)),
        jax.device_put(rs, sh("tracks", "frames")),
        jax.device_put(hd, sh("tracks", None)),
        fmt, sub,
        jax.device_put(bt, sh("tracks", "frames", None)),
        jax.device_put(btp, sh("tracks", "frames", None)),
        jax.device_put(mix, sh("tracks", "frames")),
        jax.device_put(vol, sh("tracks", "frames")),
        n_steps,
    )


def sharded_sweep(mesh, args):
    """jit-compile and run the catalog sweep over the mesh.

    Returns pcm [S, F, 240] sharded over (tracks, frames).
    """
    args = shard_args(mesh, args)
    out_sharding = NamedSharding(mesh, P("tracks", "frames", None))
    fn = jax.jit(batched.batch_decode, static_argnums=(3, 4, 9),
                 out_shardings=out_sharding)
    with mesh:
        return fn(*args)

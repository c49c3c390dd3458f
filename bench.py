#!/usr/bin/env python
"""Benchmark: batched DCS decode throughput (×realtime per chip).

Runs the full device decode pipeline (Huffman symbol decode → dequant/scale →
inverse transform → overlap-add) over a padded batch of DCS streams — the
catalog-sweep configuration (BASELINE config #3) — and reports throughput as
a multiple of the DCS real-time rate (31,250 samples/s).

``vs_baseline`` is measured against the reference's native-decoder floor of
~20× realtime on one CPU core (BASELINE.md).

Prints ONE JSON line.
"""

import glob
import json
import os
import time


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "build", "jax_cache"))
    import jax
    import numpy as np

    from dcsexplorer_tpu.models import flatsweep
    from dcsexplorer_tpu.ops import band_decode as bd

    streams = []
    for path in sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "assets", "streams", "*.dcs94"))):
        with open(path, "rb") as f:
            streams.append(f.read())
    assert streams, "no benchmark streams found under assets/streams/"

    # replicate the stream set into a catalog-sized batch
    # measured sweet spot on one v5e chip (quad-window scan): ~4400x at
    # 240-288 catalog copies, regressing beyond ~330 (HBM pressure)
    copies = int(os.environ.get("DCS_BENCH_COPIES", "288"))
    catalog = streams * copies
    sweep_in = flatsweep.FlatSweep(catalog).pack()
    args = list(sweep_in.args())
    args[0] = bd.window_quads(args[0])

    import jax.numpy as jnp

    # Reduce to a tiny on-device checksum and fetch it: on the tunneled TPU
    # platform block_until_ready() does not reliably block, and fetching the
    # full PCM would time the (slow dev-tunnel) transfer, not the decode.
    def sweep(*a):
        pcm = flatsweep.flat_pipeline(*a)
        return jnp.sum(pcm & 0xFF, dtype=jnp.int32)

    # with more than one chip, shard the flat frame axis across the devices
    # via the first-class sharded pipeline (parallel/sweep.py, bit-exactness
    # tested on the virtual mesh in tests/test_parallel.py) and report
    # per-chip throughput
    devs = jax.devices()
    n_dev = len(devs)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dcsexplorer_tpu.parallel import sweep as psweep
        mesh = psweep.make_flat_mesh(devs)
        args = list(psweep.pad_flat(tuple(args), n_dev))
        fn = jax.jit(sweep, static_argnums=(10,),
                     in_shardings=psweep.flat_shardings(mesh),
                     out_shardings=NamedSharding(mesh, P()))
    else:
        fn = jax.jit(sweep, static_argnums=(10,))
    int(fn(*args))   # compile + warm-up (fetch forces execution)

    iters = int(os.environ.get("DCS_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum = int(fn(*args))
    dt = (time.perf_counter() - t0) / iters

    audio_samples = sweep_in.audio_samples
    xrt = audio_samples / 31250.0 / dt / n_dev
    print(json.dumps({
        "metric": "batched_decode_throughput",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 20.0, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: batched DCS decode throughput (×realtime per chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The DCS real-time rate is 31,250 samples/s (240-sample frames at ~130.2/s).
``vs_baseline`` is ×realtime relative to the reference's native-decoder floor of
~20× realtime on one CPU core (BASELINE.md).

This stub will be replaced by the real batched catalog-sweep benchmark as the
decoder pipeline lands.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    # Placeholder workload until the decode pipeline exists: a batched integer
    # butterfly pass shaped like the decoder's IFFT stage, to validate the
    # bench harness end to end.
    B, N = 1024, 256
    x = jnp.zeros((B, N), jnp.int32)

    @jax.jit
    def step(x):
        a, b = x[:, ::2], x[:, 1::2]
        return jnp.concatenate([a + b, a - b], axis=1)

    step(x).block_until_ready()
    t0 = time.perf_counter()
    iters = 50
    y = x
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    dt = time.perf_counter() - t0

    frames = B * iters
    samples = frames * 240
    xrt = samples / 31250.0 / dt
    print(json.dumps({
        "metric": "decode_throughput_stub",
        "value": round(xrt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(xrt / 20.0, 2),
    }))


if __name__ == "__main__":
    main()

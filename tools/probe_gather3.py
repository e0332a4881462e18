#!/usr/bin/env python
"""Definitive gather-throughput probe: timed with per-call block_until_ready,
verifying width scaling, on the real raycast tables."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(f, *args, n=10):
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


rng = np.random.default_rng(0)
EXT3 = 17 ** 3
N_BUCKET = 8192
tab = jnp.asarray(rng.random(N_BUCKET * EXT3 + 1, dtype=np.float32))
G3 = 160 ** 3
slot = jnp.asarray(rng.integers(-8, N_BUCKET, G3).astype(np.int32))

for width in (19200, 76800, 307200, 1228800):
    keys = jnp.asarray(rng.integers(0, G3, width).astype(np.int32))
    idx = jnp.asarray(
        rng.integers(0, N_BUCKET * EXT3, width).astype(np.int32))

    @jax.jit
    def nine_gather(slot, tab, keys, idx):
        s = slot[keys]  # 1 slot gather
        acc = jnp.zeros(idx.shape, jnp.float32)
        for c in range(8):
            acc = acc + tab[idx + c]
        return acc + s.astype(jnp.float32)

    dt = timeit(nine_gather, slot, tab, keys, idx)
    print(f"9-gather width={width:8d}: {dt * 1e3:7.2f} ms "
          f"-> {width * 9 / dt / 1e6:8.1f} M gathers/s")

# march-like while_loop: 2 gathers + arithmetic per iter, fixed 24 iters
for width in (19200, 76800, 307200):
    keys0 = jnp.asarray(rng.integers(0, G3 - 200, width).astype(np.int32))

    @jax.jit
    def march_like(slot, tab, keys0):
        def body(c):
            k, acc, it = c
            s = slot[k]
            v = tab[jnp.where(s >= 0, s, 0) * EXT3 + (k % EXT3)]
            return (k + 7, acc + v, it + 1)

        def cond(c):
            return c[2] < 24

        out = jax.lax.while_loop(
            cond, body, (keys0, jnp.zeros(keys0.shape, jnp.float32),
                         jnp.int32(0)))
        return out[1]

    dt = timeit(march_like, slot, tab, keys0)
    print(f"march 24x2 width={width:8d}: {dt * 1e3:7.2f} ms "
          f"-> {width * 48 / dt / 1e6:8.1f} M gathers/s  "
          f"({dt / 24 * 1e6:6.0f} us/iter)")

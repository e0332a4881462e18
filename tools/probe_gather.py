#!/usr/bin/env python
"""Microbenchmark: per-element gather throughput on this TPU.

The raycaster is a gather workload; this probe establishes the roofline
for design decisions (table size effects, gather count per ray-step).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(f, *args, n=10):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    n_idx = 1 << 20  # 1M gathers

    for table_mb in [4, 64, 819]:
        n_tab = table_mb * (1 << 20) // 4
        tab = jnp.asarray(rng.random(n_tab, dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, n_tab, n_idx).astype(np.int32))

        @jax.jit
        def g1(tab, idx):
            return tab[idx]

        dt = timeit(g1, tab, idx)
        print(f"table {table_mb:4d} MB: 1M random gathers: {dt * 1e3:7.2f} ms "
              f"-> {n_idx / dt / 1e6:8.1f} M gathers/s")

    # chained gathers (8 sequential dependent) — models a march step seq
    n_tab = 16 * (1 << 20) // 4
    tab = jnp.asarray(rng.integers(0, n_tab, n_tab).astype(np.int32))

    @jax.jit
    def chase(tab, idx):
        def body(i, ix):
            return tab[ix]
        return jax.lax.fori_loop(0, 8, body, idx)

    idx = jnp.asarray(rng.integers(0, n_tab, n_idx).astype(np.int32))
    dt = timeit(chase, tab, idx)
    print(f"8-chained 1M gathers (16MB table): {dt * 1e3:7.2f} ms "
          f"-> {8 * n_idx / dt / 1e6:8.1f} M gathers/s")

    # row gathers: (N, 128) rows by index
    n_rows = 1 << 17
    tab2 = jnp.asarray(rng.random((n_rows, 128), dtype=np.float32))
    ridx = jnp.asarray(rng.integers(0, n_rows, 1 << 17).astype(np.int32))

    @jax.jit
    def growsum(tab2, ridx):
        return tab2[ridx].sum(-1)

    dt = timeit(growsum, tab2, ridx)
    print(f"128-wide row gathers, 131k rows: {dt * 1e3:7.2f} ms "
          f"-> {(1 << 17) * 128 / dt / 1e6:8.1f} M elems/s")

    # int8 gather
    tab3 = jnp.asarray(rng.integers(0, 127, 64 * (1 << 20)).astype(np.int8))
    idx3 = jnp.asarray(rng.integers(0, 64 * (1 << 20), n_idx).astype(np.int32))

    @jax.jit
    def g8(tab, idx):
        return tab[idx]

    dt = timeit(g8, tab3, idx3)
    print(f"int8 gathers (64MB table):  {dt * 1e3:7.2f} ms "
          f"-> {n_idx / dt / 1e6:8.1f} M gathers/s")


if __name__ == "__main__":
    main()

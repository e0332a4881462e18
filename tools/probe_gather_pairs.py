#!/usr/bin/env python
"""Microbenchmark: scalar gather vs row-pair gather on this TPU.

Decides the raycaster's "z-pair packing" lever: if gathering (N, 2) rows
costs about the same as (N,) scalars, the trilinear sampler can fetch its
8 cell corners in 4 gathers instead of 8 (the pair axis is z-adjacent
voxels).  Also probes (N, 8) full-cell rows for reference.
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
    n_tab = 40_000_000  # ~ext table size for an 8k-block volume
    n_idx = 1 << 20

    tab1 = jnp.asarray(rng.standard_normal(n_tab), jnp.float32)
    tab2 = jnp.asarray(
        rng.standard_normal((n_tab // 2, 2)), jnp.float32)
    tab8 = jnp.asarray(
        rng.standard_normal((n_tab // 8, 8)), jnp.float32)
    idx1 = jnp.asarray(rng.integers(0, n_tab, n_idx), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, n_tab // 2, n_idx), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, n_tab // 8, n_idx), jnp.int32)

    @jax.jit
    def g1(t, i):
        return t[i].sum()

    @jax.jit
    def g1x2(t, i):
        return (t[i] + t[i + 1]).sum()

    @jax.jit
    def g2(t, i):
        return t[i].sum()

    @jax.jit
    def g8(t, i):
        return t[i].sum()

    d1 = timeit(g1, tab1, idx1)
    d1x2 = timeit(g1x2, tab1, idx1)
    d2 = timeit(g2, tab2, idx2)
    d8 = timeit(g8, tab8, idx8)
    print(f"scalar gather  (1M): {d1 * 1e3:7.2f} ms  -> {n_idx / d1 / 1e6:6.1f} M/s")
    print(f"2 scalar gathers   : {d1x2 * 1e3:7.2f} ms")
    print(f"(N,2) row gather   : {d2 * 1e3:7.2f} ms  ({n_idx / d2 / 1e6:6.1f} M rows/s)")
    print(f"(N,8) row gather   : {d8 * 1e3:7.2f} ms  ({n_idx / d8 / 1e6:6.1f} M rows/s)")


if __name__ == "__main__":
    main()

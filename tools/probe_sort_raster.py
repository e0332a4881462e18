#!/usr/bin/env python
"""Probe the primitives a tiled mesh rasterizer would lean on:

  - jnp.sort / argsort of N int32 keys
  - lax.sort_key_val with an int32 payload
  - payload row-gather after argsort ((N,8)/(N,16) f32 rows)
  - scalar and (N,2)/(N,8) row gathers (same as probe_gather_pairs)
  - scatter-min of scalar z into a dense buffer
  - segment_min over sorted segment ids

These decide raycast-vs-rasterize for color-aligned depth rendering.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(f, *args, n=5):
    r = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)

    for N in (1 << 21, 1 << 22):
        keys = jnp.asarray(rng.integers(0, 20000, N), jnp.int32)
        payload = jnp.asarray(rng.integers(0, N, N), jnp.int32)
        rows8 = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
        rows16 = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)

        d = timeit(jax.jit(jnp.sort), keys)
        print(f"N={N}: sort int32             {d*1e3:8.2f} ms "
              f"({N/d/1e6:7.1f} M/s)")
        d = timeit(jax.jit(jnp.argsort), keys)
        print(f"N={N}: argsort int32          {d*1e3:8.2f} ms")

        f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        d = timeit(f, keys, payload)
        print(f"N={N}: sort_key_val int32     {d*1e3:8.2f} ms")

        f = jax.jit(lambda k, r: r[jnp.argsort(k)])
        d = timeit(f, keys, rows8)
        print(f"N={N}: argsort+take (N,8)     {d*1e3:8.2f} ms")
        d = timeit(f, keys, rows16)
        print(f"N={N}: argsort+take (N,16)    {d*1e3:8.2f} ms")

        # multi-payload lax.sort: key + 4 f32 payload columns
        f = jax.jit(lambda k, a, b, c, e: jax.lax.sort(
            (k, a, b, c, e), num_keys=1))
        cols = [jnp.asarray(rng.standard_normal(N), jnp.float32)
                for _ in range(4)]
        d = timeit(f, keys, *cols)
        print(f"N={N}: lax.sort key+4xf32     {d*1e3:8.2f} ms")

    # gather rates
    n_tab = 40_000_000
    n_idx = 1 << 21
    tab1 = jnp.asarray(rng.standard_normal(n_tab), jnp.float32)
    tab8 = jnp.asarray(rng.standard_normal((n_tab // 8, 8)), jnp.float32)
    idx1 = jnp.asarray(rng.integers(0, n_tab, n_idx), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, n_tab // 8, n_idx), jnp.int32)
    d = timeit(jax.jit(lambda t, i: t[i]), tab1, idx1)
    print(f"scalar gather 2M from 160MB      {d*1e3:8.2f} ms "
          f"({n_idx/d/1e6:7.1f} M/s)")
    d = timeit(jax.jit(lambda t, i: t[i]), tab8, idx8)
    print(f"(N,8) row gather 2M              {d*1e3:8.2f} ms "
          f"({n_idx/d/1e6:7.1f} M rows/s)")
    # small table (VMEM-sized)
    tab_s = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)
    idx_s = jnp.asarray(rng.integers(0, 1 << 20, n_idx), jnp.int32)
    d = timeit(jax.jit(lambda t, i: t[i]), tab_s, idx_s)
    print(f"scalar gather 2M from 4MB        {d*1e3:8.2f} ms "
          f"({n_idx/d/1e6:7.1f} M/s)")

    # scatter-min: 2M scalar z into 1.2M pixel buffer
    zbuf = jnp.full((1 << 21,), jnp.inf, jnp.float32)
    pix = jnp.asarray(rng.integers(0, 1 << 21, n_idx), jnp.int32)
    zval = jnp.asarray(rng.standard_normal(n_idx) + 5, jnp.float32)
    f = jax.jit(lambda b, i, v: b.at[i].min(v))
    d = timeit(f, zbuf, pix, zval)
    print(f"scatter-min 2M scalars           {d*1e3:8.2f} ms "
          f"({n_idx/d/1e6:7.1f} M/s)")

    # segment_min over sorted ids: 2M rows of 64 -> 19200 segments
    Np = 1 << 21
    seg = jnp.sort(jnp.asarray(rng.integers(0, 19200, Np), jnp.int32))
    vals = jnp.asarray(rng.standard_normal((Np, 64)), jnp.float32)
    f = jax.jit(lambda v, s: jax.ops.segment_min(
        v, s, num_segments=19200, indices_are_sorted=True))
    d = timeit(f, vals, seg)
    print(f"segment_min (2M,64)->19200       {d*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

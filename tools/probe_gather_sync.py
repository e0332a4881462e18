#!/usr/bin/env python
"""Gather-throughput probe with TRUE synchronization.

The tunneled runtime's block_until_ready does not block (2026-08-19), so
earlier probes measured dispatch, not execution.  Every timing here chains
the gathered values into a scalar that is device_get-fetched.

Decides: (a) the real scalar-gather rate on the raycast tables, (b) whether
a contiguous 4-element slice-gather (refine cell fetch) costs ~1 index or
~4, (c) whether halving table bytes (f16 vs u32) changes the rate.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import mq3d_tpu  # noqa: F401  (compile cache + x64 config)
import jax
import jax.numpy as jnp


def timeit(f, *args, n=3):
    r = f(*args)
    float(jax.device_get(r))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(f(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    rng = np.random.default_rng(0)
    EXT3 = 17 ** 3
    N_BUCKET = 8192
    N = N_BUCKET * EXT3  # ~40M entries, 161 MB as u32
    ROUNDS = 16  # serial dependent rounds per program

    tab_u32 = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int64)
                          .astype(np.uint32))
    tab_f16 = jnp.asarray(rng.standard_normal(N).astype(np.float16))
    tab4 = jnp.asarray(rng.integers(0, 1 << 30, 4 * N, dtype=np.int64)
                       .astype(np.uint32))

    for width in (307_200, 1_228_800):
        idx0 = jnp.asarray(rng.integers(0, N - 8, width).astype(np.int32))

        @jax.jit
        def scalar_u32(tab, idx):
            def body(i, c):
                ix, acc = c
                v = tab[ix]
                acc = acc + v.astype(jnp.float32).sum()
                ix = (ix + v.astype(jnp.int32)) % (N - 8)
                return ix, acc
            _, acc = jax.lax.fori_loop(0, ROUNDS, body, (idx, jnp.float32(0)))
            return acc

        @jax.jit
        def quad_scalar_u32(tab, idx):
            """4 independent scalar gathers per round (refine corner fetch
            as currently shipped)."""
            def body(i, c):
                ix, acc = c
                v = tab[ix]
                for o in (1, 17, 17 * 17, 17 * 17 + 17):
                    acc = acc + tab[ix + o].astype(jnp.float32).sum()
                acc = acc + v.astype(jnp.float32).sum()
                ix = (ix + v.astype(jnp.int32)) % (N - 8)
                return ix, acc
            _, acc = jax.lax.fori_loop(0, ROUNDS, body, (idx, jnp.float32(0)))
            return acc

        @jax.jit
        def slice4_u32(tab4, idx):
            """One contiguous 4-element slice gather per round."""
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,))
            def body(i, c):
                ix, acc = c
                rows = jax.lax.gather(
                    tab4, (ix * 4)[:, None], dn, slice_sizes=(4,))
                acc = acc + rows.astype(jnp.float32).sum()
                ix = (ix + rows[:, 0].astype(jnp.int32)) % (N - 8)
                return ix, acc
            _, acc = jax.lax.fori_loop(0, ROUNDS, body, (idx, jnp.float32(0)))
            return acc

        @jax.jit
        def scalar_f16(tab, idx):
            def body(i, c):
                ix, acc = c
                v = tab[ix].astype(jnp.float32)
                acc = acc + v.sum()
                ix = (ix + v.astype(jnp.int32) + 3) % (N - 8)
                return ix, acc
            _, acc = jax.lax.fori_loop(0, ROUNDS, body, (idx, jnp.float32(0)))
            return acc

        base = width * ROUNDS
        for name, fn, args, n_g in (
            ("scalar u32 ", scalar_u32, (tab_u32, idx0), base),
            ("4x scalar   ", quad_scalar_u32, (tab_u32, idx0), base * 5),
            ("slice4 u32 ", slice4_u32, (tab4, idx0), base),
            ("scalar f16 ", scalar_f16, (tab_f16, idx0), base),
        ):
            dt = timeit(fn, *args)
            print(f"{name} width={width:8d}: {dt * 1e3:8.2f} ms -> "
                  f"{n_g / dt / 1e6:7.1f} M gathers/s "
                  f"({base / dt / 1e6:6.1f} M indices/s)", flush=True)


if __name__ == "__main__":
    main()

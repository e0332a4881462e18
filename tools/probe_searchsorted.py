#!/usr/bin/env python
"""Probe searchsorted methods + transpose + the new phase-A pieces at
bench shapes."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mq3d_tpu.utils.host import fetch_float

C, G = 20, 160
G3 = G ** 3


def timeit(f, *args, tag="", n=8):
    out = f(*args)
    jax.tree.map(
        lambda x: fetch_float(jnp.asarray(x, jnp.float32).ravel()[-1]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.tree.map(
        lambda x: fetch_float(jnp.asarray(x, jnp.float32).ravel()[-1]), out)
    print(f"{tag}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(G3) < 0.001)

    for method in ("scan", "scan_unrolled", "sort", "compare_all"):
        for nq in (12_288, 50_000):
            @jax.jit
            def ss(mask, method=method, nq=nq):
                ranks = jnp.cumsum(mask.astype(jnp.int32))
                q = jnp.arange(1, nq + 1, dtype=jnp.int32)
                return jnp.searchsorted(ranks, q, method=method).sum()

            try:
                timeit(ss, mask, tag=f"searchsorted {method} {nq}q")
            except Exception as e:
                print(f"searchsorted {method} {nq}q: FAILED {type(e).__name__}",
                      flush=True)

    # transpose (C,hs,ws,27) -> (C,27,hs,ws)
    k4 = jnp.asarray(
        rng.integers(0, G3, size=(C, 144, 160, 27), dtype=np.int32))
    timeit(jax.jit(lambda a: jnp.moveaxis(a, 3, 1).reshape(C, -1).sum()),
           k4, tag="moveaxis (C,hs,ws,27)->(C,27,hs,ws)")

    # dedup min/mask 16 passes at (C, 4860, 128)
    g = jnp.asarray(
        rng.integers(0, G3, size=(C, 4860, 128), dtype=np.int32))

    @jax.jit
    def top16(cur):
        outs = []
        for _ in range(16):
            m = jnp.min(cur, axis=-1, keepdims=True)
            outs.append(m[..., 0])
            cur = jnp.where(cur == m, G3, cur)
        return jnp.stack(outs, -1).sum() + jnp.sum(jnp.min(cur, -1) < G3)

    timeit(top16, g, tag="top-16-of-128 min/mask (12.4M)")

    # scatter 1.55M
    idx = jnp.asarray(
        rng.integers(0, C * (G3 + 1), size=1_555_200, dtype=np.int32))

    @jax.jit
    def sc(idx):
        return jnp.zeros((C * (G3 + 1),), jnp.uint8).at[idx].max(
            jnp.uint8(1)).astype(jnp.uint32).sum()

    timeit(sc, idx, tag="scatter 1.55M")


if __name__ == "__main__":
    main()

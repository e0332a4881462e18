#!/usr/bin/env python
"""Second-round micro-probes for the phase-A rewrite (see probe_alloc_opt).

All shapes at bench scale: C=20, G=160 (G3=4.096M), M=12288.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mq3d_tpu.utils.host import fetch_float

C = 20
G = 160
G3 = G ** 3
M = 12_288


def timeit(f, *args, tag="", n=8):
    out = f(*args)
    jax.tree.map(
        lambda x: fetch_float(jnp.asarray(x, jnp.float32).ravel()[-1]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.tree.map(
        lambda x: fetch_float(jnp.asarray(x, jnp.float32).ravel()[-1]), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt * 1e3:.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)

    # --- scatter rate vs index count (into (C,G3) uint8 grid) ---
    for n_idx in (786_432, 1_572_864, 3_145_728, 6_291_456):
        idx = jnp.asarray(
            rng.integers(0, C * (G3 + 1), size=n_idx, dtype=np.int32))

        @jax.jit
        def sc(idx):
            ft = jnp.zeros((C * (G3 + 1),), jnp.uint8)
            return ft.at[idx].max(jnp.uint8(1)).astype(jnp.uint32).sum()

        timeit(sc, idx, tag=f"scatter-max {n_idx/1e6:.1f}M idx")

    # --- union-reduce forms over (C, G3) ---
    ft8 = jnp.zeros((C, G3), jnp.uint8)
    ftb = jnp.zeros((C, G3), jnp.bool_)
    ft32w = jnp.zeros((C, G3 // 4), jnp.int32)  # packed words

    timeit(jax.jit(lambda a: jnp.max(a, 0).astype(jnp.uint32).sum()), ft8,
           tag="union: max uint8")
    timeit(jax.jit(lambda a: jnp.any(a, 0).sum()), ftb,
           tag="union: any bool")

    @jax.jit
    def or_words(a):
        from functools import reduce
        u = reduce(jnp.bitwise_or, [a[i] for i in range(C)])
        return u.sum()

    timeit(or_words, ft32w, tag="union: OR int32 words (unrolled 20)")

    # --- combined searchsorted: 2 cumsums + 24576 queries ---
    p1 = jnp.asarray(rng.random(G3) < 0.001)
    p2 = jnp.asarray(rng.random(G3) < 0.001)

    @jax.jit
    def invert2(p1, p2):
        r1 = jnp.cumsum(p1.astype(jnp.int32))
        r2 = jnp.cumsum(p2.astype(jnp.int32))
        q = jnp.arange(1, M + 1, dtype=jnp.int32)
        a = jnp.searchsorted(r1, q)
        b = jnp.searchsorted(r2, q)
        return a.sum() + b.sum()

    timeit(invert2, p1, p2, tag="2x (cumsum G3 + searchsorted 12288)")

    @jax.jit
    def cumsum_only(p1):
        return jnp.cumsum(p1.astype(jnp.int32))[-1]

    timeit(cumsum_only, p1, tag="cumsum G3 alone")

    # --- M x C touch-bit gather from (C*(G3+1),) uint8 ---
    ft_flat = jnp.zeros((C * (G3 + 1),), jnp.uint8)
    keysM = jnp.asarray(rng.integers(0, G3, size=M, dtype=np.int32))

    @jax.jit
    def touch_gather(ft, keys):
        idx = keys[:, None] + (jnp.arange(C, dtype=jnp.int32)
                               * (G3 + 1))[None, :]
        return ft[idx].astype(jnp.uint32).sum()

    timeit(touch_gather, ft_flat, keysM, tag="gather MxC=245k touch bits")

    # --- pair compaction: cumsum 245k + scatter 245k ---
    bits = jnp.asarray(rng.random((M, C)) < 0.12)

    @jax.jit
    def build_pairs(bits):
        flat = bits.reshape(-1)
        rank = jnp.cumsum(flat.astype(jnp.int32))
        idx = jnp.where(flat, rank - 1, M * C)
        pair_block = jnp.zeros((M * C + 1,), jnp.int32).at[idx].set(
            jnp.arange(M * C, dtype=jnp.int32) // C, mode="drop")
        pair_frame = jnp.zeros((M * C + 1,), jnp.int32).at[idx].set(
            jnp.arange(M * C, dtype=jnp.int32) % C, mode="drop")
        return pair_block.sum() + pair_frame.sum()

    timeit(build_pairs, bits, tag="pair compaction (cumsum+2 scatters 245k)")

    # --- top-4-of-16 extraction via 4 min/mask passes over 12.4M ---
    cand = jnp.asarray(
        rng.integers(0, G3, size=(12_441_600 // 16, 16), dtype=np.int32))

    @jax.jit
    def top4(c):
        outs = []
        cur = c
        for _ in range(4):
            m = jnp.min(cur, axis=-1, keepdims=True)
            outs.append(m[..., 0])
            cur = jnp.where(cur == m, G3, cur)
        ovf = jnp.sum(jnp.min(cur, -1) < G3)
        return outs[0].sum() + ovf

    timeit(top4, cand, tag="top-4-of-16 min/mask over 12.4M")

    # --- empty-launch floor: trivial jit on big donated state ---
    big = jnp.zeros((50_001, 4096), jnp.float32)

    @jax.jit
    def touch1(x):
        return x.ravel()[0] + 1.0

    timeit(touch1, big, tag="launch floor (index big array)")


if __name__ == "__main__":
    main()

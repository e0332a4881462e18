#!/usr/bin/env python
"""Validate the planned phase-A/B optimizations at bench shapes.

 1. group-dedup scatter: left-neighbor dedup + per-group-of-G static sort
    keeping K survivors, then scatter only (12.4M / G * K) indices.
    Exactness guard: count dropped non-sentinel survivors.
 2. searchsorted inversion: ranks cumsum (G^3) -> keys of new blocks via
    vectorized bisection (replaces two G^3-index scatters).
 3. one-hot einsum precision: HIGHEST vs explicit 3-term bf16 split vs
    DEFAULT, at the (512, 1024, 64, 64) bench shape.
 4. reduce-max layout: (C, G3) uint8 vs int32 words.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mq3d_tpu.utils.host import fetch_float

C, HS, WS, K27 = 20, 144, 160, 27
G = 160
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
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt * 1e3:.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # Realistic keys: spatially coherent like a projected depth map —
    # consecutive pixels mostly share blocks. Model: smooth ramp + noise.
    base = np.cumsum(rng.integers(0, 2, size=(C, HS, WS)), axis=2) // 24
    keys_np = (base[..., None] * 7 + np.arange(K27)[None, None, None] % 3
               ).astype(np.int32) % G3
    keys = jnp.asarray(keys_np)

    GRP = 16   # group size along flattened (pixel, offset) axis
    KEEP = 4   # survivors per group

    @jax.jit
    def scatter_full(keys):
        frame_offsets = (jnp.arange(C, dtype=jnp.int32) * (G3 + 1))[
            :, None, None, None]
        flat = (keys + frame_offsets).reshape(-1)
        ft = jnp.zeros((C * (G3 + 1),), jnp.uint8).at[flat].max(jnp.uint8(1))
        return ft.astype(jnp.uint32).reshape(C, G3 + 1).sum()

    @jax.jit
    def scatter_dedup(keys):
        SENT = jnp.int32(G3)
        # left-neighbor dedup along x (same offset slot)
        left = jnp.concatenate(
            [jnp.full_like(keys[:, :, :1], -1), keys[:, :, :-1]], axis=2)
        k1 = jnp.where(keys == left, SENT, keys)
        # group-sort: (C, HS*WS*K27/GRP, GRP) — also dedup within group
        kf = k1.reshape(C, -1, GRP)
        ks = jnp.sort(kf, axis=-1)
        dup = jnp.concatenate(
            [jnp.zeros_like(ks[..., :1], bool),
             ks[..., 1:] == ks[..., :-1]], axis=-1)
        ks = jnp.where(dup, SENT, ks)
        ks = jnp.sort(ks, axis=-1)
        kept = ks[..., :KEEP]
        overflow = jnp.sum(ks[..., KEEP:] < SENT)  # exactness guard
        frame_offsets = (jnp.arange(C, dtype=jnp.int32) * (G3 + 1))[
            :, None, None]
        flat = (jnp.minimum(kept, SENT) + frame_offsets).reshape(-1)
        ft = jnp.zeros((C * (G3 + 1),), jnp.uint8).at[flat].max(jnp.uint8(1))
        return ft.astype(jnp.uint32).reshape(C, G3 + 1).sum(), overflow

    s_full = timeit(scatter_full, keys, tag="scatter full 12.4M")
    (s_dedup, ovf) = timeit(scatter_dedup, keys,
                            tag=f"dedup({GRP}->{KEEP}) + scatter "
                                f"{12.4 / GRP * KEEP:.1f}M")
    print(f"   parity: full={int(jax.device_get(s_full))} "
          f"dedup={int(jax.device_get(s_dedup))} "
          f"overflow={int(jax.device_get(ovf))}", flush=True)

    # 2. searchsorted inversion
    new_mask = jnp.asarray(rng.random(G3) < 0.001)  # ~4k new blocks

    @jax.jit
    def invert_scan(new_mask):
        ranks = jnp.cumsum(new_mask.astype(jnp.int32))
        total = ranks[-1]
        q = jnp.arange(1, 12_289, dtype=jnp.int32)
        pos = jnp.searchsorted(ranks, q)  # first idx with rank >= k
        ok = q <= total
        return jnp.where(ok, pos, G3).sum()

    timeit(invert_scan, new_mask, tag="cumsum G3 + searchsorted 12288")

    # 3. einsum precision at bench shape
    patch = jnp.asarray(rng.random((512, 64, 64), np.float32))
    ohx = jnp.asarray((rng.random((512, 1024, 64)) < 0.02), jnp.float32)

    @jax.jit
    def ein_highest(p, o):
        return jnp.einsum("bpq,bvq->bvp", p, o,
                          precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def ein_default(p, o):
        return jnp.einsum("bpq,bvq->bvp", p, o)

    @jax.jit
    def ein_split3(p, o):
        ob = o.astype(jnp.bfloat16)
        h1 = p.astype(jnp.bfloat16)
        r1 = p - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        r2 = r1 - h2.astype(jnp.float32)
        h3 = r2.astype(jnp.bfloat16)
        acc = None
        for h in (h1, h2, h3):
            t = jnp.einsum("bpq,bvq->bvp", h, ob,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return acc

    a = timeit(ein_highest, patch, ohx, tag="einsum HIGHEST", n=16)
    b = timeit(ein_split3, patch, ohx, tag="einsum 3x bf16 split", n=16)
    timeit(ein_default, patch, ohx, tag="einsum DEFAULT (ref only)", n=16)
    diff = jnp.max(jnp.abs(a - b))
    print(f"   HIGHEST vs split3 max|diff| = {float(jax.device_get(diff))}",
          flush=True)

    # 4. reduce-max layouts
    ft8 = jnp.zeros((C, G3), jnp.uint8)
    ft32 = jnp.zeros((C, G3), jnp.int32)

    timeit(jax.jit(lambda a: jnp.max(a, 0).astype(jnp.int32).sum()), ft8,
           tag="reduce-max (C,G3) uint8")
    timeit(jax.jit(lambda a: jnp.max(a, 0).sum()), ft32,
           tag="reduce-max (C,G3) int32")


if __name__ == "__main__":
    main()

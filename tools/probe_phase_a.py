#!/usr/bin/env python
"""Time each phase-A (allocation) op of integrate_chunk at bench shapes.

Shapes: C=20 frames, 320x288 depth, alloc stride 2 -> 12.44M candidate keys;
G=160 -> G^3 = 4.096M dense grid.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mq3d_tpu.utils.host import fetch_float, fetch_int

C, HS, WS, K27 = 20, 144, 160, 27
G = 160
G3 = G ** 3
CAP = 50_000
M = 12_288


def timeit(f, *args, tag="", n=8):
    out = f(*args)
    fetch_float(jnp.asarray(out, jnp.float32).ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch_float(jnp.asarray(out, jnp.float32).ravel()[-1])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, G3, size=(C, HS, WS, K27), dtype=np.int32))
    keys1f = keys[:1]

    @jax.jit
    def scatter_touch(keys):
        frame_offsets = (jnp.arange(C, dtype=jnp.int32) * (G3 + 1))[
            :, None, None, None]
        flat = (keys + frame_offsets).reshape(-1)
        ft = jnp.zeros((C * (G3 + 1),), jnp.uint8).at[flat].max(jnp.uint8(1))
        return ft.astype(jnp.int32).sum()

    @jax.jit
    def scatter_touch_1grid(keys):
        # union-only variant: all frames into ONE G^3 grid
        flat = keys.reshape(-1)
        t = jnp.zeros((G3 + 1,), jnp.uint8).at[flat].max(jnp.uint8(1))
        return t.astype(jnp.int32).sum()

    @jax.jit
    def reduce_max(ft):
        return jnp.max(ft.reshape(C, G3 + 1), axis=0).sum()

    @jax.jit
    def two_cumsum(touched):
        r1 = jnp.cumsum((touched > 0).astype(jnp.int32))
        r2 = jnp.cumsum((touched > 1).astype(jnp.int32))
        return r1[-1] + r2[-1]

    @jax.jit
    def coord_scatter(idx, coords_all):
        bc = jnp.zeros((CAP + 1, 3), jnp.int32)
        return bc.at[idx].set(coords_all, mode="drop").sum()

    @jax.jit
    def slot_scatter(idx2, vals):
        a = jnp.full((M + 1,), CAP, jnp.int32)
        return a.at[idx2].set(vals, mode="drop").sum()

    @jax.jit
    def unproject(d):
        # stand-in for the einsum+stack unprojection at (C,HS,WS)
        u = jnp.arange(WS, dtype=jnp.float32)[None, None, :]
        v = jnp.arange(HS, dtype=jnp.float32)[None, :, None]
        pc = jnp.stack([u * d, v * d, d], -1)
        R = jnp.eye(3)[None].repeat(C, 0)
        pw = jnp.einsum("cij,chwj->chwi", R, pc)
        cand = pw[:, :, :, None, :] + jnp.ones((K27, 3))
        bc = jnp.floor(cand / 0.16).astype(jnp.int32)
        return bc.sum()

    ft_demo = jnp.zeros((C * (G3 + 1),), jnp.uint8)
    touched = jnp.asarray(rng.integers(0, 3, size=(G3,), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, CAP + 1, size=(G3,), dtype=np.int32))
    coords_all = jnp.asarray(
        rng.integers(-80, 80, size=(G3, 3), dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, CAP, size=(G3,), dtype=np.int32))
    d = jnp.asarray(rng.random((C, HS, WS), np.float32))

    timeit(scatter_touch, keys, tag="scatter-max 12.4M -> (C,G3) uint8")
    timeit(scatter_touch_1grid, keys,
           tag="scatter-max 12.4M -> (G3,) uint8 (union only)")
    timeit(scatter_touch, keys1f[:1],
           tag="scatter-max 0.62M (1 frame) -> (C,G3)")
    timeit(reduce_max, ft_demo, tag="reduce-max (C,G3) uint8")
    timeit(two_cumsum, touched, tag="2x cumsum over G3 int32")
    timeit(coord_scatter, idx, coords_all,
           tag="row scatter G3 -> (50k,3) int32")
    timeit(slot_scatter, idx, vals, tag="scatter G3 -> (12k,) int32")
    timeit(unproject, d, tag="unproject+floor (C,HS,WS,27)")


if __name__ == "__main__":
    main()

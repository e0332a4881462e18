#!/usr/bin/env python
"""Bisect the composed phase-A cost: time progressively longer prefixes of
the real _integrate_chunk_impl pipeline on the real bench chunk."""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# Self-deadline: NEVER kill this probe externally — a killed client wedges
# the tunnel for tens of minutes (TODO.md).  faulthandler exits the process
# cleanly, releasing the chip.
faulthandler.dump_traceback_later(int(sys.argv[1]) if len(sys.argv) > 1 else 480,
                                  exit=True)

import bench  # noqa: E402

import jax
import jax.numpy as jnp
from functools import partial

from mq3d_tpu.ops import tsdf as T
from mq3d_tpu.utils.host import fetch_float


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
    depth, K, T_wc, valid, gt, scene_cfg = bench.make_capture()
    cfg = T.TSDFConfig(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )
    C = 20
    d = jnp.asarray(depth[:C])
    Kc = jnp.asarray(K[:C])
    Twc = jnp.asarray(T_wc[:C], jnp.float32)
    fv = jnp.asarray(valid[:C])
    state = T.create_state(cfg)
    G3 = cfg.grid_dim ** 3

    @partial(jax.jit, static_argnames=())
    def p1(d, Kc, Twc, fv):
        T_cw = jnp.linalg.inv(Twc)
        keys = T._candidate_keys(cfg, d, Kc, T_cw, fv)
        return keys.sum()

    @jax.jit
    def p2(d, Kc, Twc, fv):
        T_cw = jnp.linalg.inv(Twc)
        keys = T._candidate_keys(cfg, d, Kc, T_cw, fv)
        kept, n_missed = T._dedup_candidates(keys, G3)
        return kept.sum() + n_missed

    @jax.jit
    def p3(d, Kc, Twc, fv):
        T_cw = jnp.linalg.inv(Twc)
        ft = T._frame_touch_grid(cfg, d, Kc, T_cw, fv)
        return ft.astype(jnp.uint32).sum()

    @jax.jit
    def p3b(d, Kc, Twc, fv):
        # no cond: kept-scatter only
        T_cw = jnp.linalg.inv(Twc)
        keys = T._candidate_keys(cfg, d, Kc, T_cw, fv)
        kept, n_missed = T._dedup_candidates(keys, G3)
        off = (jnp.arange(C, dtype=jnp.int32) * (G3 + 1))[:, None, None]
        flat = (kept + off).reshape(-1)
        ft = jnp.zeros((C * (G3 + 1),), jnp.uint8).at[flat].max(jnp.uint8(1))
        return ft.astype(jnp.uint32).sum() + n_missed

    @jax.jit
    def p4(state, d, Kc, Twc, fv):
        T_cw = jnp.linalg.inv(Twc)
        ft = T._frame_touch_grid(cfg, d, Kc, T_cw, fv)
        touched = jnp.max(
            ft.reshape(C, G3 + 1), axis=0)[:G3].astype(jnp.int32)
        out = T._alloc_and_window(cfg, state, touched, jnp.int32(0))
        return out[2] + out[5].sum()  # n_active + active_slots

    @jax.jit
    def p5(state, d, Kc, Twc, fv):
        T_cw = jnp.linalg.inv(Twc)
        ft = T._frame_touch_grid(cfg, d, Kc, T_cw, fv)
        touched = jnp.max(
            ft.reshape(C, G3 + 1), axis=0)[:G3].astype(jnp.int32)
        (st, bc, na, ovf, da, act, wk, nact) = T._alloc_and_window(
            cfg, state, touched, jnp.int32(0))
        codes, n_pairs = T._pairs_from_grid(
            cfg, ft, wk, act < cfg.block_count, C)
        return n_pairs + codes.sum()

    # report n_missed on the real chunk
    T_cw = jnp.linalg.inv(Twc)
    keys = T._candidate_keys(cfg, d, Kc, T_cw, fv)
    kept, n_missed = jax.jit(T._dedup_candidates, static_argnums=1)(keys, G3)
    print(f"n_missed on real chunk: {int(jax.device_get(n_missed))}",
          flush=True)

    timeit(p1, d, Kc, Twc, fv, tag="P1 candidate keys")
    timeit(p2, d, Kc, Twc, fv, tag="P2 + dedup")
    timeit(p3b, d, Kc, Twc, fv, tag="P3b + scatter (no cond)")
    timeit(p3, d, Kc, Twc, fv, tag="P3 + scatter (with cond)")
    timeit(p4, state, d, Kc, Twc, fv, tag="P4 + union + alloc + window")
    timeit(p5, state, d, Kc, Twc, fv, tag="P5 + pairs")


if __name__ == "__main__":
    main()

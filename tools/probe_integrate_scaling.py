#!/usr/bin/env python
"""Scale integrate_chunk along each axis to find where the honest-sync
2.7 s/launch goes: frames per chunk, active tiles, allocation pass,
or fixed launch cost.

Every timing fetches a data-dependent scalar.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import TSDFConfig, create_state, integrate_chunk
    from mq3d_tpu.utils.host import fetch_int

    from bench import make_capture, CHUNK

    depth, K, T_wc, valid, _gt, _cfg = make_capture()
    print("capture ready", flush=True)

    def timed(tag, cfg_t, d, k, t, v, reps=3):
        dd, kk, tt, vv = map(jnp.asarray, (d, k, t, v))
        state = create_state(cfg_t)
        state = integrate_chunk(cfg_t, state, dd, kk, tt, vv)
        fetch_int(state.n_active)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            state = integrate_chunk(cfg_t, state, dd, kk, tt, vv)
        na = fetch_int(state.n_active)
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag}: {dt*1e3:.1f} ms/launch  (n_active={na})", flush=True)
        return dt

    base = dict(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )

    cfg = TSDFConfig(**base)
    c = CHUNK
    timed("C=20 full", cfg, depth[:c], K[:c], T_wc[:c], valid[:c])
    timed("C=20 all-invalid", cfg, depth[:c], K[:c], T_wc[:c],
          np.zeros(c, bool))
    timed("C=20 zero-depth", cfg, np.zeros_like(depth[:c]), K[:c],
          T_wc[:c], valid[:c])
    timed("C=5 full", cfg, depth[:5], K[:5], T_wc[:5], valid[:5])
    timed("C=1 full", cfg, depth[:1], K[:1], T_wc[:1], valid[:1])

    cfg_small_cap = TSDFConfig(**{**base, "chunk_active_capacity": 2048})
    timed("C=20 cap=2048", cfg_small_cap, depth[:c], K[:c], T_wc[:c],
          valid[:c])

    cfg_tile = TSDFConfig(**{**base, "integrate_tile": 2048})
    timed("C=20 tile=2048", cfg_tile, depth[:c], K[:c], T_wc[:c], valid[:c])

    cfg_small_pool = TSDFConfig(**{**base, "block_count": 8192})
    timed("C=20 pool=8192", cfg_small_pool, depth[:c], K[:c], T_wc[:c],
          valid[:c])


if __name__ == "__main__":
    main()

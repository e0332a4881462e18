#!/usr/bin/env python
"""Bisect the TPU hang seen at the 16-frame verify config (2026-08-19).

Runs each suspect program at the small-capture shapes in ONE process,
printing a line before/after each step so the hang point is visible in the
log.  Never killed from outside: faulthandler dumps + exits if a step
exceeds the deadline, so the tunnel is released by process exit rather
than a signal."""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")

faulthandler.dump_traceback_later(420, exit=True)


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import (
        TSDFConfig,
        create_state,
        integrate_chunk,
        fresh_integrate_extract,
    )
    from mq3d_tpu.utils.host import fetch_int

    stamp("jax import done; devices=" + str(jax.devices()))
    x = jnp.ones((128, 128))
    stamp(f"matmul ok {float((x @ x).sum())}")

    # Verify-config shapes: synthetic 64x80 depth, block_count 4096,
    # voxel 0.05 (tsdf_config_from_integration defaults for the rest).
    H, W, C = 64, 80, 16
    rng = np.random.default_rng(0)
    depth = (1.0 + rng.random((C, H, W))).astype(np.float32)
    K = np.tile(
        np.array([[60.0, 0, 40.0], [0, 60.0, 32.0], [0, 0, 1]], np.float32),
        (C, 1, 1),
    )
    T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for i in range(C):  # spread the cameras a little
        T[i, 0, 3] = 0.02 * i
    valid = np.ones(C, bool)

    for lookup in ("flat", "onehot"):
        cfg = TSDFConfig(
            voxel_size=0.05, block_resolution=16, block_count=4096,
            grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=8.0,
            alloc_pixel_stride=2, chunk_active_capacity=12_288,
            integrate_tile=512, depth_lookup=lookup,
        )
        stamp(f"integrate_chunk[{lookup}] compile+run ...")
        t0 = time.perf_counter()
        st = create_state(cfg)
        st = integrate_chunk(cfg, st, jnp.asarray(depth), jnp.asarray(K),
                             jnp.asarray(T), jnp.asarray(valid))
        n = fetch_int(st.n_active)
        stamp(f"integrate_chunk[{lookup}] ok n_active={n} "
              f"({time.perf_counter()-t0:.1f}s)")
        del st

    for lookup in ("flat", "onehot"):
        cfg = TSDFConfig(
            voxel_size=0.05, block_resolution=16, block_count=4096,
            grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=8.0,
            alloc_pixel_stride=2, chunk_active_capacity=12_288,
            integrate_tile=512, depth_lookup=lookup,
        )
        stamp(f"fresh_integrate_extract[{lookup}] compile+run ...")
        t0 = time.perf_counter()
        out = fresh_integrate_extract(cfg, depth, K, T, valid, 3.0)
        vol, pcd, overflow = out
        stamp(f"fresh_integrate_extract[{lookup}] ok overflow={overflow} "
              f"({time.perf_counter()-t0:.1f}s)")
        del vol, pcd

    stamp("ALL OK")


if __name__ == "__main__":
    main()

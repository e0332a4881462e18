#!/usr/bin/env python
"""Where does raycast time go?  Time _march/_refine at several widths and
iteration caps on the real volume, plus the non-march parts."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def timeit(f, n=3):
    import jax
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    vol, gt, cfg_s = build_volume()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mq3d_tpu.ops.raycast import (
        _prep_cache, _march, _refine, _ray_dirs, _F32,
    )
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = fx, fy
    K[0, 2], K[1, 2] = W_C - cx, cy
    T_cw = np.linalg.inv(np.linalg.inv(gt.extrinsics_cw[0])).astype(np.float32)
    T_cw = gt.extrinsics_cw[0].astype(np.float32)

    slot_dist, ext, aabb, n_bucket = _prep_cache.get(vol)
    cfg = vol.cfg

    dirs_full = _ray_dirs(
        jnp.asarray(K)[None], jnp.asarray(T_cw[:3, :3])[None], 1, H_C, W_C
    ).reshape(-1, 3)
    origin = jnp.broadcast_to(jnp.asarray(T_cw[:3, 3]), (H_C * W_C, 3))

    for width in (19200, 76800, 307200):
        for iters in (16, 24, 96):
            d = dirs_full[:width]
            o = origin[:width]
            t0 = jnp.full((width,), 0.05, _F32)

            march = jax.jit(partial(
                _march, cfg, slot_dist, ext, n_bucket), static_argnums=(5,))

            def run():
                return _march(cfg, slot_dist, ext, n_bucket, o, d, t0,
                              0.05, 6.0, iters)[1]

            runj = jax.jit(run)
            dt = timeit(runj)
            print(f"march width={width:7d} iters={iters:3d}: {dt*1e3:8.1f} ms"
                  f"  ({dt/iters*1e6:6.1f} us/iter)")

    # refine cost at widths
    for width in (19200, 76800, 307200):
        d = dirs_full[:width]
        o = origin[:width]
        t0 = jnp.full((width,), 0.05, _F32)
        out = _march(cfg, slot_dist, ext, n_bucket, o, d, t0, 0.05, 6.0, 96)
        found, ta, tb, va, vb = out

        def runr():
            return _refine(cfg, slot_dist, ext, n_bucket, o, d, found,
                           ta, tb, va, vb)

        runrj = jax.jit(runr)
        dt = timeit(runrj)
        print(f"refine width={width:7d}: {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

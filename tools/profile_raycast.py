#!/usr/bin/env python
"""Split the raycast render into separately-jitted stages and time each on
the real volume: base march+refine, per-level upsample/edge-detect
(elementwise), per-level edge march+refine.  Identifies whether the
remaining frame time is gather work or wide elementwise overhead."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def timeit(f, *args, n=5):
    import jax

    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    vol, gt, cfg_s = build_volume()
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mq3d_tpu.ops import raycast as rc
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = fx, fy
    K[0, 2], K[1, 2] = W_C - cx, cy
    T_cw = np.linalg.inv(np.linalg.inv(gt.extrinsics_cw[0]))
    T_cw = gt.extrinsics_cw[0].astype(np.float32)

    slot_dist, ext, aabb, n_bucket = rc._prep_cache.get(vol)
    cfg = vol.cfg
    Kj = jnp.asarray(K)[None]
    Rj = jnp.asarray(T_cw[:3, :3])[None]
    oj = jnp.asarray(T_cw[:3, 3])[None]
    t_min, t_max = 0.05, 6.0

    # --- base level (1/8): full march + refine -----------------------------
    h0, w0 = H_C // 8, W_C // 8

    @jax.jit
    def base():
        dirs = rc._ray_dirs(Kj, Rj, 8, h0, w0).reshape(-1, 3)
        origins = jnp.broadcast_to(oj[:, None, None, :],
                                   (1, h0, w0, 3)).reshape(-1, 3)
        t0 = jnp.full((h0 * w0,), t_min, rc._F32)
        found, ta, tb, va, vb = rc._march(
            cfg, slot_dist, ext, n_bucket, origins, dirs, t0, t_min, t_max,
            96)
        return rc._refine(cfg, slot_dist, ext, n_bucket, origins, dirs,
                          found, ta, tb, va, vb).reshape(1, h0, w0)

    dt = timeit(base)
    print(f"base 1/8 march+refine      : {dt * 1e3:7.1f} ms")
    z8 = base()

    # --- march-only and refine-only at a given width -----------------------
    for cap, iters, label in ((9600, 14, "s4-edge"), (38400, 14, "s2-edge"),
                              (61440, 14, "s1-edge")):
        dirs = rc._ray_dirs(Kj, Rj, 1, H_C, W_C).reshape(-1, 3)[:cap]
        origins = jnp.broadcast_to(oj[:, None, :], (1, cap, 3)).reshape(-1, 3)
        t0 = jnp.full((cap,), t_min, rc._F32)

        @jax.jit
        def march_only(dirs=dirs, origins=origins, t0=t0, iters=iters):
            return rc._march(cfg, slot_dist, ext, n_bucket, origins, dirs,
                             t0, t_min, t_max, iters)[1]

        @jax.jit
        def march_refine(dirs=dirs, origins=origins, t0=t0, iters=iters):
            found, ta, tb, va, vb = rc._march(
                cfg, slot_dist, ext, n_bucket, origins, dirs, t0, t_min,
                t_max, iters)
            return rc._refine(cfg, slot_dist, ext, n_bucket, origins, dirs,
                              found, ta, tb, va, vb)

        dm = timeit(march_only)
        dmr = timeit(march_refine)
        print(f"{label:26s} : march {dm * 1e3:6.1f} ms   "
              f"+refine {(dmr - dm) * 1e3:6.1f} ms  (cap {cap})")

    # --- elementwise pyramid plumbing (no marching) ------------------------
    @jax.jit
    def plumbing(z):
        overflow = jnp.asarray(0, jnp.int32)
        for s in (4, 2, 1):
            h_l, w_l = H_C // s, W_C // s
            invz = jnp.where(jnp.isfinite(z), 1.0 / z, 0.0)
            finite = jnp.isfinite(z)
            d2u = jnp.abs(invz - 0.5 * (jnp.roll(invz, 1, 2)
                                        + jnp.roll(invz, -1, 2)))
            d2v = jnp.abs(invz - 0.5 * (jnp.roll(invz, 1, 1)
                                        + jnp.roll(invz, -1, 1)))
            edge_p = ((~finite)
                      | (rc._max_pool3((~finite).astype(rc._F32)) > 0)
                      | (jnp.maximum(d2u, d2v) > 1e-3))
            edge_p = rc._max_pool3(edge_p.astype(rc._F32)) > 0
            invz_up = rc._upsample_bilinear(
                rc._upsample_bilinear(invz, 2, axis=1), 2, axis=2)
            z_up = jnp.where(invz_up > 1e-9, 1.0 / invz_up, jnp.inf)
            flat_edge = edge_p.reshape(-1)
            rank = jnp.cumsum(flat_edge.astype(jnp.int32))
            overflow = overflow + rank[-1]
            z = z_up
        return z, overflow

    dt = timeit(plumbing, z8)
    print(f"pyramid plumbing (no march): {dt * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()

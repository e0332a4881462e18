#!/usr/bin/env python
"""Measure per-iteration live-lane counts of the raycast march (CPU-safe).

Replicates the renderer's full-res edge-level construction on the analytic
room (parent depth = half-res ground truth) and runs the march with
iter_stats=True, printing how many lanes are still marching after each
iteration.  This is the algorithmic retire profile that sizes mid-march
re-compaction: if 90% of lanes retire in <=4 iterations, the remaining
iterations run at a fraction of the width.

Usage: JAX_PLATFORMS=cpu python tools/march_stats.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.ops import raycast as rc
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg, render_box_depth

    vol, gt, cfg_s = build_volume()
    slot_dist, ext, aabb, n_bucket = rc._prep_cache.get(vol)
    cfg = vol.cfg
    vs = cfg.voxel_size
    pad = 3.0 * vs
    t_min, t_max = 0.05, cfg.depth_max * 1.5

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    cxf = W_C - cx
    T_cw = gt.extrinsics_cw[0].astype(np.float32)

    # Parent level: half-res analytic depth (stands in for the rendered
    # pyramid parent; same planarity structure).
    hp, wp = H_C // 2, W_C // 2
    fxp, fyp, cxp, cyp = fx / 2, fy / 2, (cxf - 0.5) / 2 + 0.25, (cy - 0.5) / 2 + 0.25
    zp = render_box_depth(
        T_cw.astype(np.float64), fxp, fyp, cxp, cyp, wp, hp,
        np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max))[None]
    zp = jnp.asarray(np.nan_to_num(zp, posinf=np.inf))

    # Edge detection identical to _render_frames at s=1.
    invz = jnp.where(jnp.isfinite(zp), 1.0 / zp, 0.0)
    finite = jnp.isfinite(zp)
    d2u = jnp.abs(invz - 0.5 * (jnp.roll(invz, 1, 2) + jnp.roll(invz, -1, 2)))
    d2v = jnp.abs(invz - 0.5 * (jnp.roll(invz, 1, 1) + jnp.roll(invz, -1, 1)))
    edge_p = ((~finite) | (rc._max_pool3((~finite).astype(rc._F32)) > 0)
              | (jnp.maximum(d2u, d2v) > 1e-3))
    edge = jnp.repeat(jnp.repeat(edge_p, 2, 1), 2, 2)[:, :H_C, :W_C]

    t0p = jnp.where(jnp.isfinite(rc._min_pool3(zp)),
                    jnp.maximum(rc._min_pool3(zp) - pad, t_min), t_min)
    zmax = rc._max_pool3(zp)
    t_hip = jnp.where(jnp.isfinite(zmax), zmax + pad, t_max)
    t0_full = jnp.repeat(jnp.repeat(t0p, 2, 1), 2, 2)[:, :H_C, :W_C].reshape(-1)
    t_hi_full = jnp.repeat(jnp.repeat(t_hip, 2, 1), 2, 2)[:, :H_C, :W_C].reshape(-1)

    n_px = H_C * W_C
    flat_edge = np.asarray(edge).reshape(-1)
    ids = np.nonzero(flat_edge)[0].astype(np.int32)
    cap = max(n_px // 20, 4096)
    print(f"edge pixels: {len(ids)} / {n_px} ({len(ids) / n_px * 100:.1f}%); "
          f"cap {cap}")
    ids = ids[:cap]

    ys = (ids // W_C).astype(np.float32)
    xs = (ids % W_C).astype(np.float32)
    d_cam = np.stack([(xs - cxf) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    Rcw = T_cw[:3, :3]
    dirs = d_cam @ Rcw.T
    origins = np.broadcast_to(T_cw[:3, 3], dirs.shape)

    dirs_j = jnp.asarray(dirs, jnp.float32)
    orig_j = jnp.asarray(origins, jnp.float32)

    def aabb_span(o, d):
        safe = jnp.where(jnp.abs(d) < 1e-12,
                         jnp.where(d >= 0, 1e-12, -1e-12), d)
        inv = 1.0 / safe
        t1 = (aabb[0][None] - o) * inv
        t2 = (aabb[1][None] - o) * inv
        return (jnp.max(jnp.minimum(t1, t2), -1),
                jnp.min(jnp.maximum(t1, t2), -1))

    t_en, t_ex = aabb_span(orig_j, dirs_j)
    t0 = jnp.maximum(jnp.asarray(t0_full)[ids], jnp.maximum(t_en - vs, t_min))
    t_hi = jnp.minimum(jnp.asarray(t_hi_full)[ids], t_ex + vs)

    found, ta, tb, va, vb, live = rc._march(
        cfg, slot_dist, ext, n_bucket, orig_j, dirs_j, t0, t_min, t_hi,
        24, iter_stats=True)
    live = np.asarray(live)
    n = len(ids)
    print(f"found: {int(np.asarray(found).sum())} / {n}")
    for k, c in enumerate(live):
        print(f"after iter {k + 1:2d}: {int(c):7d} live ({int(c) / n * 100:5.1f}%)")

    # Base level too: full 1/8 grid from t_min.
    h0, w0 = H_C // 8, W_C // 8
    ys0, xs0 = np.meshgrid(np.arange(h0, dtype=np.float32),
                           np.arange(w0, dtype=np.float32), indexing="ij")
    px = (xs0 + 0.5) * 8 - 0.5
    py = (ys0 + 0.5) * 8 - 0.5
    d0 = np.stack([(px - cxf) / fx, (py - cy) / fy, np.ones_like(px)], -1)
    d0 = (d0.reshape(-1, 3) @ Rcw.T).astype(np.float32)
    o0 = np.broadcast_to(T_cw[:3, 3], d0.shape).astype(np.float32)
    t_en0, t_ex0 = aabb_span(jnp.asarray(o0), jnp.asarray(d0))
    t00 = jnp.maximum(jnp.full((len(d0),), t_min, jnp.float32),
                      jnp.maximum(t_en0 - vs, t_min))
    thi0 = jnp.minimum(jnp.full((len(d0),), t_max, jnp.float32), t_ex0 + vs)
    *_, live0 = rc._march(cfg, slot_dist, ext, n_bucket, jnp.asarray(o0),
                          jnp.asarray(d0), t00, t_min, thi0, 64,
                          iter_stats=True)
    live0 = np.asarray(live0)
    print(f"\nbase level ({len(d0)} rays):")
    for k in range(0, 64, 4):
        c = int(live0[k])
        print(f"after iter {k + 1:2d}: {c:7d} live ({c / len(d0) * 100:5.1f}%)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe raycast accuracy internals: TSDF residual at hit points, d2(1/z)
noise at each pyramid level, effect of extra refine iterations."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def main():
    vol, gt, cfg_s = build_volume()
    import jax.numpy as jnp
    from mq3d_tpu.ops.raycast import (
        _prep_cache, _march, _refine, _ray_dirs, _trilinear, _F32,
    )
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg, render_box_depth

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = fx, fy
    K[0, 2], K[1, 2] = W_C - cx, cy
    T_wc = np.linalg.inv(gt.extrinsics_cw[0])
    T_cw = np.linalg.inv(T_wc).astype(np.float32)

    slot_dist, ext, aabb, n_bucket = _prep_cache.get(vol)
    cfg = vol.cfg

    # Full march at scale 4 (no pyramid), measure accuracy + d2 noise.
    for s in (8, 4):
        h_l, w_l = H_C // s, W_C // s
        dirs = _ray_dirs(
            jnp.asarray(K)[None], jnp.asarray(T_cw[:3, :3])[None], s, h_l, w_l
        ).reshape(-1, 3)
        origins = jnp.broadcast_to(
            jnp.asarray(T_cw[:3, 3]), (h_l * w_l, 3)
        )
        t0 = jnp.full((h_l * w_l,), 0.05, _F32)
        found, ta, tb, va, vb = _march(
            cfg, slot_dist, ext, n_bucket, origins, dirs, t0, 0.05, 6.0, 96
        )
        t_hit = _refine(
            cfg, slot_dist, ext, n_bucket, origins, dirs, found, ta, tb, va, vb
        )
        # TSDF residual at hit
        p_hit = origins + dirs * t_hit[:, None]
        v_hit, ok = _trilinear(cfg, n_bucket, slot_dist, ext, p_hit)
        v_hit = np.asarray(v_hit)[np.asarray(found)]
        print(f"scale {s}: tsdf residual at hit (x trunc = m): "
              f"median {np.median(np.abs(v_hit)) * cfg.trunc * 1000:.3f} mm "
              f"p95 {np.percentile(np.abs(v_hit), 95) * cfg.trunc * 1000:.3f} mm")
        z = np.asarray(t_hit).reshape(h_l, w_l)
        ref = render_box_depth(
            gt.extrinsics_cw[0], fx / s, fy / s, (W_C - cx) / s - 0.5 + 0.5 / s * 0,
            cy / s, w_l, h_l,
            np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max),
        )
        # d2 of 1/z
        invz = np.where(np.isfinite(z), 1.0 / z, 0.0)
        d2u = np.abs(invz[:, 1:-1] - 0.5 * (invz[:, 2:] + invz[:, :-2]))
        d2v = np.abs(invz[1:-1, :] - 0.5 * (invz[2:, :] + invz[:-2, :]))
        print(f"scale {s}: d2u median {np.median(d2u):.2e} p90 "
              f"{np.percentile(d2u, 90):.2e} p99 {np.percentile(d2u, 99):.2e} "
              f"(eps=2e-4); frac>eps "
              f"{np.mean(np.maximum(d2u[:-2, :], d2v[:, :-2]) > 2e-4) * 100:.1f}%")


if __name__ == "__main__":
    main()

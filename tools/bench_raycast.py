#!/usr/bin/env python
"""Raycast micro-benchmark at the reference's color-camera resolution.

Builds a production-scale synthetic volume (voxel 1 cm, block 16^3, room
orbit capture like bench.py) and times full-frame z-depth rendering at
1280x960 — the workload of color-aligned depth rendering
(reference reconstruct_scene.py:180-226, Embree CPU ~0.2 s/frame).

Usage: python tools/bench_raycast.py [n_frames] [--impl current]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

W_D, H_D = 320, 288  # depth (integration)
W_C, H_C = 1280, 960  # color (raycast target)


def build_volume(n_integrate=50):
    from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume
    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig,
        orbit_poses_o3d,
        render_box_depth,
        intrinsics_from_cfg,
    )

    cfg_s = SyntheticSceneConfig(
        n_frames=n_integrate, depth_width=W_D, depth_height=H_D, sweep=2 * np.pi
    )
    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_D, H_D)
    cxf = W_D - cx
    gt = orbit_poses_o3d(cfg_s)
    poses_cw = gt.extrinsics_cw.astype(np.float64)

    depths = np.empty((n_integrate, H_D, W_D), np.float32)
    for i in range(n_integrate):
        depths[i] = render_box_depth(
            poses_cw[i], fx, fy, cxf, cy, W_D, H_D,
            np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max),
        ).astype(np.float32)
    depths = np.nan_to_num(depths, posinf=0.0)

    K = np.tile(np.eye(3, dtype=np.float32), (n_integrate, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = cxf, cy
    T_wc = np.linalg.inv(poses_cw).astype(np.float32)

    cfg = TSDFConfig()  # production defaults: 1 cm voxel, 50k blocks
    vol = TSDFVolume(cfg)
    chunk = 10
    for s in range(0, n_integrate, chunk):
        vol.integrate(depths[s : s + chunk], K[s : s + chunk], T_wc[s : s + chunk])
    import jax

    jax.block_until_ready(vol.state.tsdf)
    print(f"volume: {vol.n_active} active blocks")
    return vol, gt, cfg_s


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    vol, gt, cfg_s = build_volume()

    from mq3d_tpu.ops.raycast import raycast_depth
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    K = np.eye(3)
    K[0, 0], K[1, 1] = fx, fy
    K[0, 2], K[1, 2] = W_C - cx, cy
    T_wc = np.linalg.inv(gt.extrinsics_cw[0])

    # Warmup (compile + prep)
    t0 = time.perf_counter()
    d = raycast_depth(vol, K, T_wc, W_C, H_C)
    print(f"warmup: {time.perf_counter() - t0:.2f}s; "
          f"finite {np.isfinite(d).mean() * 100:.1f}%")

    times = []
    for i in range(n_frames):
        T_wc_i = np.linalg.inv(gt.extrinsics_cw[i % len(gt.extrinsics_cw)])
        t0 = time.perf_counter()
        d = raycast_depth(vol, K, T_wc_i, W_C, H_C)
        times.append(time.perf_counter() - t0)
    ms = np.asarray(times) * 1e3
    print(f"per-frame: median {np.median(ms):.0f} ms  min {ms.min():.0f} ms  "
          f"max {ms.max():.0f} ms   ({W_C}x{H_C})")
    # Accuracy vs analytic room
    from mq3d_tpu.testing.synthetic import render_box_depth
    ref = render_box_depth(
        gt.extrinsics_cw[(n_frames - 1) % len(gt.extrinsics_cw)],
        fx, fy, W_C - cx, cy, W_C, H_C,
        np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max),
    )
    m = np.isfinite(d) & np.isfinite(ref)
    err = np.abs(d[m] - ref[m])
    print(f"accuracy: median {np.median(err) * 1000:.2f} mm  "
          f"p95 {np.percentile(err, 95) * 1000:.2f} mm  "
          f"coverage {m.mean() * 100:.1f}%")


if __name__ == "__main__":
    main()

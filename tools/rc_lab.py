#!/usr/bin/env python
"""Raycast optimization lab: honest timings + accuracy for knob variants.

The tunneled runtime's block_until_ready does NOT block (measured
2026-08-19: an 8192^3 matmul "completed" in 0.04 ms), so every timing here
forces a real device->host scalar fetch that depends on the rendered
output.  RTT is ~30 ms; batches of F=16 frames (~1.3 s) amortize it.

Usage: python tools/rc_lab.py [F] [variant ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def true_sync(z):
    """Force completion: fetch a scalar that depends on every level's
    scatter (device_get of a tiny slice program's output)."""
    import jax

    return float(jax.device_get(z[-1, -1, -1]))


def analytic_depth(gt, cfg_s, F):
    from mq3d_tpu.testing.synthetic import render_box_depth, intrinsics_from_cfg

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    cxf = W_C - cx
    poses_cw = gt.extrinsics_cw.astype(np.float64)
    ref = np.empty((F, H_C, W_C), np.float32)
    for i in range(F):
        ref[i] = render_box_depth(
            poses_cw[i], fx, fy, cxf, cy, W_C, H_C,
            np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max),
        )
    return ref


def make_KT(gt, cfg_s, F):
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    K = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = fx, fy
    K[:, 0, 2], K[:, 1, 2] = W_C - cx, cy
    T_wc = np.linalg.inv(gt.extrinsics_cw[:F]).astype(np.float64)
    return K, T_wc


VARIANTS = {
    "base": {},
    "scales_821": {"pyramid_scales": (8, 2, 1)},
    "scales_81": {"pyramid_scales": (8, 1)},
    "iters10": {"fine_march_iters": 10},
    "iters20": {"fine_march_iters": 20},
    "base32": {"base_march_iters": 32},
    "mid24": {"edge_mult_mid": 24},
    "full6": {"edge_mult_full": 6},
    "refine21": {"refine_samples_fine": 2, "refine_iters_fine": 1},
    "base24": {"base_march_iters": 24},
    "combo1": {"base_march_iters": 32, "fine_march_iters": 10},
    "combo2": {"base_march_iters": 32, "fine_march_iters": 10,
               "refine_samples_fine": 2, "refine_iters_fine": 1,
               "edge_mult_full": 6},
    "combo3": {"base_march_iters": 32, "fine_march_iters": 10,
               "refine_samples_fine": 2, "refine_iters_fine": 1,
               "edge_mult_full": 6,
               "refine_samples_base": 3, "refine_iters_base": 1},
    "combo4": {"base_march_iters": 24, "fine_march_iters": 8,
               "refine_samples_fine": 2, "refine_iters_fine": 1,
               "edge_mult_full": 6,
               "refine_samples_base": 3, "refine_iters_base": 1},
}


def run_variant(vol, K, T_wc, ref, name, knobs, reps=3):
    import jax

    from mq3d_tpu.ops.raycast import _render_frames_device

    F = K.shape[0]
    out = _render_frames_device(vol, K, T_wc, W_C, H_C, **knobs)
    z, overflow = out[0], out[1]
    true_sync(z)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _render_frames_device(vol, K, T_wc, W_C, H_C, **knobs)
        z = out[0]
        true_sync(z)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / F * 1e3
    zh = np.asarray(z)
    both = np.isfinite(zh) & np.isfinite(ref)
    err = np.abs(zh[both] - ref[both]) * 1e3  # mm
    cover = float(
        (np.isfinite(zh) & np.isfinite(ref)).sum()
        / max(np.isfinite(ref).sum(), 1)
    )
    n_over = int(np.asarray(overflow))
    print(
        f"{name:12s} {ms:7.1f} ms/f  med {np.median(err):6.3f} mm  "
        f"p95 {np.percentile(err, 95):6.3f} mm  cover {cover:6.4f}  "
        f"overflow {n_over}",
        flush=True,
    )
    return ms


def cached_volume(path="/tmp/rc_vol.npz"):
    """Volume build is ~90 s of TPU integration; cache the state npz so
    every lab invocation after the first loads in seconds."""
    import os

    from mq3d_tpu.ops.tsdf import TSDFVolume
    from mq3d_tpu.testing.synthetic import SyntheticSceneConfig, orbit_poses_o3d

    cfg_s = SyntheticSceneConfig(
        n_frames=50, depth_width=320, depth_height=288, sweep=2 * np.pi
    )
    gt = orbit_poses_o3d(cfg_s)
    if os.path.exists(path):
        vol = TSDFVolume.load(path)
        print(f"volume: {vol.n_active} active blocks (cached)", flush=True)
        return vol, gt, cfg_s
    vol, gt, cfg_s = build_volume()
    vol.save(path)
    return vol, gt, cfg_s


def show_level_stats(vol, K, T_wc):
    from mq3d_tpu.ops.raycast import _render_frames_device

    z, overflow, stats = _render_frames_device(
        vol, K, T_wc, W_C, H_C, level_stats=True)
    true_sync(z)
    s = np.asarray(stats)
    print("level  n_edge     cap     found  (fine levels, coarse->fine)")
    for i, (n_edge, cap, found) in enumerate(s):
        print(f"  {i}: {n_edge:8d} {cap:8d} {found:8d}"
              f"   fill {n_edge / max(cap, 1):.2f}", flush=True)


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2:] or list(VARIANTS)
    vol, gt, cfg_s = cached_volume()
    K, T_wc = make_KT(gt, cfg_s, F)
    if which == ["stats"]:
        show_level_stats(vol, K, T_wc)
        return
    ref = analytic_depth(gt, cfg_s, F)
    for name in which:
        run_variant(vol, K, T_wc, ref, name, VARIANTS[name])


if __name__ == "__main__":
    main()

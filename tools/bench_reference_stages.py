#!/usr/bin/env python
"""Measure CPU reference baselines for the two remaining hot stages:
confidence reprojection and one multiscale-ICP fragment pair.

The reference runs both on CPU (numpy + a process pool for confidence,
Open3D multi_scale_icp for pairs); neither publishes numbers and Open3D is
not installable in this image, so native/ref_confidence_cpu.cpp and
native/ref_icp_cpu.cpp provide well-optimized single-core C++
transcriptions of the same workloads (semantics per
compute_pixel_error_map.py:120-219 / refine_fragment_poses.py:153-161).
BASELINE.md derives 16-core x 0.8 user-workstation bounds from these.

Usage: JAX_PLATFORMS=cpu python tools/bench_reference_stages.py [--parity]
"""

import ctypes
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
# CPU-only tool: the JAX_PLATFORMS env var alone is overridden by the
# preinstalled TPU plugin; mq3d_tpu's MQ3D_FORCE_CPU hook routes through
# the config API before backend init (and keeps this tool off the
# exclusive single-process TPU tunnel).
os.environ["MQ3D_FORCE_CPU"] = "1"
import mq3d_tpu  # noqa: E402,F401

H, W = 288, 320
WINDOW = 10
DEPTH_MAX = 4.0
ERROR_THRESHOLD = 0.08  # config/pipeline_config.yml:36


def load_lib(name):
    src = Path(f"native/{name}.cpp")
    so = Path(f"/tmp/lib{name}.so")
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(src),
             "-o", str(so)],
            check=True,
        )
    return ctypes.CDLL(str(so))


def make_capture(n_frames=41):
    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig,
        intrinsics_from_cfg,
        orbit_poses_o3d,
        render_box_depth,
    )

    cfg = SyntheticSceneConfig(
        n_frames=n_frames, depth_width=W, depth_height=H, sweep=0.6
    )
    fx, fy, cx, cy = intrinsics_from_cfg(cfg, W, H)
    cxf = W - cx
    gt = orbit_poses_o3d(cfg)
    poses_cw = gt.extrinsics_cw.astype(np.float64)
    depth = np.empty((n_frames, H, W), np.float32)
    for i in range(n_frames):
        depth[i] = render_box_depth(
            poses_cw[i], fx, fy, cxf, cy, W, H,
            np.asarray(cfg.box_min), np.asarray(cfg.box_max),
        )
    depth = np.nan_to_num(depth, posinf=0.0)
    K = np.zeros((n_frames, 9), np.float32)
    K[:, 0], K[:, 4] = fx, fy
    K[:, 2], K[:, 5] = cxf, cy
    K[:, 8] = 1
    T_cw = poses_cw[:, :3, :].reshape(n_frames, 12).astype(np.float32)
    T_wc = np.linalg.inv(poses_cw)[:, :3, :].reshape(n_frames, 12).astype(
        np.float32)
    return depth, K, T_cw, T_wc, poses_cw


def bench_confidence(parity=False):
    lib = load_lib("ref_confidence_cpu")
    lib.conf_build_map.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]

    depth, K, T_cw, T_wc, poses_cw = make_capture()
    n = depth.shape[0]
    conf = np.zeros(H * W, np.float32)
    cnt = np.zeros(H * W, np.int32)

    def run(ref):
        lib.conf_build_map(
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, H, W,
            K.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T_cw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T_wc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ref, WINDOW, DEPTH_MAX, ERROR_THRESHOLD,
            conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )

    run(WINDOW)  # warm
    reps = 10
    t0 = time.perf_counter()
    for r in range(reps):
        run(WINDOW + r % 3)
    per_frame = (time.perf_counter() - t0) / reps
    fps = 1.0 / per_frame
    print(f"confidence C++ single-core: {per_frame * 1e3:.1f} ms/ref-frame "
          f"({fps:.2f} f/s) at {W}x{H}, window {WINDOW}")
    print(f"  1000-frame stage: {1000 * per_frame:.0f} s single-core, "
          f"{1000 * per_frame / (16 * 0.8):.0f} s at 16-core x0.8")

    if parity:
        run(WINDOW)
        from mq3d_tpu.recon.confidence import confidence_for_refs

        Km = K.reshape(n, 3, 3)
        conf_j, cnt_j = confidence_for_refs(
            depth, Km, poses_cw.astype(np.float32),
            np.linalg.inv(poses_cw).astype(np.float32),
            np.ones(n, bool),
            np.asarray([WINDOW], np.int32), depth_max=DEPTH_MAX,
            error_threshold=ERROR_THRESHOLD, window=WINDOW,
        )
        cj = np.asarray(cnt_j)[0].reshape(-1)
        match = float((cj == cnt) .mean())
        dconf = np.abs(np.asarray(conf_j)[0].reshape(-1) - conf)
        print(f"  parity vs mq3d_tpu confidence_for_refs: valid_count match "
              f"{match:.4f}, conf |diff| p99 {np.percentile(dconf, 99):.4f}")
    return fps


def bench_icp(parity=False):
    lib = load_lib("ref_icp_cpu")
    lib.icp_multiscale.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
    ]

    # Fragment-scale clouds: ~500k surface points (the pipeline's measured
    # fragment pcd size at production config, BASELINE.md round-3 notes).
    rng = np.random.default_rng(0)
    n_pts = 500_000
    # Room-like surface: points on 5 faces of a 6x5x3 m box + noise.
    faces = []
    per = n_pts // 5
    for axis, lo_hi in ((0, 0.0), (0, 6.0), (1, 0.0), (1, 5.0), (2, 0.0)):
        p = rng.uniform(0, 1, (per, 3)) * np.array([6.0, 5.0, 3.0])
        p[:, axis] = lo_hi
        faces.append(p)
    dst = np.concatenate(faces).astype(np.float32)
    dst += rng.normal(0, 0.003, dst.shape).astype(np.float32)

    ang = 0.02
    Rz = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ], np.float32)
    src = (dst @ Rz.T + np.array([0.04, -0.03, 0.02], np.float32))
    src = np.ascontiguousarray(src[rng.permutation(len(src))])

    voxels = np.asarray([0.05, 0.025, 0.0125], np.float32)
    dists = np.asarray([0.1, 0.05, 0.025], np.float32)
    iters = np.asarray([50, 31, 14], np.int32)
    T = np.zeros(16, np.float64)
    fit = ctypes.c_double()
    rmse = ctypes.c_double()
    it_out = ctypes.c_int32()

    def run():
        lib.icp_multiscale(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(src),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(dst),
            voxels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 3,
            T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.byref(fit), ctypes.byref(rmse), ctypes.byref(it_out),
        )

    run()  # warm (allocator, page faults)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    per_pair = (time.perf_counter() - t0) / reps
    print(f"multiscale ICP C++ single-core: {per_pair:.2f} s/pair "
          f"({len(src)} pts, {it_out.value} total iters, "
          f"fitness {fit.value:.3f}, rmse {rmse.value * 1e3:.2f} mm)")
    # The reference registers ~F^2/2 candidate pairs; report the unit cost
    # + the 16-core bound (the reference pool fans pairs over processes).
    print(f"  16-core x0.8 bound: {per_pair / (16 * 0.8):.3f} s/pair")

    # Recovered transform must invert the applied perturbation.
    Tm = T.reshape(4, 4)
    Rerr = Tm[:3, :3] @ Rz
    ang_err = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
    print(f"  transform check: residual rotation {ang_err:.4f} deg")

    if parity:
        from mq3d_tpu.ops.icp import ICPConvergenceCriteria, multi_scale_icp

        t0 = time.perf_counter()
        res = multi_scale_icp(
            src, dst,
            voxel_sizes=[0.05, 0.025, 0.0125],
            criteria_list=[ICPConvergenceCriteria(50),
                           ICPConvergenceCriteria(31),
                           ICPConvergenceCriteria(14)],
            max_correspondence_distances=[0.1, 0.05, 0.025],
        )
        Rm = np.asarray(res.transformation)[:3, :3] @ Rz
        ang2 = np.degrees(
            np.arccos(np.clip((np.trace(Rm) - 1) / 2, -1, 1)))
        print(f"  mq3d_tpu multi_scale_icp: fitness {res.fitness:.3f}, "
              f"residual rotation {ang2:.4f} deg "
              f"({time.perf_counter() - t0:.1f} s wall incl. compile)")
    return per_pair


def main():
    parity = "--parity" in sys.argv
    bench_confidence(parity)
    bench_icp(parity)


if __name__ == "__main__":
    main()

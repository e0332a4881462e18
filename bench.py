#!/usr/bin/env python
"""Benchmark: TSDF integration throughput (frames/sec/chip) on real hardware.

Runs the flagship kernel — chunk-fused TSDF integration at the reference's
production configuration (voxel 1 cm, block 16^3, 50k blocks, depth_max 4 m,
Quest-depth-sized 320x288 frames) — over a synthetic 1000-frame capture and
prints ONE JSON line:

  {"metric": "tsdf_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N}

vs_baseline compares against the reference pipeline's CPU Open3D
VoxelBlockGrid.integrate path.  The reference publishes no numbers
(BASELINE.md) and Open3D is not installed in this image, so the constant
below is a deliberately reference-favorable estimate: a single-thread numpy
transcription of the allocate-then-integrate loop measures 1.7 frames/s on
this host (579 ms/frame, same workload); Open3D's C++ kernels are assumed
~7x faster than numpy -> 12 frames/s.
"""

import json
import sys
import time

import numpy as np

# Reference CPU baseline (frames/sec) for the same workload; see module
# docstring. Measured/estimated for Open3D 0.19 CPU VoxelBlockGrid.
BASELINE_FRAMES_PER_SEC = 12.0

N_FRAMES = 1000
H, W = 288, 320
CHUNK = 20


def make_capture():
    """Synthetic room orbit at Quest depth-camera scale."""
    sys.path.insert(0, ".")
    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig,
        orbit_poses_o3d,
        render_box_depth,
        intrinsics_from_cfg,
    )

    cfg = SyntheticSceneConfig(
        n_frames=N_FRAMES, depth_width=W, depth_height=H, sweep=2 * np.pi
    )
    fx, fy, cx, cy = intrinsics_from_cfg(cfg, W, H)
    cxf = W - cx
    gt = orbit_poses_o3d(cfg)
    poses_cw = gt.extrinsics_cw.astype(np.float64)

    # Render a subset of unique frames and tile (rendering is not the thing
    # being benchmarked; integration cost is identical).
    uniq = 50
    depths = np.empty((uniq, H, W), np.float32)
    for i in range(uniq):
        depths[i] = render_box_depth(
            poses_cw[i * (N_FRAMES // uniq)], fx, fy, cxf, cy, W, H,
            cfg.box_min, cfg.box_max,
        )
    depth = depths[np.arange(N_FRAMES) % uniq]

    K = np.zeros((N_FRAMES, 3, 3), np.float32)
    K[:, 0, 0] = fx
    K[:, 1, 1] = fy
    K[:, 0, 2] = cxf
    K[:, 1, 2] = cy
    K[:, 2, 2] = 1
    order = (np.arange(N_FRAMES) % uniq) * (N_FRAMES // uniq)
    T_wc = np.linalg.inv(poses_cw[order]).astype(np.float32)
    valid = np.ones(N_FRAMES, bool)
    return depth, K, T_wc, valid


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from mq3d_tpu.ops.tsdf import TSDFConfig, create_state, integrate_chunk

    cfg = TSDFConfig(
        voxel_size=0.01,
        block_resolution=16,
        block_count=50_000,
        grid_dim=160,
        depth_max=4.0,
        trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2,
        chunk_active_capacity=12_288,
        integrate_tile=512,
    )

    depth, K, T_wc, valid = make_capture()
    state = create_state(cfg)

    # Warmup/compile on the first chunk.
    state = integrate_chunk(
        cfg, state,
        jnp.asarray(depth[:CHUNK]), jnp.asarray(K[:CHUNK]),
        jnp.asarray(T_wc[:CHUNK]), jnp.asarray(valid[:CHUNK]),
    )
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for s in range(CHUNK, N_FRAMES, CHUNK):
        state = integrate_chunk(
            cfg, state,
            jnp.asarray(depth[s : s + CHUNK]), jnp.asarray(K[s : s + CHUNK]),
            jnp.asarray(T_wc[s : s + CHUNK]), jnp.asarray(valid[s : s + CHUNK]),
        )
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    frames = N_FRAMES - CHUNK
    fps = frames / elapsed
    print(
        json.dumps(
            {
                "metric": "tsdf_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decompose the honest-sync TSDF integrate cost (VERDICT r4 item 1).

Measures, on the exact bench workload (1000-frame room orbit, production
config), with forced scalar-fetch syncs at every boundary:

  A. full integrate_chunk steady-state (the bench number)
  B. phase-A-only cost: same launch with frame_valid=False (empty touch set
     -> n_tiles_dyn = 0 -> the grouped while loop runs zero groups), i.e.
     allocation scatter + cumsum + bookkeeping + fixed launch overhead
  C. launch-count scaling: marginal time per launch over long vs short
     runs (isolates any fixed per-launch tunnel penalty)
  D. depth_lookup onehot vs flat A/B at the bench shape
  E. touched-pair statistics (host numpy): per chunk, active blocks,
     per-frame touched blocks, and the computed-vs-needed ratio
     (n_tiles*C*TM vs sum_f touched_f) -- the ceiling for frame-skip /
     pair-compaction gains.

Usage: python tools/probe_integrate_decomp.py [A B C D E]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402  (reuses the bench capture + config)


def make_cfg(**over):
    from mq3d_tpu.ops.tsdf import TSDFConfig

    base = dict(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )
    base.update(over)
    return TSDFConfig(**base)


def timed_run(cfg_t, depth, K, T_wc, valid, n_frames, tag, chunk=20):
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import create_state, integrate_chunk
    from mq3d_tpu.utils.host import fetch_int

    state = create_state(cfg_t)
    state = integrate_chunk(
        cfg_t, state, jnp.asarray(depth[:chunk]), jnp.asarray(K[:chunk]),
        jnp.asarray(T_wc[:chunk]), jnp.asarray(valid[:chunk]))
    fetch_int(state.n_active)
    t0 = time.perf_counter()
    n_launch = 0
    for s in range(chunk, n_frames, chunk):
        state = integrate_chunk(
            cfg_t, state, jnp.asarray(depth[s:s + chunk]),
            jnp.asarray(K[s:s + chunk]), jnp.asarray(T_wc[s:s + chunk]),
            jnp.asarray(valid[s:s + chunk]))
        n_launch += 1
    fetch_int(state.n_active)
    dt = time.perf_counter() - t0
    fps = (n_frames - chunk) / dt
    print(f"{tag}: {dt:.3f}s, {dt / n_launch * 1e3:.1f} ms/launch, "
          f"{fps:.1f} f/s  ({n_launch} launches)", flush=True)
    return dt / n_launch


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}
    depth, K, T_wc, valid, gt, scene_cfg = bench.make_capture()
    print("[probe] capture ready", flush=True)

    if "E" in which:
        # Host-side touch statistics (no device needed).
        cfg = make_cfg()
        G, bs, tr = cfg.grid_dim, cfg.block_size, cfg.trunc
        CH = 20
        offs = (np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                     indexing="ij"), -1).reshape(-1, 3)
                * tr)
        tots = []
        for s in range(0, 200, CH):  # first 10 chunks are representative
            per_frame = []
            union = set()
            for f in range(s, s + CH):
                d = depth[f][::2, ::2]
                Kf = K[f]
                H, W = depth[f].shape
                u, v = np.meshgrid(np.arange(0, W, 2), np.arange(0, H, 2))
                ok = (d > 0) & (d <= cfg.depth_max)
                x = (u - Kf[0, 2]) / Kf[0, 0] * d
                y = (v - Kf[1, 2]) / Kf[1, 1] * d
                pc = np.stack([x[ok], y[ok], d[ok]], -1)
                T = np.linalg.inv(T_wc[f])
                pw = pc @ T[:3, :3].T + T[:3, 3]
                cand = (pw[:, None, :] + offs[None]) / bs
                bc = np.floor(cand).astype(np.int64).reshape(-1, 3)
                keys = ((bc[:, 0] + G // 2) * G + bc[:, 1] + G // 2) * G \
                    + bc[:, 2] + G // 2
                ks = set(np.unique(keys).tolist())
                per_frame.append(len(ks))
                union |= ks
            n_active = len(union)
            pairs = sum(per_frame)
            computed = int(np.ceil(n_active / cfg.integrate_tile)) \
                * cfg.integrate_tile * CH
            tots.append((n_active, pairs, computed))
            print(f"chunk {s // CH}: active={n_active} "
                  f"touched-pairs={pairs} computed-pairs={computed} "
                  f"ratio={computed / pairs:.2f} "
                  f"mean-frames/block={pairs / n_active:.2f}", flush=True)
        a = np.array(tots, float)
        print(f"[E] mean computed/touched ratio: "
              f"{(a[:, 2] / a[:, 1]).mean():.2f}  "
              f"(ceiling for pair-compaction gain)", flush=True)

    if not (which - {"E"}):
        return

    if "A" in which:
        timed_run(make_cfg(), depth, K, T_wc, valid, 1000,
                  "[A] full integrate (onehot auto)")

    if "B" in which:
        novalid = np.zeros_like(valid)
        timed_run(make_cfg(), depth, K, T_wc, novalid, 1000,
                  "[B] frame_valid=False (phase A + overhead only)")

    if "C" in which:
        timed_run(make_cfg(), depth, K, T_wc, valid, 200,
                  "[C] short run (9 launches)")
        timed_run(make_cfg(), depth, K, T_wc, valid, 1000,
                  "[C] long run (49 launches)")

    if "D" in which:
        timed_run(make_cfg(depth_lookup="flat"), depth, K, T_wc, valid, 400,
                  "[D] flat gather")
        timed_run(make_cfg(depth_lookup="onehot"), depth, K, T_wc, valid,
                  1000, "[D] onehot")


if __name__ == "__main__":
    main()

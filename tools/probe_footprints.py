#!/usr/bin/env python
"""Histogram per-(block, frame) projected footprints on the bench capture.

The TSDF integrate rewrite replaces the flat per-voxel depth gather with a
one-hot matmul over a per-block image patch; the patch size must cover the
block's projected bbox.  Since z is linear over the block cube and u,v are
linear-fractional with positive denominator, the bbox extrema sit at the 8
cube corners — this probe measures, over the bench capture's first chunks,
the distribution of max(Sy, Sx) per (touched block, frame) pair to pick the
patch-size tiers.

Pure numpy (geometry only).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_capture, CHUNK  # noqa: E402
from mq3d_tpu.ops.tsdf import TSDFConfig  # noqa: E402


def main():
    cfg = TSDFConfig(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )
    depth, K, T_wc, valid, _gt, _cfg = make_capture()
    H, W = depth.shape[1:]
    G = cfg.grid_dim
    R = cfg.block_resolution

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    all_S = []
    for c0 in range(0, n_chunks * CHUNK, CHUNK):
        d = depth[c0:c0 + CHUNK]
        Kc = K[c0:c0 + CHUNK]
        T = T_wc[c0:c0 + CHUNK].astype(np.float32)
        C = d.shape[0]

        # ---- per-frame touched block sets (phase A semantics) ----
        ds = cfg.alloc_pixel_stride
        dsub = d[:, ::ds, ::ds]
        u = np.arange(0, W, ds, dtype=np.float32)[None, None, :]
        v = np.arange(0, H, ds, dtype=np.float32)[None, :, None]
        fx = Kc[:, 0, 0][:, None, None]
        fy = Kc[:, 1, 1][:, None, None]
        cx = Kc[:, 0, 2][:, None, None]
        cy = Kc[:, 1, 2][:, None, None]
        ok = (dsub > 0) & (dsub <= cfg.depth_max)
        xr = (u - cx) / fx
        yr = (v - cy) / fy
        pc = np.stack([xr * dsub, yr * dsub, dsub], -1)
        T_cw = np.linalg.inv(T)
        pw = np.einsum("cij,chwj->chwi", T_cw[:, :3, :3], pc) + \
            T_cw[:, None, None, :3, 3]
        offs = np.stack(np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"),
                        -1).reshape(-1, 3).astype(np.float32) * cfg.trunc
        cand = pw[:, :, :, None, :] + offs
        bc = np.floor(cand / cfg.block_size).astype(np.int64)
        h = G // 2
        sh = bc + h
        inr = np.all((sh >= 0) & (sh < G), -1) & ok[..., None]
        key = (sh[..., 0] * G + sh[..., 1]) * G + sh[..., 2]
        touched = [np.unique(key[f][inr[f]]) for f in range(C)]

        # ---- per (touched block, frame) corner-bbox footprint ----
        corners = np.stack(np.meshgrid(*[[0, R - 1]] * 3, indexing="ij"),
                           -1).reshape(-1, 3).astype(np.float32)
        for f in range(C):
            keys = touched[f]
            bx = keys // (G * G) - h
            by = (keys // G) % G - h
            bz = keys % G - h
            base = np.stack([bx, by, bz], -1).astype(np.float32) * R
            p = (base[:, None, :] + corners) * cfg.voxel_size  # (B,8,3)
            pcam = np.einsum("ij,bkj->bki", T[f, :3, :3], p) + T[f, :3, 3]
            z = pcam[..., 2]
            bad = (z <= 0).any(-1)
            zs = np.where(z > 0, z, 1.0)
            uu = Kc[f, 0, 0] * pcam[..., 0] / zs + Kc[f, 0, 2]
            vv = Kc[f, 1, 1] * pcam[..., 1] / zs + Kc[f, 1, 2]
            ui = np.clip(np.floor(uu + 0.5).astype(np.int64), 0, W - 1)
            vi = np.clip(np.floor(vv + 0.5).astype(np.int64), 0, H - 1)
            Sy = vi.max(-1) - vi.min(-1) + 1
            Sx = ui.max(-1) - ui.min(-1) + 1
            S = np.maximum(Sy, Sx)
            S[bad] = 10_000  # z-crossing blocks -> fallback class
            all_S.append(S)

    S = np.concatenate(all_S)
    print(f"pairs={len(S)}")
    for t in (8, 12, 16, 24, 32, 48, 64, 96, 128, 160, 320):
        print(f"  S <= {t:4d}: {np.mean(S <= t) * 100:6.2f} %")
    print(f"  z-crossing: {np.mean(S == 10_000) * 100:6.3f} %")
    qs = np.percentile(S[S < 10_000], [50, 90, 99, 99.9, 100])
    print("  pcts 50/90/99/99.9/max:", qs)

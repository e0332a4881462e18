#!/usr/bin/env python
"""Time raycast prep + render at production volume scale (tens of
thousands of blocks) without paying a full integration run: the TSDF state
is synthesized directly (spherical shell of allocated blocks)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_big_volume(n_target=32000):
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFState, TSDFVolume

    cfg = TSDFConfig(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512)
    R = cfg.block_resolution
    G = cfg.grid_dim

    # Allocate blocks on a spherical shell of radius ~2.0 m (block coords).
    rr = np.arange(-16, 16)
    gx, gy, gz = np.meshgrid(rr, rr, rr, indexing="ij")
    coords = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    dist = np.linalg.norm((coords + 0.5) * cfg.block_size, axis=-1)
    shell = coords[(dist > 1.8) & (dist < 2.35)]
    rng = np.random.default_rng(0)
    if len(shell) > n_target:
        shell = shell[rng.choice(len(shell), n_target, replace=False)]
    coords = np.ascontiguousarray(shell.astype(np.int32))
    n = len(coords)
    print(f"blocks: {n}")

    lx, ly, lz = np.meshgrid(*([np.arange(R)] * 3), indexing="ij")
    local = np.stack([lx, ly, lz], -1).reshape(-1, 3)
    centers = ((coords[:, None, :] * R + local[None]) + 0.5) * cfg.voxel_size
    d = np.linalg.norm(centers, axis=-1) - 2.1
    tsdf = np.clip(d / cfg.trunc, -1, 1).astype(np.float32)
    weight = np.full_like(tsdf, 10.0)

    h = G // 2
    keys = (((coords[:, 0] + h) * G + coords[:, 1] + h) * G
            + coords[:, 2] + h)
    slot_table = np.full((G ** 3,), -1, np.int32)
    slot_table[keys] = np.arange(n, dtype=np.int32)
    vol = TSDFVolume(cfg)
    vol.state = TSDFState(
        slot_table=jnp.asarray(slot_table),
        block_coords=jnp.asarray(
            np.concatenate([coords, np.zeros((1, 3), np.int32)])),
        tsdf=jnp.asarray(np.concatenate(
            [tsdf, np.zeros((1, cfg.r3), np.float32)])),
        weight=jnp.asarray(np.concatenate(
            [weight, np.zeros((1, cfg.r3), np.float32)])),
        n_active=jnp.asarray(n, jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        dropped_active=jnp.zeros((), jnp.int32),
    )
    return vol


def main():
    import jax

    from mq3d_tpu.ops import raycast as rc

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    vol = build_big_volume(n_blocks)

    t0 = time.perf_counter()
    slot_dist, ext, aabb, n_bucket = rc._prep_cache.get(vol)
    jax.block_until_ready(ext)
    print(f"prepare_scene (n_bucket={n_bucket}): "
          f"{time.perf_counter() - t0:.1f}s  "
          f"ext={ext.nbytes / 1e6:.0f} MB")

    W, H = 1280, 960
    K = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 900.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    T_wc = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))  # cam at origin

    t0 = time.perf_counter()
    d = rc.raycast_depth_batch(vol, K, T_wc, W, H)
    print(f"first render (compile+run, F={F}): "
          f"{time.perf_counter() - t0:.1f}s  finite "
          f"{np.isfinite(d).mean() * 100:.1f}%")
    for _ in range(2):
        t0 = time.perf_counter()
        rc.raycast_depth_batch(vol, K, T_wc, W, H)
        print(f"render: {(time.perf_counter() - t0) / F * 1e3:.0f} ms/frame")


if __name__ == "__main__":
    main()

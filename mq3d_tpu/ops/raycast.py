"""TSDF raycasting: depth rendering without Embree.

The reference renders color-aligned depth by building an Embree
RaycastingScene over the extracted mesh and casting pinhole rays per frame
(reference: scripts/processing/reconstruction/utils/o3d_utils.py:324-341,
reconstruct_scene.py:180-226).  A BVH is the wrong tool on TPU; since we own
the TSDF volume we sphere-trace it directly: adaptive ray marching with
coarse steps through unallocated space (one slot-table lookup) and
tsdf-scaled fine steps inside the truncation band, with a final linear
zero-crossing interpolation.

Matches Open3D's t_hit convention: pinhole ray directions are the
*unnormalized* K^-1 (u,v,1), so t_hit equals camera z-depth; misses are inf.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFState, TSDFVolume, _block_keys


def _sample_tsdf(state: TSDFState, cfg: TSDFConfig, p):
    """Trilinear tsdf sample at world points p (..., 3).

    Returns (tsdf, valid): valid requires all 8 corner voxels allocated with
    weight > 0.
    """
    R = cfg.block_resolution
    G = cfg.grid_dim
    cap = cfg.block_count
    vs = cfg.voxel_size

    gf = p / vs
    g0 = jnp.floor(gf).astype(jnp.int32)
    frac = gf - g0

    tsdf_acc = jnp.zeros(p.shape[:-1], jnp.float32)
    valid = jnp.ones(p.shape[:-1], bool)
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        g = g0 + jnp.asarray([dx, dy, dz], jnp.int32)
        b = jnp.floor_divide(g, R)
        local = g - b * R
        key = _block_keys(b, G)
        slot = state.slot_table[jnp.minimum(key, G ** 3 - 1)]
        ok = (key < G ** 3) & (slot >= 0)
        slot_safe = jnp.where(ok, slot, cap)
        li = (local[..., 0] * R + local[..., 1]) * R + local[..., 2]
        t = state.tsdf[slot_safe, li]
        w = state.weight[slot_safe, li]
        ok &= w > 0
        wgt = (
            jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
            * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
            * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
        )
        tsdf_acc = tsdf_acc + wgt * t
        valid &= ok
    return tsdf_acc, valid


@partial(jax.jit, static_argnames=("cfg", "max_steps"))
def _march_rays(
    cfg: TSDFConfig,
    state: TSDFState,
    origins,  # (N, 3)
    dirs,  # (N, 3) unnormalized (camera z = 1 convention)
    t_min: float,
    t_max: float,
    max_steps: int = 192,
):
    """March rays; returns t_hit (N,) with inf for misses."""
    n = origins.shape[0]
    dir_norm = jnp.linalg.norm(dirs, axis=-1)
    coarse = cfg.block_size * 0.5
    fine_min = cfg.voxel_size * 0.5
    trunc = cfg.trunc

    def cond(carry):
        t, prev_tsdf, prev_ok, last_step, hit, active, it = carry
        return jnp.any(active) & (it < max_steps)

    def step(carry):
        t, prev_tsdf, prev_ok, last_step, hit, active, it = carry
        p = origins + dirs * t[:, None]
        tsdf, ok = _sample_tsdf(state, cfg, p)

        crossed = active & ok & prev_ok & (prev_tsdf > 0) & (tsdf <= 0)
        denom = prev_tsdf - tsdf
        frac = jnp.where(
            jnp.abs(denom) > 1e-12, prev_tsdf / jnp.where(denom == 0, 1.0, denom), 0.0
        )
        t_hit_new = (t - last_step) + frac * last_step
        hit = jnp.where(crossed, t_hit_new, hit)
        active = active & ~crossed

        # Step size: coarse through unallocated space, tsdf-proportional in
        # the band (sphere tracing on the normalized field), floor at half a
        # voxel. Scale by metric distance per unit t (dir_norm).
        step_metric = jnp.where(
            ok, jnp.maximum(tsdf * trunc * 0.8, fine_min), coarse
        )
        dt = step_metric / jnp.maximum(dir_norm, 1e-9)
        t_new = t + jnp.where(active, dt, 0.0)
        active = active & (t_new <= t_max)
        return (t_new, tsdf, ok, jnp.where(active, dt, last_step), hit, active, it + 1)

    t0 = jnp.full((n,), t_min, jnp.float32)
    init = (
        t0,
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool),
        jnp.full((n,), coarse, jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.ones((n,), bool),
        jnp.asarray(0, jnp.int32),
    )
    out = jax.lax.while_loop(cond, step, init)
    return out[4]


def raycast_depth(
    volume: TSDFVolume,
    intrinsic: np.ndarray,  # (3,3) with cx already mirror-flipped
    extrinsic_wc: np.ndarray,  # (4,4)
    width: int,
    height: int,
    t_min: float = 0.05,
    t_max: float | None = None,
    ray_chunk: int = 65536,
) -> np.ndarray:
    """Render one z-depth map from the TSDF volume. inf = miss."""
    cfg = volume.cfg
    t_max = t_max if t_max is not None else cfg.depth_max * 1.5

    T_cw = np.linalg.inv(np.asarray(extrinsic_wc, np.float64)).astype(np.float32)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    d_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float32)], -1
    ).astype(np.float32)
    dirs = (d_cam.reshape(-1, 3) @ T_cw[:3, :3].T).astype(np.float32)
    origin = np.broadcast_to(T_cw[:3, 3], dirs.shape).astype(np.float32)

    n = dirs.shape[0]
    out = np.empty(n, np.float32)
    for s in range(0, n, ray_chunk):
        e = min(s + ray_chunk, n)
        o = origin[s:e]
        d = dirs[s:e]
        if e - s < ray_chunk:  # pad to static shape
            pad = ray_chunk - (e - s)
            o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
            d = np.concatenate([d, np.ones((pad, 3), np.float32)])
        t_hit = _march_rays(
            volume.cfg, volume.state, jnp.asarray(o), jnp.asarray(d),
            float(t_min), float(t_max),
        )
        out[s:e] = np.asarray(t_hit)[: e - s]
    return out.reshape(height, width)


def raycast_in_color_view(volume: TSDFVolume, dataset):
    """Generator over per-frame z-depth maps for a camera dataset, matching
    the reference surface (o3d_utils.py:324-341).  Dataset transforms must be
    in the OPEN3D camera frame."""
    K = dataset.get_render_intrinsic_matrices()
    T_wc = dataset.transforms.extrinsics_wc
    for i in range(len(dataset)):
        yield raycast_depth(
            volume,
            K[i],
            T_wc[i],
            int(dataset.widths[i]),
            int(dataset.heights[i]),
        )

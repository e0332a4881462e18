"""Color-map optimization: photometric camera refinement + color baking.

Re-design of o3d.pipelines.color_map.run_rigid_optimizer as used by the
reference (scripts/processing/reconstruction/color_map_optimization/
optimize_color_pose.py:11-100): keyframe color images (every `interval`-th
frame, both sides) are registered against the TSDF mesh by alternating
(a) per-vertex target intensities C(v) = mean of sampled image intensities
over visible frames and (b) per-frame rigid Gauss-Newton steps minimizing
sum_v (C(v) - I_f(pi(T_f v)))^2 — the rigid variant of Zhou & Koltun 2014.
Visibility comes from the TSDF-raycast depth in each color view.  Finally,
vertex colors bake as the mean of sampled RGB over visible frames.

All vertex-level work (projection, bilinear sampling, Jacobian reductions)
is batched over the full vertex set per frame on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import ColorOptimizationConfig
from mq3d_tpu.utils.host import fetch
from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.dataio.ply import TriangleMesh
from mq3d_tpu.geometry import quaternion as quat
from mq3d_tpu.geometry import se3
from mq3d_tpu.models.datasets import CameraDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem, Transforms
from mq3d_tpu.ops.mesh_filter import filter_mesh_components
from mq3d_tpu.ops.raycast import raycast_depth
from mq3d_tpu.ops.tsdf import TSDFVolume

VIS_DEPTH_THRESHOLD = 0.03  # meters; visibility depth-consistency margin


@jax.jit
def _sample_bilinear(img, u, v):
    """Bilinear sample of (H, W) or (H, W, C) image at float coords.
    Returns (value, in_bounds)."""
    h, w = img.shape[0], img.shape[1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    inb = (u0 >= 0) & (u0 + 1 < w) & (v0 >= 0) & (v0 + 1 < h)
    u0c = jnp.clip(u0, 0, w - 2)
    v0c = jnp.clip(v0, 0, h - 2)
    fu = (u - u0c)[..., None] if img.ndim == 3 else (u - u0c)
    fv = (v - v0c)[..., None] if img.ndim == 3 else (v - v0c)
    Ia = img[v0c, u0c]
    Ib = img[v0c, u0c + 1]
    Ic = img[v0c + 1, u0c]
    Id = img[v0c + 1, u0c + 1]
    val = (
        Ia * (1 - fu) * (1 - fv)
        + Ib * fu * (1 - fv)
        + Ic * (1 - fu) * fv
        + Id * fu * fv
    )
    return val, inb


@partial(jax.jit, static_argnames=())
def _project(verts, K, T_wc):
    p = verts @ T_wc[:3, :3].T + T_wc[:3, 3]
    z = p[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = K[0, 0] * p[:, 0] / zs + K[0, 2]
    v = K[1, 1] * p[:, 1] / zs + K[1, 2]
    return u, v, z, p


@jax.jit
def _visibility(verts, K, T_wc, render_depth):
    u, v, z, _ = _project(verts, K, T_wc)
    d, inb = _sample_bilinear(render_depth, u, v)
    ok = inb & (z > 1e-6) & jnp.isfinite(d)
    return ok & (jnp.abs(d - z) < VIS_DEPTH_THRESHOLD)


@jax.jit
def _sample_intensity(verts, K, T_wc, gray, visible):
    u, v, z, _ = _project(verts, K, T_wc)
    val, inb = _sample_bilinear(gray, u, v)
    ok = visible & inb & (z > 1e-6)
    return jnp.where(ok, val, 0.0), ok


@jax.jit
def _gn_terms(verts, K, T_wc, gray, gx, gy, target_c, visible):
    """Per-frame Gauss-Newton normal equations for the photometric residual."""
    u, v, z, p = _project(verts, K, T_wc)
    val, inb = _sample_bilinear(gray, u, v)
    dIdu, _ = _sample_bilinear(gx, u, v)
    dIdv, _ = _sample_bilinear(gy, u, v)
    ok = visible & inb & (z > 1e-6)

    r = val - target_c  # residual of I(pi(Tv)) - C(v)

    zs = jnp.where(z > 1e-6, z, 1.0)
    fx, fy = K[0, 0], K[1, 1]
    du_dp = jnp.stack([fx / zs, jnp.zeros_like(zs), -fx * p[:, 0] / zs ** 2], -1)
    dv_dp = jnp.stack([jnp.zeros_like(zs), fy / zs, -fy * p[:, 1] / zs ** 2], -1)
    dI_dp = dIdu[:, None] * du_dp + dIdv[:, None] * dv_dp  # (N, 3)

    # Left perturbation on T_wc: dp/d(omega, upsilon) = [-[p]x | I].
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    zeros = jnp.zeros_like(px)
    dp_dw = jnp.stack(
        [
            jnp.stack([zeros, pz, -py], -1),
            jnp.stack([-pz, zeros, px], -1),
            jnp.stack([py, -px, zeros], -1),
        ],
        -2,
    )  # (N, 3, 3) = -[p]x
    J_w = jnp.einsum("ni,nij->nj", dI_dp, dp_dw)
    J = jnp.concatenate([J_w, dI_dp], axis=-1)  # (N, 6)
    J = jnp.where(ok[:, None], J, 0.0)
    rm = jnp.where(ok, r, 0.0)
    H = jnp.einsum("ni,nj->ij", J, J, preferred_element_type=jnp.float64)
    b = jnp.einsum("ni,n->i", J, rm, preferred_element_type=jnp.float64)
    res = jnp.sum(rm ** 2)
    return H, b, res, jnp.sum(ok)


@jax.jit
def _sample_rgb(verts, K, T_wc, rgb, visible):
    u, v, z, _ = _project(verts, K, T_wc)
    val, inb = _sample_bilinear(rgb, u, v)
    ok = visible & inb & (z > 1e-6)
    return jnp.where(ok[:, None], val, 0.0), ok


# Batched (frame-axis) variants: one launch per chunk of keyframes instead
# of one launch per frame.  With a device mesh the chunk axis shards over
# it (shard_map); results come back per-frame either way, so the host-side
# per-frame pose solves are unchanged.

_gn_terms_batch = jax.jit(
    jax.vmap(_gn_terms, in_axes=(None, 0, 0, 0, 0, 0, None, 0))
)
_sample_intensity_batch = jax.jit(
    jax.vmap(_sample_intensity, in_axes=(None, 0, 0, 0, 0))
)
_sample_rgb_batch = jax.jit(
    jax.vmap(_sample_rgb, in_axes=(None, 0, 0, 0, 0))
)


def _sharded_gn(mesh, axis="data"):
    from jax.sharding import PartitionSpec as P

    def run(verts, K, T, gray, gx, gy, target_c, vis):
        return jax.vmap(_gn_terms, in_axes=(None, 0, 0, 0, 0, 0, None, 0))(
            verts, K, T, gray, gx, gy, target_c, vis)

    return jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(),
                  P(axis)),
        out_specs=P(axis),
        check_vma=False,
    ))


def optimize_color_pose(
    vbg: TSDFVolume,
    data_io: DataIO,
    config: ColorOptimizationConfig,
    mesh_devices=None,
) -> Tuple[TriangleMesh, Dict[Side, CameraDataset]]:
    """Mirror of the reference's optimize_color_pose surface: returns the
    colored, component-filtered mesh and the pose-refined keyframe color
    datasets per side."""
    mesh = vbg.extract_triangle_mesh(
        weight_threshold=config.weight_threshold,
        estimated_vertex_number=config.estimated_vertex_number,
    )
    mesh = filter_mesh_components(mesh, min_triangle_count=config.min_triangle_count)
    verts = jnp.asarray(mesh.vertices, jnp.float32)

    # --- gather keyframes across both sides ---------------------------------
    color_dataset_map: Dict[Side, CameraDataset] = {}
    frames = []  # (side, local_idx, K, T_wc, gray, gx, gy, rgb, render_depth)
    for side in Side:
        ds = data_io.color.load_color_dataset(side=side, use_cache=config.use_dataset_cache)
        ds = ds[:: max(config.interval, 1)]
        ds.transforms = ds.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        color_dataset_map[side] = ds

        K_all = ds.get_render_intrinsic_matrices().astype(np.float32)
        T_all = ds.transforms.extrinsics_wc.astype(np.float64)
        for i in tqdm(range(len(ds)), desc=f"[{side.name}] Preparing keyframes"):
            rgb = data_io.color.load_rgb(side, int(ds.timestamps[i])).astype(np.float32) / 255.0
            gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
            gy_, gx_ = np.gradient(gray)
            depth = raycast_depth(
                vbg, K_all[i], T_all[i], int(ds.widths[i]), int(ds.heights[i])
            )
            frames.append(
                {
                    "side": side,
                    "idx": i,
                    "K": jnp.asarray(K_all[i]),
                    "T": T_all[i],
                    "gray": jnp.asarray(gray),
                    "gx": jnp.asarray(gx_.astype(np.float32)),
                    "gy": jnp.asarray(gy_.astype(np.float32)),
                    "rgb": jnp.asarray(rgb),
                    "depth": jnp.asarray(depth),
                }
            )

    if len(frames) == 0 or len(mesh.vertices) == 0:
        return mesh, color_dataset_map

    # Visibility from initial geometry (held fixed, as in the reference's
    # rigid optimizer).
    for f in frames:
        f["vis"] = _visibility(verts, f["K"], jnp.asarray(f["T"], jnp.float32), f["depth"])

    # --- alternating optimization --------------------------------------------
    # Frames batch on a chunked frame axis: one launch per chunk per GN
    # pass instead of one per frame; the chunk axis shards over a device
    # mesh when one is passed.  Chunks group by frame resolution so the
    # stacked image tensors stay rectangular.
    chunk_size = max(int(getattr(config, "gn_frames_per_launch", 32)), 1)
    by_shape: Dict[tuple, list] = {}
    for fi, f in enumerate(frames):
        by_shape.setdefault(tuple(f["gray"].shape), []).append(fi)
    chunks = []
    n_dev = 1 if mesh_devices is None else int(mesh_devices.devices.size)
    for ids in by_shape.values():
        for s0 in range(0, len(ids), chunk_size):
            chunks.append(ids[s0:s0 + chunk_size])

    def stack(ids, key, dtype=jnp.float32):
        return jnp.stack([jnp.asarray(frames[i][key], dtype) for i in ids])

    static = {  # per-chunk stacks that never change across iterations
        tuple(ids): {
            "K": stack(ids, "K"),
            "gray": stack(ids, "gray"),
            "gx": stack(ids, "gx"),
            "gy": stack(ids, "gy"),
            "vis": jnp.stack([frames[i]["vis"] for i in ids]),
        }
        for ids in map(tuple, chunks)
    }
    gn = (_gn_terms_batch if mesh_devices is None
          else _sharded_gn(mesh_devices))

    def pad_ids(ids):
        """Pad a chunk to the device multiple (repeat last frame; padded
        lanes are discarded on the host side)."""
        if n_dev == 1 or len(ids) % n_dev == 0:
            return list(ids), len(ids)
        pad = n_dev - len(ids) % n_dev
        return list(ids) + [ids[-1]] * pad, len(ids)

    def vertex_targets():
        acc = jnp.zeros(verts.shape[0], jnp.float32)
        cnt = jnp.zeros(verts.shape[0], jnp.float32)
        for ids in chunks:
            st = static[tuple(ids)]
            val, ok = _sample_intensity_batch(
                verts, st["K"], stack(ids, "T"), st["gray"], st["vis"]
            )
            acc = acc + val.sum(0)
            cnt = cnt + ok.sum(0).astype(jnp.float32)
        return acc / jnp.maximum(cnt, 1.0), cnt

    prev_res = np.inf
    for it in range(max(config.max_iteration, 1)):
        target_c, cnt = vertex_targets()
        total_res = 0.0
        for ids in chunks:
            st = static[tuple(ids)]
            ids_p, n_real = pad_ids(ids)
            if n_real == len(ids_p):
                K_c, T_c = st["K"], stack(ids, "T")
                gray_c, gx_c, gy_c, vis_c = (st["gray"], st["gx"],
                                             st["gy"], st["vis"])
            else:
                K_c = stack(ids_p, "K")
                T_c = stack(ids_p, "T")
                gray_c = stack(ids_p, "gray")
                gx_c = stack(ids_p, "gx")
                gy_c = stack(ids_p, "gy")
                vis_c = jnp.stack([frames[i]["vis"] for i in ids_p])
            Hs, bs, ress, n_oks = fetch(gn(
                verts, K_c, T_c, gray_c, gx_c, gy_c, target_c, vis_c))
            for j, fi in enumerate(ids_p[:n_real]):
                H, b, res, n_ok = Hs[j], bs[j], ress[j], n_oks[j]
                if int(n_ok) < 100:
                    continue
                try:
                    dx = np.linalg.solve(
                        H + 1e-6 * np.eye(6) * max(np.trace(H) / 6, 1e-12),
                        -b)
                except np.linalg.LinAlgError:
                    continue
                frames[fi]["T"] = np.asarray(se3.se3_exp(dx)) @ frames[fi]["T"]
                total_res += float(res)
        if it % 10 == 0:
            print(f"[ColorOpt] iter {it}: residual {total_res:.4f}")
        if it >= 10 and abs(prev_res - total_res) < 1e-4 * max(total_res, 1e-12):
            print(f"[ColorOpt] converged at iter {it}: residual {total_res:.4f}")
            break
        prev_res = total_res

    # --- bake vertex colors ----------------------------------------------------
    acc = jnp.zeros((verts.shape[0], 3), jnp.float32)
    cnt = jnp.zeros(verts.shape[0], jnp.float32)
    for ids in chunks:
        st = static[tuple(ids)]
        val, ok = _sample_rgb_batch(
            verts, st["K"], stack(ids, "T"),
            jnp.stack([frames[i]["rgb"] for i in ids]), st["vis"]
        )
        acc = acc + val.sum(0)
        cnt = cnt + ok.sum(0).astype(jnp.float32)
    colors = np.asarray(acc) / np.maximum(np.asarray(cnt), 1.0)[:, None]
    mesh.vertex_colors = colors

    # --- write refined poses back into per-side datasets -----------------------
    for side in Side:
        ds = color_dataset_map[side]
        positions = np.array(ds.transforms.positions, copy=True)
        rotations = np.array(ds.transforms.rotations, copy=True)
        for f in frames:
            if f["side"] != side:
                continue
            pose_cw = np.linalg.inv(f["T"])
            positions[f["idx"]] = pose_cw[:3, 3]
            rotations[f["idx"]] = np.asarray(quat.from_matrix(pose_cw[:3, :3]))
        ds.transforms = Transforms(CoordinateSystem.OPEN3D, positions, rotations)

    mesh = filter_mesh_components(mesh, min_triangle_count=config.min_triangle_count)
    return mesh, color_dataset_map

"""Multi-view depth-consistency confidence maps, batched on TPU.

Re-design of the reference's hottest NumPy loop (reference:
scripts/processing/reconstruction/confidence_estimation/
compute_pixel_error_map.py:4-219 and estimate_depth_confidences.py:15-154):
per reference frame, its depth is unprojected to world, reprojected into
each of +-target_frame_range neighbor frames, bilinearly compared against
the neighbor's depth, and the per-pixel 3D error is thresholded into
consistent/valid counts.

The reference fans out per-frame over a process pool and compacts pixels
with boolean indexing; here the whole (ref-frame x neighbor) pair batch is
dense H x W arithmetic + one bilinear gather per pair, vmapped over
neighbors and lax.map-ed over reference frames in one device launch per
frame block.  Invalid pixels ride along masked (NaN-free) instead of being
compacted — the TPU-shaped formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import DepthConfidenceEstimationConfig
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.models.camera import ConfidenceMap
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem


def _bilinear_depth(depth, u, v, depth_max):
    """Bilinear depth sample, valid only when all 4 taps are valid depths
    (reference compute_pixel_error_map.py:4-92). Returns (z, valid)."""
    h, w = depth.shape
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = u0 + 1
    v1 = v0 + 1
    inb = (u0 >= 0) & (u1 < w) & (v0 >= 0) & (v1 < h)
    u0c = jnp.clip(u0, 0, w - 1)
    u1c = jnp.clip(u1, 0, w - 1)
    v0c = jnp.clip(v0, 0, h - 1)
    v1c = jnp.clip(v1, 0, h - 1)
    flat = depth.reshape(-1)
    Ia = flat[v0c * w + u0c]
    Ib = flat[v0c * w + u1c]
    Ic = flat[v1c * w + u0c]
    Id = flat[v1c * w + u1c]
    taps_ok = (
        (Ia > 0) & (Ia <= depth_max) & (Ib > 0) & (Ib <= depth_max)
        & (Ic > 0) & (Ic <= depth_max) & (Id > 0) & (Id <= depth_max)
    )
    wa = (u1 - u) * (v1 - v)
    wb = (u - u0) * (v1 - v)
    wc = (u1 - u) * (v - v0)
    wd = (u - u0) * (v - v0)
    z = wa * Ia + wb * Ib + wc * Ic + wd * Id
    return z, inb & taps_ok


def _pair_error(
    ref_depth, tgt_depth, K_ref, K_tgt, T_ref_cw, T_tgt_wc, T_tgt_cw, depth_max
):
    """Per-pixel 3D error of ref depth vs one target frame.

    Returns (err (H,W) f32, valid (H,W) bool): `valid` mirrors the reference's
    non-NaN error-map entries.
    """
    h, w = ref_depth.shape
    fx_r, fy_r = K_ref[0, 0], K_ref[1, 1]
    cx_r, cy_r = K_ref[0, 2], K_ref[1, 2]
    fx_t, fy_t = K_tgt[0, 0], K_tgt[1, 1]
    cx_t, cy_t = K_tgt[0, 2], K_tgt[1, 2]

    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    z = ref_depth
    px_valid = (z > 0) & (z <= depth_max)

    # Ref pixel -> world (reference depth_to_pointcloud_numpy, :95-117).
    x = (u - cx_r) * z / fx_r
    y = (v - cy_r) * z / fy_r
    p_cam = jnp.stack([x, y, z], axis=-1)
    p_world = p_cam @ T_ref_cw[:3, :3].T + T_ref_cw[:3, 3]

    # World -> target camera.
    p_tgt = p_world @ T_tgt_wc[:3, :3].T + T_tgt_wc[:3, 3]
    zt = p_tgt[..., 2]
    proj_ok = px_valid & (zt > 0) & (zt <= depth_max)
    zt_safe = jnp.where(zt > 0, zt, 1.0)
    ut = p_tgt[..., 0] * fx_t / zt_safe + cx_t
    vt = p_tgt[..., 1] * fy_t / zt_safe + cy_t

    z_tgt, samp_ok = _bilinear_depth(tgt_depth, ut, vt, depth_max)
    samp_ok &= z_tgt > 0

    # Back-project the sampled target depth to world and compare.
    xt = (ut - cx_t) * z_tgt / fx_t
    yt = (vt - cy_t) * z_tgt / fy_t
    q_cam = jnp.stack([xt, yt, z_tgt], axis=-1)
    q_world = q_cam @ T_tgt_cw[:3, :3].T + T_tgt_cw[:3, 3]

    err = jnp.linalg.norm(p_world - q_world, axis=-1)
    return err, proj_ok & samp_ok


@partial(jax.jit, static_argnames=("depth_max", "error_threshold", "window"))
def confidence_for_refs(
    depth_stack,  # (N, H, W) float32 — the whole (sub)sequence
    K,  # (N, 3, 3) float32
    T_cw,  # (N, 4, 4) float32
    T_wc,  # (N, 4, 4) float32
    frame_valid,  # (N,) bool
    ref_indices,  # (B,) int32 — which frames to produce maps for
    depth_max: float,
    error_threshold: float,
    window: int,
):
    """Confidence maps for a block of reference frames in one launch.

    For each ref frame: counts over neighbors in [ref-window, ref+window]
    excluding self (reference estimate_depth_confidences.py:35-79).
    Returns (confidence (B,H,W) f32, valid_count (B,H,W) i32).
    """
    n = depth_stack.shape[0]
    offsets = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    ).astype(jnp.int32)

    def one_ref(ref_i):
        ref_depth = depth_stack[ref_i]

        def one_neighbor(off):
            tgt_i = ref_i + off
            in_range = (tgt_i >= 0) & (tgt_i < n)
            tgt_c = jnp.clip(tgt_i, 0, n - 1)
            err, ok = _pair_error(
                ref_depth,
                depth_stack[tgt_c],
                K[ref_i],
                K[tgt_c],
                T_cw[ref_i],
                T_wc[tgt_c],
                T_cw[tgt_c],
                depth_max,
            )
            ok &= in_range & frame_valid[tgt_c] & frame_valid[ref_i]
            consistent = ok & (err <= error_threshold)
            return ok.astype(jnp.int32), consistent.astype(jnp.int32)

        valid_c, cons_c = jax.vmap(one_neighbor)(offsets)
        valid_count = jnp.sum(valid_c, axis=0)
        consistent = jnp.sum(cons_c, axis=0)
        conf = jnp.where(
            valid_count > 0, consistent / jnp.maximum(valid_count, 1), 0.0
        ).astype(jnp.float32)
        return conf, valid_count

    return jax.lax.map(one_ref, ref_indices)


def estimate_depth_confidences(
    depth_data_io: DepthDataIO,
    config: DepthConfidenceEstimationConfig,
):
    """Full-stage driver: both sides, skip-if-cached per frame, npz outputs
    identical to the reference's (confidence_map, valid_count)."""
    for side in Side:
        if config.skip_if_output_dir_exists and depth_data_io.exists_depth_confidence_map_dir(side):
            print(
                f"[{side.name}] Skipping confidence estimation: output dir exists."
            )
            continue

        dataset = depth_data_io.load_depth_dataset(side=side)
        n = len(dataset)
        if n == 0:
            continue

        K = dataset.get_render_intrinsic_matrices().astype(np.float32)
        transforms = dataset.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        T_cw = transforms.extrinsics_cw.astype(np.float32)
        T_wc = np.linalg.inv(T_cw)

        # Frames still needing maps.
        todo = [
            i
            for i in range(n)
            if depth_data_io.load_confidence_map(side, int(dataset.timestamps[i])) is None
        ]
        if not todo:
            # Per-frame maps already exist; integrate's batched reader
            # falls back to them (a from-disk pack rebuild costs more than
            # it saves — depth_io.load_confidence_stack).
            print(f"[{side.name}] All confidence maps cached.")
            continue

        depth_stack, frame_valid = depth_data_io.load_depth_stack(side, dataset)

        # Stage the whole sequence in HBM once; batches only ship indices.
        depth_dev = jnp.asarray(depth_stack)
        K_dev = jnp.asarray(K)
        T_cw_dev = jnp.asarray(T_cw)
        T_wc_dev = jnp.asarray(T_wc)
        valid_dev = jnp.asarray(frame_valid)

        # Stream the packed mmap-able stack for the integrate hot path
        # (recon/integrate.py slices chunks out of it instead of opening one
        # npz per frame per chunk) directly from the in-memory results —
        # only when EVERY frame is computed fresh, so the pack is complete.
        writer = None
        pack_row = None
        if len(todo) == n and frame_valid.any():
            # Pack rows only for frames that will actually produce a map:
            # an invalid frame must stay have=False at read time (integrate
            # then warns like the per-frame path), not a zero row.
            h, w = depth_stack.shape[1:]
            ts_valid = np.asarray(dataset.timestamps, np.int64)[frame_valid]
            pack_row = np.cumsum(frame_valid) - 1  # frame idx -> pack row
            writer = depth_data_io.start_confidence_pack(
                side, ts_valid, (h, w), np.float32, (h, w), np.int32,
            )

        B = max(1, int(config.frames_per_batch))
        for s in tqdm(
            range(0, len(todo), B),
            desc=f"[{side.name}] Estimating depth confidence maps",
        ):
            batch = todo[s : s + B]
            refs = np.asarray(batch + [batch[-1]] * (B - len(batch)), np.int32)
            conf, cnt = confidence_for_refs(
                depth_dev,
                K_dev,
                T_cw_dev,
                T_wc_dev,
                valid_dev,
                jnp.asarray(refs),
                depth_max=float(config.depth_max),
                error_threshold=float(config.error_threshold),
                window=int(config.target_frame_range),
            )
            conf = np.asarray(conf)
            cnt = np.asarray(cnt)
            for bi, i in enumerate(batch):
                if not frame_valid[i]:
                    continue
                depth_data_io.save_confidence_map(
                    side,
                    int(dataset.timestamps[i]),
                    ConfidenceMap(confidence_map=conf[bi], valid_count=cnt[bi]),
                )
                if writer is not None:
                    writer.write(
                        int(pack_row[i]), conf[bi], cnt[bi].astype(np.int32))
        if writer is not None:
            # Publish AFTER the per-frame saves (each save invalidates the
            # pack paths; finalize's os.replace runs last).
            writer.finalize()

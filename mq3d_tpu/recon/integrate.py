"""TSDF integration driver: dataset -> volume, chunked device launches.

Replaces the reference's per-frame Python loop around vbg.integrate
(reference: scripts/processing/reconstruction/utils/o3d_utils.py:153-238)
with host-side batched loading + chunk-fused device integration.
Confidence-based depth filtering (zeroing pixels below confidence/count
thresholds, reference o3d_utils.py:109-150) is applied on the stacked
arrays before upload.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import IntegrationConfig
from mq3d_tpu.utils.host import fetch_int
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.models.datasets import DepthDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume


def load_filtered_depth_stack(
    depth_data_io: DepthDataIO,
    side: Side,
    dataset: DepthDataset,
    indices: np.ndarray,
    use_confidence_filtered_depth: bool,
    confidence_threshold: float,
    valid_count_threshold: int,
):
    """(N, H, W) linear depth stack with confidence filtering applied."""
    stack, valid = depth_data_io.load_depth_stack(side, dataset, indices)
    if use_confidence_filtered_depth:
        for out_i, i in enumerate(indices):
            if not valid[out_i]:
                continue
            cm = depth_data_io.load_confidence_map(
                side, int(dataset.timestamps[int(i)])
            )
            if cm is None:
                print(
                    f"[Warning] Confidence map not found for timestamp "
                    f"{dataset.timestamps[int(i)]}"
                )
                continue
            frame = stack[out_i]
            frame[cm.confidence_map < confidence_threshold] = 0.0
            frame[cm.valid_count < valid_count_threshold] = 0.0
    return stack, valid


def tsdf_config_from_integration(config: IntegrationConfig) -> TSDFConfig:
    """Duck-typed: also accepts FragmentPoseRefinementConfig (same fields).
    TPU-only knobs fall back to TSDFConfig defaults when absent."""
    return TSDFConfig(
        voxel_size=config.voxel_size,
        block_resolution=config.block_resolution,
        block_count=config.block_count,
        depth_max=config.depth_max,
        trunc_voxel_multiplier=config.trunc_voxel_multiplier,
        alloc_pixel_stride=int(getattr(config, "alloc_pixel_stride", 2)),
        grid_dim=int(getattr(config, "grid_dim", 160)),
        chunk_active_capacity=int(getattr(config, "chunk_active_capacity", 12_288)),
        integrate_tile=int(getattr(config, "integrate_tile", 512)),
    )


def integrate(
    dataset: DepthDataset,
    depth_data_io: DepthDataIO,
    side: Side,
    config: IntegrationConfig,
    vbg_opt: Optional[TSDFVolume] = None,
    show_progress: bool = False,
    desc: Optional[str] = None,
) -> TSDFVolume:
    """Integrate every frame of `dataset` into a (possibly shared) volume.

    Mirrors the reference integrate() surface (o3d_utils.py:153-238): both
    stereo sides accumulate into the same volume when `vbg_opt` is passed.
    Dataset transforms must already be in the OPEN3D camera frame.
    """
    vol = vbg_opt if vbg_opt is not None else TSDFVolume(
        tsdf_config_from_integration(config)
    )

    n = len(dataset)
    if n == 0:
        return vol

    K = dataset.get_render_intrinsic_matrices().astype(np.float32)
    T_wc = dataset.transforms.extrinsics_wc.astype(np.float32)

    chunk = max(1, int(getattr(config, "frames_per_batch", 16)))
    starts = range(0, n, chunk)
    iterator = tqdm(starts, desc=desc, disable=not show_progress)
    for s in iterator:
        idx = np.arange(s, min(s + chunk, n))
        stack, valid = load_filtered_depth_stack(
            depth_data_io,
            side,
            dataset,
            idx,
            config.use_confidence_filtered_depth,
            config.confidence_threshold,
            config.valid_count_threshold,
        )
        if not valid.any():
            continue
        # Pad the tail chunk to the static chunk size to avoid recompiles.
        if len(idx) < chunk:
            pad = chunk - len(idx)
            stack = np.concatenate([stack, np.zeros((pad,) + stack.shape[1:], np.float32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
            Kc = np.concatenate([K[idx], np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
            Tc = np.concatenate([T_wc[idx], np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
        else:
            Kc, Tc = K[idx], T_wc[idx]
        vol.integrate(stack, Kc, Tc, valid)
        # Sync each chunk: long async donation chains intermittently degrade
        # on tunneled TPU runtimes (final waits can take ~50x the compute);
        # a per-chunk barrier costs one RTT and keeps the queue shallow.
        import jax

        jax.block_until_ready(vol.state.tsdf)

    overflow = fetch_int(vol.state.overflow)
    if overflow > 0:
        print(
            f"[Warning] TSDF block capacity exceeded: {overflow} "
            f"allocations dropped (block_count={vol.cfg.block_count})"
        )
    dropped = fetch_int(vol.state.dropped_active)
    if dropped > 0:
        print(
            f"[Warning] TSDF chunk active-block capacity exceeded: {dropped} "
            f"block-chunk integrations skipped (chunk_active_capacity="
            f"{vol.cfg.chunk_active_capacity}; raise it or reduce the chunk "
            f"size — depth observations were dropped)"
        )
    return vol

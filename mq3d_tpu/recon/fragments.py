"""Fragment generation: intra-fragment pose graphs from depth odometry.

Re-design of the reference's make_fragments stage (reference:
scripts/processing/reconstruction/depth_optimization/make_fragments.py:14-308):
the depth sequence is split into fragments of `fragment_size`; within each
fragment, sequential odometry edges (with device-computed information
matrices) plus keyframe loop-closure edges gated by a frustum-AABB-overlap
test and a yaw-information density threshold feed a Levenberg-Marquardt
pose graph.

The reference fans fragments out over a multiprocessing pool; here the
per-fragment depth stack loads once, the odometry information matrices for
all edges of a fragment are computed on device, and fragments iterate
sequentially (on multi-chip deployments fragments shard across devices —
see parallel/).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import FragmentGenerationConfig
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.models.datasets import DepthDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem
from mq3d_tpu.ops.posegraph import (
    GlobalOptimizationOption,
    PoseGraphEdge,
    global_optimization,
)
from mq3d_tpu.recon.graph_utils import (
    convert_pose_graph_to_transforms,
    convert_transforms_to_pose_graph,
)
from mq3d_tpu.recon.integrate import load_filtered_depth_stack

import jax.numpy as jnp


def frustum_overlap_filter(
    extrinsic_cw_1: np.ndarray,
    extrinsic_cw_2: np.ndarray,
    intrinsic_1: np.ndarray,
    intrinsic_2: np.ndarray,
    image_size_1,
    image_size_2,
    z_near: float = 0.1,
    z_far: float = 3.0,
    overlap_ratio_threshold: float = 0.05,
) -> bool:
    """Frustum AABB-overlap gate for loop-closure candidates
    (reference make_fragments.py:14-81)."""

    def frustum_points(cw, K, size):
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        w, h = size
        uv = np.array([(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1), (w // 2, h // 2)])
        rays = np.stack(
            [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy, np.ones(len(uv))], -1
        )
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        pts = []
        for d in (z_near, z_far):
            pts.append(rays * d @ cw[:3, :3].T + cw[:3, 3])
        return np.concatenate(pts)

    p1 = frustum_points(extrinsic_cw_1, intrinsic_1, image_size_1)
    p2 = frustum_points(extrinsic_cw_2, intrinsic_2, image_size_2)
    min1, max1 = p1.min(0), p1.max(0)
    min2, max2 = p2.min(0), p2.max(0)
    overlap = np.maximum(np.minimum(max1, max2) - np.maximum(min1, min2), 0.0)
    inter = np.prod(overlap)
    if inter == 0.0:
        return False
    v1 = np.prod(np.maximum(max1 - min1, 0.0))
    v2 = np.prod(np.maximum(max2 - min2, 0.0))
    return inter / min(v1, v2) > overlap_ratio_threshold


def build_pose_graph_for_fragment(
    frag_dataset: DepthDataset,
    depth_stack: np.ndarray,
    frame_valid: np.ndarray,
    config: FragmentGenerationConfig,
):
    """Odometry chain + gated keyframe loop closures
    (reference make_fragments.py:84-242).  Depth stack must already be
    confidence-filtered; transforms must be in the OPEN3D camera frame."""
    n = len(frag_dataset)
    K = frag_dataset.get_render_intrinsic_matrices().astype(np.float32)
    intrinsic = K[0]
    transforms = frag_dataset.transforms
    extrinsics_wc = transforms.extrinsics_wc.astype(np.float64)
    extrinsics_cw = transforms.extrinsics_cw.astype(np.float64)

    pose_graph = convert_transforms_to_pose_graph(transforms)

    # Gather all edge candidates first, then compute every information
    # matrix of the fragment in ONE device launch (vmap over edges against
    # the shared frame stack) instead of ~n sequential launches.
    odo_pairs = [
        (i, i + 1)
        for i in range(n - 1)
        if frame_valid[i] and frame_valid[i + 1]
    ]

    key_indices = list(range(0, n, max(config.odometry_loop_interval, 1)))
    loop_pairs = []
    for a_pos, key_i in enumerate(key_indices):
        if not frame_valid[key_i]:
            continue
        # Reference quirk preserved: image size indexed by keyframe-list
        # position (make_fragments.py:171-172).
        width = int(frag_dataset.widths[a_pos]) if a_pos < n else int(frag_dataset.widths[0])
        height = int(frag_dataset.heights[a_pos]) if a_pos < n else int(frag_dataset.heights[0])
        for key_j in key_indices[a_pos + 1 :]:
            if not frame_valid[key_j]:
                continue
            if frustum_overlap_filter(
                extrinsics_cw[key_i], extrinsics_cw[key_j],
                intrinsic, intrinsic,
                (width, height), (width, height),
                z_near=0.1, z_far=config.depth_max,
                overlap_ratio_threshold=config.overlap_ratio_threshold,
            ):
                loop_pairs.append((key_i, key_j, width, height))

    all_pairs = odo_pairs + [(i, j) for i, j, _, _ in loop_pairs]
    if not all_pairs:
        return pose_graph

    pairs_arr = np.asarray(all_pairs, np.int32)
    rel = extrinsics_wc[pairs_arr[:, 1]] @ extrinsics_cw[pairs_arr[:, 0]]  # f64

    # Pad the edge batch to a power-of-two bucket so fragments of slightly
    # different edge counts share one compiled executable.
    e = len(all_pairs)
    e_pad = 16
    while e_pad < e:
        e_pad *= 2
    pairs_p = np.concatenate([pairs_arr, np.zeros((e_pad - e, 2), np.int32)])
    rel_p = np.concatenate(
        [rel.astype(np.float32), np.tile(np.eye(4, dtype=np.float32), (e_pad - e, 1, 1))]
    )

    from mq3d_tpu.ops.odometry import odometry_information_matrix_batch

    infos, _ = odometry_information_matrix_batch(
        jnp.asarray(depth_stack),
        jnp.asarray(intrinsic.astype(np.float32)),
        jnp.asarray(pairs_p),
        jnp.asarray(rel_p),
        dist_threshold=float(config.dist_threshold),
        depth_max=float(config.depth_max),
    )
    infos = np.asarray(infos)[:e]

    for e, (i, j) in enumerate(odo_pairs):
        pose_graph.edges.append(
            PoseGraphEdge(
                source_node_id=i,
                target_node_id=j,
                transformation=rel[e],
                information=infos[e],
                uncertain=False,
            )
        )
    for k, (key_i, key_j, width, height) in enumerate(loop_pairs):
        e = len(odo_pairs) + k
        info = infos[e]
        if info[5, 5] / (width * height) > config.loop_yaw_info_density_threshold:
            pose_graph.edges.append(
                PoseGraphEdge(
                    source_node_id=key_i,
                    target_node_id=key_j,
                    transformation=rel[e],
                    information=info,
                    uncertain=True,
                )
            )

    return pose_graph


def optimize_dataset_pose(
    frag_dataset: DepthDataset,
    depth_stack: np.ndarray,
    frame_valid: np.ndarray,
    config: FragmentGenerationConfig,
):
    """Build + optimize one fragment's pose graph, writing refined transforms
    back into the dataset (reference make_fragments.py:245-271)."""
    pose_graph = build_pose_graph_for_fragment(frag_dataset, depth_stack, frame_valid, config)
    option = GlobalOptimizationOption(
        max_correspondence_distance=config.dist_threshold,
        edge_prune_threshold=config.edge_prune_threshold,
        reference_node=0,
    )
    global_optimization(pose_graph, option)
    frag_dataset.transforms = convert_pose_graph_to_transforms(pose_graph)


def make_fragment_datasets(
    depth_data_io: DepthDataIO,
    config: FragmentGenerationConfig,
) -> Dict[Side, List[DepthDataset]]:
    """Split each side into fragments and optimize each fragment's poses
    (reference make_fragments.py:274-308)."""
    fragment_dataset_map: Dict[Side, List[DepthDataset]] = {}

    for side in Side:
        depth_dataset = depth_data_io.load_depth_dataset(
            side=side, use_cache=config.use_dataset_cache
        )
        depth_dataset.transforms = depth_dataset.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        frag_datasets = depth_dataset.split(fragment_size=config.fragment_size)
        fragment_dataset_map[side] = frag_datasets

        offset = 0
        for frag in tqdm(
            frag_datasets, desc=f"[{side.name}] Optimizing fragment poses"
        ):
            indices = np.arange(offset, offset + len(frag))
            offset += len(frag)
            stack, valid = load_filtered_depth_stack(
                depth_data_io, side, depth_dataset, indices,
                config.use_confidence_filtered_depth,
                config.confidence_threshold,
                config.valid_count_threshold,
            )
            optimize_dataset_pose(frag, stack, valid, config)

    return fragment_dataset_map

"""Scene reconstruction orchestrator: steps 0-6 with config gates + caches.

Re-design of the reference's reconstruct_scene (reference:
scripts/processing/reconstruction/reconstruct_scene.py:19-226).  Same stage
sequence and artifact outputs; device-side compute replaces Open3D:

  0. dataset generation (depth + color frame tables)
  1. depth confidence estimation (batched reprojection)
  2. depth pose optimization (fragments + scene pose graph)
  3. TSDF integration (chunk-fused, both sides into one volume)
  4. color map optimization (photometric GN + baking)
  5. point sampling from the colored mesh
  6. color-aligned depth rendering (TSDF raycast)

Interactive visualization gates are accepted but headless here (artifacts
are written instead; use an external viewer on the saved PLYs).
"""

from __future__ import annotations

from typing import Dict, Optional

from tqdm import tqdm

from mq3d_tpu.config.configs import ReconstructionConfig
from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.dataio.ply import PointCloud
from mq3d_tpu.models.datasets import CameraDataset, DepthDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem
from mq3d_tpu.ops.mesh_filter import filter_mesh_components
from mq3d_tpu.ops.sampling import sample_points_uniformly
from mq3d_tpu.ops.raycast import raycast_in_color_view
from mq3d_tpu.ops.tsdf import TSDFVolume
from mq3d_tpu.recon.color_opt import optimize_color_pose
from mq3d_tpu.recon.confidence import estimate_depth_confidences
from mq3d_tpu.recon.depth_pose_optimizer import DepthPoseOptimizer
from mq3d_tpu.recon.integrate import (
    integrate,
    integrate_extract_small,
    integrate_multi,
)
from mq3d_tpu.utils.log import log_step, substep

# Viewer-time accounting (reference protocol: reconstruct_scene prints
# "[VIS] {COLORLESS,COLORED}_VIEW_SECONDS: <t>" lines that
# run_full_pipeline.py:96,278 parses and subtracts from the adjusted
# runtime).  Headless builds spend (near-)zero time here but emit the same
# markers so subprocess drivers and runtime summaries stay byte-compatible;
# LAST_VIEW_SECONDS carries the total for in-process callers.
LAST_VIEW_SECONDS = 0.0


def _emit_view_seconds(tag: str, seconds: float) -> None:
    global LAST_VIEW_SECONDS
    LAST_VIEW_SECONDS += seconds
    print(f"[VIS] {tag}_VIEW_SECONDS: {seconds:.3f}")


def reconstruct_scene(data_io: DataIO, config: ReconstructionConfig):
    global LAST_VIEW_SECONDS
    LAST_VIEW_SECONDS = 0.0
    # Step 0: dataset generation
    if not config.use_dataset_cache:
        for side in Side:
            with substep(f"build_depth_dataset[{side.name}]"):
                data_io.depth.load_depth_dataset(side=side, use_cache=False)
            with substep(f"build_color_dataset[{side.name}]"):
                data_io.color.load_color_dataset(side=side, use_cache=False)

    # Step 1: depth confidence estimation
    if config.estimate_depth_confidences:
        log_step("Estimate depth confidences")
        with substep("estimate_depth_confidences"):
            estimate_depth_confidences(
                depth_data_io=data_io.depth, config=config.confidence_estimation
            )

    # Step 2: depth pose optimization
    if config.optimize_depth_pose:
        optimizer = DepthPoseOptimizer(
            depth_data_io=data_io.depth,
            recon_data_io=data_io.reconstruction,
            config=config,
        )
        with substep("depth_pose_optimizer"):
            depth_dataset_map = optimizer()
    else:
        depth_dataset_map: Dict[Side, DepthDataset] = {}
        for side in Side:
            ds = data_io.depth.load_depth_dataset(
                side=side, use_cache=config.fragment_generation.use_dataset_cache
            )
            ds.transforms = ds.transforms.convert_coordinate_system(
                CoordinateSystem.OPEN3D, is_camera=True
            )
            depth_dataset_map[side] = ds

    # Step 3: TSDF integration
    vbg: Optional[TSDFVolume] = None
    if config.use_colorless_vbg_cache:
        vbg = data_io.reconstruction.load_colorless_vbg()

    fused_pcd = None
    if vbg is None:
        log_step("Integrate depth maps")
        ic = config.depth_integration
        # One fused chunk stream over both sides (same accumulation as the
        # reference's sequential per-side loop; fewer device launches).
        # Captures that fit a single chunk take the one-launch fused
        # init+integrate+extract program instead.
        with substep("integrate"):
            fused = integrate_extract_small(
                dataset_map=depth_dataset_map,
                depth_data_io=data_io.depth,
                config=ic,
            )
            if fused is not None:
                vbg, fused_pcd = fused
            else:
                vbg = integrate_multi(
                    dataset_map=depth_dataset_map,
                    depth_data_io=data_io.depth,
                    config=ic,
                    vbg_opt=vbg,
                    show_progress=True,
                    desc="Integrating depth maps (both sides)",
                )

    if vbg is None or vbg.n_active == 0:
        print("[Error] Failed to generate TSDF volume; check inputs/config.")
        return

    with substep("save_colorless_vbg"):
        data_io.reconstruction.save_colorless_vbg(vbg)

    with substep("extract_point_cloud"):
        colorless_pcd = (
            fused_pcd if fused_pcd is not None else vbg.extract_point_cloud()
        )
    with substep("save_colorless_pcd"):
        data_io.reconstruction.save_colorless_pcd(colorless_pcd)
    if config.visualize_colorless_pcd:
        import time as _time

        _t0 = _time.perf_counter()
        print(
            "[Info] Headless build: colorless point cloud saved to "
            f"{data_io.path_config.reconstruction.get_colorless_pcd_path()}"
        )
        _emit_view_seconds("COLORLESS", _time.perf_counter() - _t0)

    # Step 4: color map optimization
    optimized_color_dataset_map: Optional[Dict[Side, CameraDataset]] = None
    if config.optimize_color_pose:
        log_step("Extract and save colorless mesh")
        with substep("extract_triangle_mesh"):
            colorless_mesh = vbg.extract_triangle_mesh(
                weight_threshold=config.color_optimization.weight_threshold,
                estimated_vertex_number=config.color_optimization.estimated_vertex_number,
            )
        with substep("save_colorless_mesh_raw"):
            data_io.reconstruction.save_colorless_mesh_raw(colorless_mesh)
        with substep("filter_mesh_components"):
            colorless_mesh = filter_mesh_components(
                colorless_mesh,
                min_triangle_count=config.color_optimization.min_triangle_count,
            )
        if config.visualize_colorless_pcd and len(colorless_mesh.vertices):
            # Height-colored debug coloring (reference reconstruct_scene.py:
            # 125-146 shows this in a viewer; headless builds persist it in
            # the cleaned-mesh artifact).
            import numpy as _np

            z = colorless_mesh.vertices[:, 2]
            z_min, z_max = float(z.min()), float(z.max())
            denom = (z_max - z_min) if z_max > z_min else 1.0
            zn = (z - z_min) / denom
            colorless_mesh.vertex_colors = _np.clip(
                _np.stack([zn, 1.0 - _np.abs(zn - 0.5) * 2.0, 1.0 - zn], axis=-1),
                0.0, 1.0,
            )
        data_io.reconstruction.save_colorless_mesh_clean(colorless_mesh)

        log_step("Optimize color maps")
        with substep("optimize_color_pose"):
            colored_mesh, optimized_color_dataset_map = optimize_color_pose(
                vbg=vbg, data_io=data_io, config=config.color_optimization
            )
        with substep("save_colored_mesh"):
            data_io.reconstruction.save_colored_mesh(colored_mesh)
        if config.visualize_colored_mesh:
            import time as _time

            _t0 = _time.perf_counter()
            print(
                "[Info] Headless build: colored mesh saved to "
                f"{data_io.path_config.reconstruction.get_colored_mesh_path()}"
            )
            _emit_view_seconds("COLORED", _time.perf_counter() - _t0)
        for side, ds in optimized_color_dataset_map.items():
            data_io.color.save_optimized_color_dataset(dataset=ds, side=side)

        # Step 5: point sampling
        if config.sample_point_cloud_from_colored_mesh:
            n_points = int(len(colored_mesh.vertices) * config.points_per_vertex_ratio)
            pcd = sample_points_uniformly(colored_mesh, n_points)
            data_io.reconstruction.save_colored_pcd(pcd)

    # Step 6: color-aligned depth rendering
    if config.render_color_aligned_depth:
        log_step("Render color-aligned depth")

        def render(dataset: CameraDataset, side: Side, desc: str):
            it = raycast_in_color_view(
                volume=vbg, dataset=dataset,
                frames_per_batch=config.color_aligned_depth_rendering
                .frames_per_batch,
                transfer_u16=bool(getattr(
                    config.color_aligned_depth_rendering,
                    "transfer_u16", False)))
            for i in tqdm(range(len(dataset)), desc=desc):
                depth_map = next(it)
                data_io.rgbd.save_color_aligned_depth(
                    depth_map=depth_map, side=side, timestamp=int(dataset.timestamps[i])
                )

        for side in Side:
            color_dataset = data_io.color.load_color_dataset(side=side, use_cache=True)
            if optimized_color_dataset_map is not None:
                optimized = optimized_color_dataset_map[side]
                if not config.color_aligned_depth_rendering.only_use_optimized_dataset:
                    opt_ts = set(int(t) for t in optimized.timestamps)
                    rest = color_dataset[
                        [
                            i
                            for i in range(len(color_dataset))
                            if int(color_dataset.timestamps[i]) not in opt_ts
                        ]
                    ]
                    rest.transforms = rest.transforms.convert_coordinate_system(
                        CoordinateSystem.OPEN3D, is_camera=True
                    )
                    render(rest, side, f"[{side.name}] Rendering color-aligned depth")
                render(optimized, side, f"[{side.name}] Rendering optimized-view depth")
            elif not config.color_aligned_depth_rendering.only_use_optimized_dataset:
                ds = color_dataset
                ds.transforms = ds.transforms.convert_coordinate_system(
                    CoordinateSystem.OPEN3D, is_camera=True
                )
                render(ds, side, f"[{side.name}] Rendering color-aligned depth")

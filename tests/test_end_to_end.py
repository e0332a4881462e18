"""End-to-end pipeline test on the synthetic box capture.

Runs the complete flow — YUV->RGB, depth->linear, confidence, fragment pose
optimization, scene refinement, TSDF, color optimization, exports,
color-aligned depth — and checks the reconstruction against the analytic
room geometry.
"""

import textwrap

import numpy as np
import pytest

from mq3d_tpu.dataio.ply import read_ply
from mq3d_tpu.models.side import Side
from mq3d_tpu.pipeline.processor import PipelineProcessor
from mq3d_tpu.testing.synthetic import SyntheticSceneConfig, write_synthetic_project

TEST_CONFIG = textwrap.dedent(
    """
    yuv_to_rgb:
      blur_filter: False
      blur_threshold: 50.0
      exposure_filter: False
      exposure_threshold_low: 0.05
      exposure_threshold_high: 0.05

    depth_to_linear:
      clip_near_m: 0.1
      clip_far_m: 5.0
      use_cache: True

    reconstruction:
      device: "cpu"
      use_dataset_cache: false
      estimate_depth_confidences: true
      optimize_depth_pose: true
      use_fragment_dataset_cache: false
      use_optimized_dataset_cache: false
      use_colorless_vbg_cache: false
      visualize_colorless_pcd: false
      optimize_color_pose: true
      visualize_colored_mesh: false
      sample_point_cloud_from_colored_mesh: true
      points_per_vertex_ratio: 0.5
      render_color_aligned_depth: true

      confidence_estimation:
        target_frame_range: 3
        depth_max: 4.0
        error_threshold: 0.08
        skip_if_output_dir_exists: false
        frames_per_batch: 4

      fragment_generation:
        fragment_size: 6
        use_confidence_filtered_depth: true
        confidence_threshold: 0.02
        valid_count_threshold: 2
        depth_max: 4.0
        odometry_loop_interval: 3
        overlap_ratio_threshold: 0.1
        loop_yaw_info_density_threshold: 0.3
        dist_threshold: 0.07
        edge_prune_threshold: 0.25

      fragment_pose_refinement:
        use_confidence_filtered_depth: true
        confidence_threshold: 0.02
        valid_count_threshold: 2
        voxel_size: 0.05
        block_resolution: 16
        block_count: 2048
        depth_max: 4.0
        trunc_voxel_multiplier: 4.0
        use_pre_filtering: false
        icp_voxel_sizes: [0.1, 0.05]
        max_corr_dists: [0.2, 0.1]
        max_iterations: [20, 10]
        relative_fitnesses: [1e-6, 1e-6]
        relative_rmses: [1e-6, 1e-6]
        icp_fitness_threshold: 0.2
        icp_inlier_rmse_threshold: 0.05
        dist_threshold: 0.07
        edge_prune_threshold: 0.25
        grid_dim: 16
        chunk_active_capacity: 2048
        integrate_tile: 256

      depth_integration:
        use_confidence_filtered_depth: true
        confidence_threshold: 0.02
        valid_count_threshold: 2
        voxel_size: 0.05
        block_resolution: 16
        block_count: 2048
        depth_max: 4.0
        trunc_voxel_multiplier: 4.0
        frames_per_batch: 6
        grid_dim: 16
        chunk_active_capacity: 2048
        integrate_tile: 256

      color_optimization:
        weight_threshold: 1.5
        estimated_vertex_number: -1
        interval: 4
        max_iteration: 6
        use_dataset_cache: false
        min_triangle_count: 100

      color_aligned_depth_rendering:
        only_use_optimized_dataset: true
    """
)

BOX_MIN = np.array([-2.0, -1.2, -2.0])
BOX_MAX = np.array([2.0, 1.2, 2.0])


def wall_distance(points):
    d_min = points - BOX_MIN
    d_max = BOX_MAX - points
    return np.minimum(d_min, d_max).min(axis=-1)


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    proj = root / "capture"
    # Dense sweep so 6-frame fragments observe shared geometry >= 4 times
    # (extract_point_cloud needs weight > 3, matching Open3D defaults).
    write_synthetic_project(proj, SyntheticSceneConfig(n_frames=12, sweep=1.2))
    cfg_path = root / "config.yml"
    cfg_path.write_text(TEST_CONFIG)
    processor = PipelineProcessor(project_dir=proj, config_yml_path=cfg_path)
    processor.run_full_pipeline()
    return proj, processor


class TestEndToEnd:
    def test_rgb_written(self, full_run):
        proj, _ = full_run
        pngs = list((proj / "left_camera_rgb").glob("*.png"))
        assert len(pngs) == 12
        # raw YUV cleaned up after successful conversion
        assert not (proj / "left_camera_raw").exists()

    def test_linear_depth_written(self, full_run):
        proj, _ = full_run
        assert len(list((proj / "left_depth_linear").glob("*.png"))) == 12

    def test_confidence_maps_written(self, full_run):
        proj, _ = full_run
        assert len(list((proj / "left_depth_confidence").glob("*.npz"))) == 12

    def test_caches_written(self, full_run):
        proj, _ = full_run
        assert (proj / "dataset/left_depth_dataset.npz").exists()
        assert (proj / "dataset/left_depth_dataset_optimized.npz").exists()
        assert (proj / "dataset/left_camera_dataset_optimized.npz").exists()
        assert (proj / "cache/dataset").is_dir()
        assert (proj / "cache/pcd").is_dir()
        assert (proj / "reconstruction/colorless_vbg.npz").exists()

    def test_colorless_geometry_accuracy(self, full_run):
        proj, _ = full_run
        pcd = read_ply(proj / "reconstruction/colorless.ply")
        assert len(pcd.points) > 500
        d = np.abs(wall_distance(pcd.points))
        assert np.quantile(d, 0.9) < 0.08  # < ~1.5 voxels at 5 cm

    def test_colored_mesh_written_with_colors(self, full_run):
        proj, _ = full_run
        mesh = read_ply(proj / "reconstruction/color_mesh.ply")
        assert len(mesh.vertices) > 200
        assert mesh.vertex_colors is not None
        # Colors follow the position-gradient wall texture: correlation
        # between red channel and x-position must be strongly positive.
        x = mesh.vertices[:, 0]
        r = mesh.vertex_colors[:, 0]
        # Vertices outside all keyframe frustums bake to black — evaluate
        # color fidelity only where color was observed.
        colored = mesh.vertex_colors.sum(axis=1) > 0.02
        mask = (np.abs(wall_distance(mesh.vertices)) < 0.1) & colored
        assert mask.sum() > 100
        cc = np.corrcoef(x[mask], r[mask])[0, 1]
        assert cc > 0.7

    def test_colored_pcd_sampled(self, full_run):
        proj, _ = full_run
        pcd = read_ply(proj / "reconstruction/color.ply")
        assert len(pcd.points) > 50
        assert pcd.colors is not None

    def test_color_aligned_depth_rendered(self, full_run):
        proj, _ = full_run
        npys = list((proj / "left_color_aligned_depth").glob("*.npy"))
        assert len(npys) >= 3  # keyframes (interval=4 over 12 frames)
        d = np.load(npys[0])
        assert d.shape == (72, 96)
        finite = np.isfinite(d)
        assert finite.mean() > 0.5
        assert d[finite].min() > 0.1

    def test_rerun_uses_caches(self, full_run, capsys):
        proj, processor = full_run
        # Second YUV conversion call should skip (RGBs all exist).
        processor.convert_yuv_to_rgb()
        out = capsys.readouterr().out
        # Raw YUV dir was deleted after clean conversion, so the second call
        # reports no YUV inputs; either message means "skipped".
        assert "Skipping" in out and "conversion" in out


class TestVisMarkerProtocol:
    """The reference's run_full_pipeline parses '[VIS] *_VIEW_SECONDS:'
    stdout lines from reconstruct_scene (reference run_full_pipeline.py:
    96,278) and subtracts the total from the adjusted runtime."""

    def test_markers_emitted_and_accumulated(self, capsys):
        from mq3d_tpu.recon import reconstruct as rmod

        rmod.LAST_VIEW_SECONDS = 0.0
        rmod._emit_view_seconds("COLORLESS", 0.25)
        rmod._emit_view_seconds("COLORED", 0.5)
        out = capsys.readouterr().out
        assert "[VIS] COLORLESS_VIEW_SECONDS: 0.250" in out
        assert "[VIS] COLORED_VIEW_SECONDS: 0.500" in out
        assert abs(rmod.LAST_VIEW_SECONDS - 0.75) < 1e-9

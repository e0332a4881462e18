"""OBJ import + CLI smoke tests for the session tools."""

import subprocess
import sys


def _cpu_env():
    import os

    return {**os.environ, "JAX_PLATFORMS": "cpu", "MQ3D_FORCE_CPU": "1"}

import numpy as np
import pytest

from mq3d_tpu.export.obj import convert_obj_to_mesh, load_obj, parse_mtl


@pytest.fixture()
def obj_project(tmp_path, rng):
    """OBJ + MTL + texture triple."""
    import cv2

    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:, :8] = (0, 0, 255)  # left half red (BGR)
    tex[:, 8:] = (255, 0, 0)  # right half blue
    cv2.imwrite(str(tmp_path / "tex.png"), tex)

    (tmp_path / "mesh.mtl").write_text(
        "newmtl mat0\nKd 0.5 0.5 0.5\nmap_Kd tex.png\n"
    )
    (tmp_path / "mesh.obj").write_text(
        "mtllib mesh.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0.1 0.5\nvt 0.9 0.5\nvt 0.9 0.5\nvt 0.1 0.5\n"
        "usemtl mat0\n"
        "f 1/1 2/2 3/3 4/4\n"  # quad -> 2 triangles
    )
    return tmp_path


class TestObj:
    def test_parse_mtl(self, obj_project):
        mats = parse_mtl(obj_project / "mesh.mtl")
        assert mats["mat0"]["map_Kd"] == "tex.png"
        assert mats["mat0"]["Kd"] == (0.5, 0.5, 0.5)

    def test_load_obj_quad_triangulated(self, obj_project):
        mesh, uv, mtl = load_obj(obj_project / "mesh.obj")
        assert len(mesh.vertices) == 4
        assert len(mesh.triangles) == 2
        assert mtl == "mesh.mtl"
        assert uv is not None

    def test_texture_baking(self, obj_project):
        mesh = convert_obj_to_mesh(obj_project / "mesh.obj")
        c = mesh.vertex_colors
        assert c is not None
        # v1/v4 sample the red half (u=0.1), v2/v3 the blue half (u=0.9).
        assert c[0, 0] > 0.9 and c[0, 2] < 0.1
        assert c[1, 2] > 0.9 and c[1, 0] < 0.1

    def test_cli(self, obj_project):
        out = obj_project / "mesh.fbx"
        r = subprocess.run(
            [sys.executable, "scripts/convert_obj_to_fbx.py",
             "--input", str(obj_project / "mesh.obj"), "--output", str(out)],
            capture_output=True, text=True, cwd="/root/repo",
            env=_cpu_env(),
        )
        assert r.returncode == 0, r.stderr + r.stdout
        assert out.exists()


class TestSessionCLIs:
    def test_analyze_and_offset_clis(self, tmp_path):
        # minimal session
        d = tmp_path / "left_depth"
        d.mkdir()
        for i in range(5):
            (d / f"{1000 + i * 33}.raw").write_bytes(b"x")
        r = subprocess.run(
            [sys.executable, "scripts/analyze_recording_lengths.py", str(tmp_path)],
            capture_output=True, text=True, cwd="/root/repo",
            env=_cpu_env(),
        )
        assert r.returncode == 0
        assert "left_depth" in r.stdout

        r2 = subprocess.run(
            [sys.executable, "scripts/rename_timestamps.py",
             "--project_dir", str(tmp_path), "--offset_ms", "10",
             "--modalities", "left_depth"],
            capture_output=True, text=True, cwd="/root/repo",
            env=_cpu_env(),
        )
        assert r2.returncode == 0
        assert (d / "1010.raw").exists()


class TestPipelineCLI:
    @pytest.mark.slow
    def test_run_full_pipeline_cli(self, tmp_path):
        """End-to-end CLI smoke: session auto-selection + full run on a tiny
        capture, pipeline_runtime.txt written.  Slow tier (~10 min at 1 vCPU:
        a full CPU-backend pipeline in a subprocess); the verify skill and
        tests/test_end_to_end.py cover the same surface in the fast tier."""
        import subprocess
        import sys
        import textwrap
        import numpy as np
        from mq3d_tpu.testing.synthetic import (
            SyntheticSceneConfig, write_synthetic_project,
        )

        base = tmp_path / "captures"
        session = base / "20250101_120000"
        write_synthetic_project(session, SyntheticSceneConfig(n_frames=4, sweep=0.5))
        cfg = tmp_path / "cfg.yml"
        cfg.write_text(textwrap.dedent("""
            yuv_to_rgb: {blur_filter: False, blur_threshold: 50.0,
                         exposure_filter: False,
                         exposure_threshold_low: 0.05, exposure_threshold_high: 0.05}
            depth_to_linear: {clip_near_m: 0.1, clip_far_m: 5.0, use_cache: True}
            reconstruction:
              device: "cpu"
              use_dataset_cache: false
              estimate_depth_confidences: false
              optimize_depth_pose: false
              use_fragment_dataset_cache: false
              use_optimized_dataset_cache: false
              use_colorless_vbg_cache: false
              visualize_colorless_pcd: false
              optimize_color_pose: false
              visualize_colored_mesh: false
              sample_point_cloud_from_colored_mesh: false
              points_per_vertex_ratio: 1.0
              render_color_aligned_depth: false
              depth_integration:
                use_confidence_filtered_depth: false
                confidence_threshold: 0.02
                valid_count_threshold: 2
                voxel_size: 0.05
                block_resolution: 16
                block_count: 1024
                depth_max: 4.0
                trunc_voxel_multiplier: 4.0
                frames_per_batch: 4
                grid_dim: 16
                chunk_active_capacity: 1024
                integrate_tile: 128
        """))
        env = {"JAX_PLATFORMS": "cpu"}
        import os
        env = {**os.environ, **env}
        r = subprocess.run(
            [sys.executable, "scripts/run_full_pipeline.py",
             "--base_dir", str(base), "--config", str(cfg)],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert (session / "pipeline_runtime.txt").exists()
        assert (session / "reconstruction/colorless.ply").exists()

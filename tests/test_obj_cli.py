"""OBJ import + CLI smoke tests for the session tools."""

import subprocess
import sys

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
        )
        assert r.returncode == 0
        assert "left_depth" in r.stdout

        r2 = subprocess.run(
            [sys.executable, "scripts/rename_timestamps.py",
             "--project_dir", str(tmp_path), "--offset_ms", "10",
             "--modalities", "left_depth"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r2.returncode == 0
        assert (d / "1010.raw").exists()

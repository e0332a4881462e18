"""COLMAP model IO, FBX export, sampling, mesh filtering, and metric tests."""

import numpy as np
import pytest

from mq3d_tpu.dataio.ply import TriangleMesh
from mq3d_tpu.eval.metrics import (
    compare_point_clouds,
    count_boundary_edges,
    mesh_surface_area,
    nearest_distances,
    voxel_iou,
)
from mq3d_tpu.eval.quality import compute_raw_metrics, score_batch
from mq3d_tpu.export.colmap import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    read_model,
    rotmat2qvec,
    write_model,
)
from mq3d_tpu.ops.mesh_filter import filter_mesh_components
from mq3d_tpu.ops.sampling import sample_points_uniformly


class TestColmap:
    def test_binary_roundtrip(self, rng, tmp_path):
        cameras = {
            1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0])),
            2: Camera(2, "SIMPLE_PINHOLE", 100, 100, np.array([50.0, 50.0, 50.0])),
        }
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images = {
            1: Image(1, q, rng.normal(size=3), 1, "LEFT_123.png"),
            2: Image(
                2, np.array([1.0, 0, 0, 0]), np.zeros(3), 2, "RIGHT_456.png",
                xys=rng.random((3, 2)), point3D_ids=np.array([1, 2, -1]),
            ),
        }
        points = {
            1: Point3D(1, rng.normal(size=3), np.array([255, 0, 10], np.uint8),
                       0.5, np.array([1, 2]), np.array([0, 1])),
            2: Point3D(2, rng.normal(size=3), np.array([0, 128, 255], np.uint8)),
        }
        write_model(cameras, images, points, tmp_path, ext=".bin")
        c2, i2, p2 = read_model(tmp_path, ext=".bin")
        assert c2[1].model == "PINHOLE" and c2[2].model == "SIMPLE_PINHOLE"
        np.testing.assert_allclose(c2[1].params, cameras[1].params)
        np.testing.assert_allclose(i2[1].qvec, images[1].qvec)
        np.testing.assert_allclose(i2[2].xys, images[2].xys)
        np.testing.assert_array_equal(i2[2].point3D_ids, images[2].point3D_ids)
        assert i2[1].name == "LEFT_123.png"
        np.testing.assert_allclose(p2[1].xyz, points[1].xyz)
        np.testing.assert_array_equal(p2[1].rgb, points[1].rgb)
        np.testing.assert_array_equal(p2[1].image_ids, points[1].image_ids)

    def test_qvec_rotmat_consistency(self, rng):
        from scipy.spatial.transform import Rotation as R

        q_xyzw = rng.normal(size=4)
        q_xyzw /= np.linalg.norm(q_xyzw)
        q_wxyz = np.array([q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]])
        np.testing.assert_allclose(
            qvec2rotmat(q_wxyz), R.from_quat(q_xyzw).as_matrix(), atol=1e-12
        )
        back = rotmat2qvec(qvec2rotmat(q_wxyz))
        sign = np.sign(back[0] * q_wxyz[0]) if q_wxyz[0] != 0 else 1.0
        np.testing.assert_allclose(back * sign, q_wxyz, atol=1e-9)

    def test_colmap_cli(self, tmp_path, rng):
        """build_colmap_project.py over a synthetic project with RGBs."""
        import subprocess
        import sys
        from mq3d_tpu.testing.synthetic import (
            SyntheticSceneConfig, write_synthetic_project,
        )
        from mq3d_tpu.dataio.data_io import DataIO
        from mq3d_tpu.models.side import Side
        from mq3d_tpu.ops.yuv import convert_yuv420_888_to_bgr

        proj = tmp_path / "cap"
        write_synthetic_project(proj, SyntheticSceneConfig(n_frames=4))
        io = DataIO(proj)
        for side in Side:
            fmt = io.color.load_image_format_info(side)
            for ts in io.color.get_yuv_timestamps(side):
                io.color.save_bgr(
                    convert_yuv420_888_to_bgr(io.color.load_yuv(side, ts), fmt),
                    side, ts,
                )
        r = subprocess.run(
            [sys.executable, "scripts/build_colmap_project.py",
             "--project_dir", str(proj)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        model_dir = proj / "colmap/distorted/sparse/0"
        cams, imgs, pts = read_model(model_dir)
        assert len(cams) == 2
        assert len(imgs) == 8
        assert len(list((proj / "colmap/input").glob("*.png"))) == 8


class TestFbx:
    def test_ascii_fbx_written(self, rng, tmp_path):
        from mq3d_tpu.export.fbx import convert_ply_to_fbx
        from mq3d_tpu.dataio.ply import write_ply_mesh

        mesh = TriangleMesh(
            vertices=rng.normal(size=(8, 3)),
            triangles=rng.integers(0, 8, (6, 3)),
            vertex_colors=rng.random((8, 3)),
        )
        ply = tmp_path / "m.ply"
        write_ply_mesh(ply, mesh)
        fbx = tmp_path / "m.fbx"
        convert_ply_to_fbx(ply, fbx)
        text = fbx.read_text()
        assert "Vertices:" in text and "PolygonVertexIndex" in text
        assert "LayerElementColor" in text


def make_cube_mesh():
    """Unit cube surface (12 triangles)."""
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float,
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
         [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
         [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]]
    )
    return TriangleMesh(v, f)


class TestMetrics:
    def test_nearest_distances_exact(self, rng):
        a = rng.normal(size=(300, 3)).astype(np.float32)
        b = rng.normal(size=(200, 3)).astype(np.float32)
        d = nearest_distances(a, b, tile=128)
        bf = np.linalg.norm(a[:, None] - b[None], axis=-1).min(1)
        np.testing.assert_allclose(d, bf, atol=1e-4)

    def test_identical_clouds_zero_chamfer(self, rng):
        pts = rng.normal(size=(500, 3))
        c = compare_point_clouds(pts, pts)
        assert c.chamfer < 1e-5
        assert c.fscore == 1.0

    def test_fscore_threshold_behavior(self, rng):
        gt = rng.uniform(0, 1, (1000, 3))
        pred = gt + 0.005  # uniform 8.7 mm offset
        c = compare_point_clouds(pred, gt, fscore_threshold=0.02)
        assert c.fscore == 1.0
        c2 = compare_point_clouds(pred, gt, fscore_threshold=0.004)
        assert c2.fscore < 0.5

    def test_voxel_iou(self):
        a = np.array([[0.1, 0.1, 0.1], [1.1, 0.1, 0.1]])
        b = np.array([[0.2, 0.2, 0.2]])
        assert voxel_iou(a, b, 1.0) == 0.5

    def test_surface_area_and_boundary(self):
        cube = make_cube_mesh()
        assert abs(mesh_surface_area(cube.vertices, cube.triangles) - 6.0) < 1e-9
        assert count_boundary_edges(cube.triangles) == 0


class TestQuality:
    def test_raw_metrics_and_batch_scores(self, rng):
        cube = make_cube_mesh()
        cube.vertex_colors = rng.random((8, 3))
        noisy = TriangleMesh(
            cube.vertices + rng.normal(scale=0.1, size=(8, 3)),
            cube.triangles,
            vertex_colors=rng.random((8, 3)),
        )
        m1 = compute_raw_metrics(cube)
        m2 = compute_raw_metrics(noisy)
        assert np.isfinite(m1.aspect_ratio_mean)
        assert m1.boundary_edge_ratio == 0.0
        scores = score_batch([m1, m2])
        q1, q2 = scores[0].q, scores[1].q
        assert 0.0 <= q2 <= q1 <= 1.0  # clean cube scores at least as well


class TestSamplingFilter:
    def test_sample_points_on_surface(self, rng):
        cube = make_cube_mesh()
        pcd = sample_points_uniformly(cube, 2000, seed=1)
        assert len(pcd.points) == 2000
        # every sample on a face: one coordinate is ~0 or ~1
        on_face = np.any(
            (np.abs(pcd.points) < 1e-9) | (np.abs(pcd.points - 1) < 1e-9), axis=1
        )
        assert on_face.all()

    def test_filter_small_components(self, rng):
        cube = make_cube_mesh()
        # add a distant lone triangle
        extra_v = np.array([[10, 10, 10], [11, 10, 10], [10, 11, 10]], float)
        verts = np.concatenate([cube.vertices, extra_v])
        tris = np.concatenate([cube.triangles, [[8, 9, 10]]])
        mesh = TriangleMesh(verts, tris)
        out = filter_mesh_components(mesh, min_triangle_count=5)
        assert len(out.triangles) == 12
        assert len(out.vertices) == 8
        # keep-largest fallback when nothing passes
        out2 = filter_mesh_components(mesh, min_triangle_count=100)
        assert len(out2.triangles) == 12

"""Quadric-error decimation tests (reference: Open3D
simplify_quadric_decimation in scripts/downsample_fbx_mesh.py:214-247)."""

import numpy as np
import pytest

from mq3d_tpu.dataio.ply import TriangleMesh
from mq3d_tpu.eval.metrics import nearest_distances
from mq3d_tpu.ops.decimate import (
    simplify_quadric_decimation,
    simplify_to_ratio,
)


def make_sphere(n_theta=32, n_phi=64, radius=1.0):
    """Closed UV sphere."""
    verts = [(0, 0, radius)]
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            verts.append((radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)))
    verts.append((0, 0, -radius))
    south = len(verts) - 1

    def ring(i, j):
        return 1 + (i - 1) * n_phi + (j % n_phi)

    tris = []
    for j in range(n_phi):
        tris.append((0, ring(1, j), ring(1, j + 1)))
        tris.append((south, ring(n_theta - 1, j + 1), ring(n_theta - 1, j)))
    for i in range(1, n_theta - 1):
        for j in range(n_phi):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            tris.append((a, c, b))
            tris.append((b, c, d))
    return TriangleMesh(np.asarray(verts, float),
                        np.asarray(tris, np.int64))


def make_grid(n=20):
    """Open flat grid (has boundary)."""
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            tris.append((a, a + 1, a + n))
            tris.append((a + 1, a + n + 1, a + n))
    return TriangleMesh(verts, np.asarray(tris, np.int64))


class TestQuadricDecimation:
    def test_reaches_target_count(self):
        sphere = make_sphere()
        n0 = len(sphere.triangles)
        out = simplify_quadric_decimation(sphere, n0 // 4)
        assert len(out.triangles) <= n0 // 4 * 1.1
        assert len(out.triangles) >= n0 // 8  # didn't collapse to nothing

    def test_surface_deviation_small(self):
        sphere = make_sphere()
        out = simplify_to_ratio(sphere, 0.25)
        # decimated vertices stay near the unit sphere
        r = np.linalg.norm(out.vertices, axis=-1)
        assert np.abs(r - 1.0).max() < 0.05
        # original surface stays covered
        d = nearest_distances(sphere.vertices.astype(np.float32),
                              out.vertices.astype(np.float32))
        assert np.percentile(d, 95) < 0.12  # coarser sampling, same shape

    def test_watertight_stays_watertight(self):
        from mq3d_tpu.eval.quality import compute_raw_metrics

        sphere = make_sphere(n_theta=16, n_phi=32)
        out = simplify_to_ratio(sphere, 0.3)
        m = compute_raw_metrics(out)
        assert m.boundary_edge_ratio == 0.0
        assert m.component_count == 1

    def test_boundary_preserved(self):
        grid = make_grid()
        out = simplify_to_ratio(grid, 0.25)
        # boundary constraint quadrics keep the square outline: corners
        # survive near their original positions
        for corner in ([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]):
            d = np.linalg.norm(out.vertices - np.asarray(corner, float),
                               axis=-1).min()
            assert d < 0.08, corner
        # and decimated vertices remain in the plane
        assert np.abs(out.vertices[:, 2]).max() < 1e-6

    def test_colors_carried(self):
        sphere = make_sphere(n_theta=12, n_phi=24)
        sphere.vertex_colors = (sphere.vertices + 1.0) / 2.0
        out = simplify_to_ratio(sphere, 0.4)
        assert out.vertex_colors is not None
        assert len(out.vertex_colors) == len(out.vertices)
        # position-correlated colors stay correlated after collapse
        expect = (out.vertices + 1.0) / 2.0
        err = np.abs(out.vertex_colors - expect).mean()
        assert err < 0.1

    def test_cli_quadric_path(self, tmp_path, cpu_subprocess_env):
        import subprocess
        import sys

        from mq3d_tpu.dataio.ply import read_ply, write_ply_mesh

        sphere = make_sphere(n_theta=16, n_phi=32)
        src = tmp_path / "in.ply"
        dst = tmp_path / "out.ply"
        write_ply_mesh(src, sphere)
        r = subprocess.run(
            [sys.executable, "scripts/downsample_fbx_mesh.py",
             "--input", str(src), "--output", str(dst), "--ratio", "0.25"],
            capture_output=True, text=True, cwd="/root/repo",
            env=cpu_subprocess_env)
        assert r.returncode == 0, r.stderr
        out = read_ply(dst)
        assert len(out.triangles) < len(sphere.triangles) * 0.5

"""Uniform point sampling from a triangle mesh.

Replaces o3d sample_points_uniformly (reference reconstruct_scene.py:162-171):
triangles are sampled proportionally to area, points uniformly by barycentric
coordinates; colors/normals interpolate from vertices.
"""

from __future__ import annotations

import numpy as np

from mq3d_tpu.dataio.ply import PointCloud, TriangleMesh


def sample_points_uniformly(
    mesh: TriangleMesh, number_of_points: int, seed: int = 0
) -> PointCloud:
    tris = np.asarray(mesh.triangles)
    verts = np.asarray(mesh.vertices)
    if len(tris) == 0 or number_of_points <= 0:
        return PointCloud(points=np.zeros((0, 3)))

    rng = np.random.default_rng(seed)
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    total = areas.sum()
    if total <= 0:
        return PointCloud(points=np.zeros((0, 3)))
    probs = areas / total
    tri_idx = rng.choice(len(tris), size=number_of_points, p=probs)

    r1 = np.sqrt(rng.random(number_of_points))
    r2 = rng.random(number_of_points)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2

    t = tris[tri_idx]
    pts = (
        w0[:, None] * verts[t[:, 0]]
        + w1[:, None] * verts[t[:, 1]]
        + w2[:, None] * verts[t[:, 2]]
    )
    colors = None
    if mesh.vertex_colors is not None:
        vc = np.asarray(mesh.vertex_colors)
        colors = (
            w0[:, None] * vc[t[:, 0]] + w1[:, None] * vc[t[:, 1]] + w2[:, None] * vc[t[:, 2]]
        )
    normals = None
    if mesh.vertex_normals is not None:
        vn = np.asarray(mesh.vertex_normals)
        normals = (
            w0[:, None] * vn[t[:, 0]] + w1[:, None] * vn[t[:, 1]] + w2[:, None] * vn[t[:, 2]]
        )
        nrm = np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / np.maximum(nrm, 1e-12)
    return PointCloud(points=pts, normals=normals, colors=colors)

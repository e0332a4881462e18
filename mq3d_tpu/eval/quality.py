"""Mesh quality score Q — re-design of the reference's evaluation harness
(reference: scripts/evaluation/evaluate_fbx_quality.py:5-8,564):

    Q = 0.50 * S_geom + 0.25 * S_smooth + 0.15 * S_complete + 0.10 * S_color

Raw per-mesh metrics (each normalized min-max across the evaluated batch,
with "lower is better" metrics inverted):
  geometry      triangle aspect ratio + skewness (:77-108), non-manifold
                edge ratio + watertightness (:296-311)
  smoothness    adjacent-face normal deviation + dihedral roughness (:316-352)
  completeness  voxel-grid vertex-density stddev (:357-384) + hole boundary
                ratio
  color         vertex-color gradient stddev along edges (:391-409)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from mq3d_tpu.dataio.ply import TriangleMesh

W_GEOM, W_SMOOTH, W_COMPLETE, W_COLOR = 0.50, 0.25, 0.15, 0.10


@dataclass
class RawMeshMetrics:
    aspect_ratio_mean: float  # lower better
    skewness_mean: float  # lower better
    nonmanifold_edge_ratio: float  # lower better
    boundary_edge_ratio: float  # lower better
    normal_deviation_mean: float  # lower better
    dihedral_roughness: float  # lower better
    density_stddev: float  # lower better
    color_gradient_stddev: float  # lower better
    n_vertices: int = 0
    n_triangles: int = 0


def compute_raw_metrics(mesh: TriangleMesh, density_voxel: float = 0.25) -> RawMeshMetrics:
    verts = np.asarray(mesh.vertices, np.float64)
    tris = np.asarray(mesh.triangles, np.int64)
    if len(tris) == 0:
        return RawMeshMetrics(*([np.nan] * 8), n_vertices=len(verts), n_triangles=0)

    p0, p1, p2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    e0 = np.linalg.norm(p1 - p0, axis=-1)
    e1 = np.linalg.norm(p2 - p1, axis=-1)
    e2 = np.linalg.norm(p0 - p2, axis=-1)
    edges_len = np.stack([e0, e1, e2], -1)
    longest = edges_len.max(-1)
    shortest = np.maximum(edges_len.min(-1), 1e-12)
    aspect = longest / shortest

    # Skewness: deviation from equilateral via area ratio.
    s = edges_len.sum(-1) / 2
    area = np.sqrt(np.maximum(s * (s - e0) * (s - e1) * (s - e2), 0.0))
    equilateral_area = (np.sqrt(3) / 4) * (edges_len.mean(-1) ** 2)
    skew = 1.0 - np.clip(area / np.maximum(equilateral_area, 1e-12), 0.0, 1.0)

    # Edge topology (packed int64 keys: unique(axis=0) is far slower).
    nv = len(verts)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges_sorted = np.sort(edges, axis=1)
    edge_keys = edges_sorted[:, 0].astype(np.int64) * nv + edges_sorted[:, 1]
    uniq_keys, counts = np.unique(edge_keys, return_counts=True)
    uniq = np.stack([uniq_keys // nv, uniq_keys % nv], axis=-1)
    nonmanifold = (counts > 2).mean()
    boundary = (counts == 1).mean()

    # Face normals + smoothness over shared edges (vectorized pairing:
    # sort the undirected edge list; equal neighbors share a face pair).
    fn = np.cross(p1 - p0, p2 - p0)
    fn_norm = np.linalg.norm(fn, axis=-1, keepdims=True)
    fn = fn / np.maximum(fn_norm, 1e-12)
    # The edge list is grouped by edge slot ([all e01][all e12][all e20]),
    # so the owning face index tiles rather than repeats.
    face_ids = np.tile(np.arange(len(tris)), 3)
    order = np.argsort(edge_keys, kind="stable")
    es = edge_keys[order]
    fs = face_ids[order]
    same = es[1:] == es[:-1]
    fa = fs[:-1][same]
    fb = fs[1:][same]
    if len(fa):
        cosang = np.clip(np.einsum("ij,ij->i", fn[fa], fn[fb]), -1.0, 1.0)
        dihedral = np.arccos(cosang)
    else:
        dihedral = np.asarray([0.0])
    normal_dev = float(dihedral.mean())
    roughness = float(dihedral.std())

    # Vertex density uniformity.
    keys = np.floor(verts / density_voxel).astype(np.int64)
    _, cell_counts = np.unique(keys, axis=0, return_counts=True)
    density_std = float(cell_counts.std() / max(cell_counts.mean(), 1e-12))

    # Color gradient along edges.
    if mesh.vertex_colors is not None and len(mesh.vertex_colors):
        vc = np.asarray(mesh.vertex_colors, np.float64)
        if vc.max() > 1.0:
            vc = vc / 255.0
        grad = np.linalg.norm(vc[uniq[:, 0]] - vc[uniq[:, 1]], axis=-1)
        color_std = float(grad.std())
    else:
        color_std = np.nan

    return RawMeshMetrics(
        aspect_ratio_mean=float(aspect.mean()),
        skewness_mean=float(skew.mean()),
        nonmanifold_edge_ratio=float(nonmanifold),
        boundary_edge_ratio=float(boundary),
        normal_deviation_mean=normal_dev,
        dihedral_roughness=roughness,
        density_stddev=density_std,
        color_gradient_stddev=color_std,
        n_vertices=len(verts),
        n_triangles=len(tris),
    )


def _minmax_invert(values: np.ndarray) -> np.ndarray:
    """Batch min-max normalize a lower-is-better metric into [0, 1] where 1
    is best (reference :120-132)."""
    v = np.asarray(values, np.float64)
    ok = np.isfinite(v)
    if ok.sum() == 0:
        return np.full_like(v, 0.5)
    lo, hi = v[ok].min(), v[ok].max()
    if hi - lo < 1e-12:
        out = np.full_like(v, 1.0)
    else:
        out = 1.0 - (v - lo) / (hi - lo)
    out[~ok] = 0.0
    return out


@dataclass
class QualityScores:
    s_geom: float
    s_smooth: float
    s_complete: float
    s_color: float

    @property
    def q(self) -> float:
        return (
            W_GEOM * self.s_geom
            + W_SMOOTH * self.s_smooth
            + W_COMPLETE * self.s_complete
            + W_COLOR * self.s_color
        )


def score_batch(metrics: List[RawMeshMetrics]) -> List[QualityScores]:
    """Batch-relative normalization then weighted aggregation
    (reference :475-589)."""
    aspect = _minmax_invert([m.aspect_ratio_mean for m in metrics])
    skew = _minmax_invert([m.skewness_mean for m in metrics])
    nonman = _minmax_invert([m.nonmanifold_edge_ratio for m in metrics])
    bound = _minmax_invert([m.boundary_edge_ratio for m in metrics])
    ndev = _minmax_invert([m.normal_deviation_mean for m in metrics])
    rough = _minmax_invert([m.dihedral_roughness for m in metrics])
    dens = _minmax_invert([m.density_stddev for m in metrics])
    cgrad = _minmax_invert([m.color_gradient_stddev for m in metrics])

    out = []
    for i in range(len(metrics)):
        s_geom = float(np.mean([aspect[i], skew[i], nonman[i]]))
        s_smooth = float(np.mean([ndev[i], rough[i]]))
        s_complete = float(np.mean([dens[i], bound[i]]))
        s_color = float(cgrad[i])
        out.append(QualityScores(s_geom, s_smooth, s_complete, s_color))
    return out

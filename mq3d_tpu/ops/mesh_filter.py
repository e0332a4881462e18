"""Mesh cleanup: connected-component filtering and degenerate removal.

Re-implements the reference's filter_mesh_components (reference:
scripts/processing/reconstruction/utils/o3d_utils.py:241-321), which drops
floating fragments (body parts in head-level recordings) below a triangle
count, keeping the largest component if none qualify, then removes
degenerate/duplicated triangles, duplicated vertices and unreferenced
vertices.  Host-side numpy/scipy (this is post-processing, not a hot path).
"""

from __future__ import annotations

import numpy as np

from mq3d_tpu.dataio.ply import TriangleMesh


def cluster_connected_triangles(mesh: TriangleMesh):
    """Label triangles by connected component (components connected via
    shared vertices).  Returns (triangle_clusters (M,), cluster_n_triangles)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    tris = np.asarray(mesh.triangles)
    nv = len(mesh.vertices)
    if len(tris) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    rows = np.concatenate([tris[:, 0], tris[:, 1], tris[:, 2]])
    cols = np.concatenate([tris[:, 1], tris[:, 2], tris[:, 0]])
    g = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(nv, nv))
    _, vlabels = connected_components(g, directed=False)
    tlabels = vlabels[tris[:, 0]]
    # Compact label ids to 0..k-1 in first-appearance order and count.
    uniq, tlabels = np.unique(tlabels, return_inverse=True)
    counts = np.bincount(tlabels)
    return tlabels.astype(np.int64), counts.astype(np.int64)


def remove_duplicated_vertices(mesh: TriangleMesh) -> TriangleMesh:
    verts = np.asarray(mesh.vertices)
    uniq, index, inverse = np.unique(
        verts, axis=0, return_index=True, return_inverse=True
    )
    tris = inverse[np.asarray(mesh.triangles)]
    out = TriangleMesh(uniq, tris)
    if mesh.vertex_colors is not None:
        out.vertex_colors = np.asarray(mesh.vertex_colors)[index]
    if mesh.vertex_normals is not None:
        out.vertex_normals = np.asarray(mesh.vertex_normals)[index]
    return out


def remove_degenerate_and_duplicated_triangles(tris: np.ndarray) -> np.ndarray:
    good = (
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    )
    tris = tris[good]
    # Duplicates irrespective of rotation order: canonical sorted key.
    key = np.sort(tris, axis=1)
    _, keep = np.unique(key, axis=0, return_index=True)
    return tris[np.sort(keep)]


def remove_unreferenced_vertices(mesh: TriangleMesh) -> TriangleMesh:
    tris = np.asarray(mesh.triangles)
    used = np.zeros(len(mesh.vertices), bool)
    used[tris.reshape(-1)] = True
    remap = np.full(len(mesh.vertices), -1, np.int64)
    remap[used] = np.arange(used.sum())
    out = TriangleMesh(np.asarray(mesh.vertices)[used], remap[tris])
    if mesh.vertex_colors is not None:
        out.vertex_colors = np.asarray(mesh.vertex_colors)[used]
    if mesh.vertex_normals is not None:
        out.vertex_normals = np.asarray(mesh.vertex_normals)[used]
    return out


def filter_mesh_components(
    mesh: TriangleMesh, min_triangle_count: int = 2000
) -> TriangleMesh:
    """Drop small disconnected components; keep largest if none qualify."""
    tris = np.asarray(mesh.triangles)
    if len(tris) == 0:
        print("[Warning] Mesh filtering: input mesh has no triangles")
        return mesh

    tlabels, counts = cluster_connected_triangles(mesh)
    valid_clusters = np.nonzero(counts >= min_triangle_count)[0]
    if len(valid_clusters) == 0:
        print(
            f"[Warning] Mesh filtering: no components with >= {min_triangle_count} "
            f"triangles (largest has {counts.max()}); keeping largest only."
        )
        valid_clusters = np.asarray([np.argmax(counts)])

    mask = np.isin(tlabels, valid_clusters)
    removed = int((~mask).sum())

    out = TriangleMesh(
        np.asarray(mesh.vertices),
        remove_degenerate_and_duplicated_triangles(tris[mask]),
        vertex_colors=mesh.vertex_colors,
        vertex_normals=mesh.vertex_normals,
    )
    out = remove_duplicated_vertices(out)
    out = remove_unreferenced_vertices(out)

    kept = len(valid_clusters)
    total = len(counts)
    if total - kept > 0:
        print(
            f"[Info] Mesh filtering: kept {kept}/{total} components, "
            f"removed {removed} triangles"
        )
    return out

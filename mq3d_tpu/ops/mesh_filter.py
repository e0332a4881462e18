"""Mesh cleanup: connected-component filtering and degenerate removal.

Re-implements the reference's filter_mesh_components (reference:
scripts/processing/reconstruction/utils/o3d_utils.py:241-321), which drops
floating fragments (body parts in head-level recordings) below a triangle
count, keeping the largest component if none qualify, then removes
degenerate/duplicated triangles, duplicated vertices and unreferenced
vertices.

Component labeling runs ON DEVICE by default (Shiloach-Vishkin-style
min-label propagation: per-round triangle hook + pointer-jumping
compression, O(log n) rounds — a BFS/union-find would be host-serial),
with the scipy host path kept as the parity oracle and fallback.
"""

from __future__ import annotations

import numpy as np

from mq3d_tpu.dataio.ply import TriangleMesh


def cluster_connected_triangles_host(mesh: TriangleMesh):
    """Host/scipy oracle for cluster_connected_triangles."""
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


def _vertex_labels_device(tris, nv: int, max_rounds: int = 64):
    """Min-label vertex components on device.

    Each round: (a) HOOK — every triangle scatter-mins the minimum of its
    three vertex labels into all three vertices; (b) COMPRESS — pointer-
    jump L = L[L] to a fixed point, so label chains collapse to their
    representative.  Hook merges adjacent trees, compression keeps depth
    ~1, giving convergence in O(log n) rounds (diameter-independent, the
    reason plain label propagation is not used).  The whole loop is one
    jitted while_loop: no host round-trips until the result fetch."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("nv", "max_rounds"))
    def run(tris, nv, max_rounds):
        t = tris.astype(jnp.int32)
        L0 = jnp.arange(nv, dtype=jnp.int32)

        def compress(L):
            def c_body(c):
                L, _ = c
                L2 = L[L]
                return L2, jnp.any(L2 != L)

            def c_cond(c):
                return c[1]

            L, _ = jax.lax.while_loop(c_cond, c_body, (L, jnp.bool_(True)))
            return L

        def body(c):
            L, _, r = c
            la, lb, lc = L[t[:, 0]], L[t[:, 1]], L[t[:, 2]]
            m = jnp.minimum(jnp.minimum(la, lb), lc)
            # Hook the ROOTS (labels-as-indices), not the vertices: writing
            # to the vertex would be plain label propagation (O(diameter)
            # rounds); writing to the tree representative merges whole trees
            # per round, and compression then relabels every member.
            L2 = L.at[la].min(m).at[lb].min(m).at[lc].min(m)
            L2 = compress(L2)
            return L2, jnp.any(L2 != L), r + 1

        def cond(c):
            return c[1] & (c[2] < max_rounds)

        L, _, _ = jax.lax.while_loop(
            cond, body, (L0, jnp.bool_(True), jnp.int32(0))
        )
        return L

    return run(tris, nv, max_rounds)


def cluster_connected_triangles(mesh: TriangleMesh, device: bool | None = None):
    """Label triangles by connected component (components connected via
    shared vertices).  Returns (triangle_clusters (M,), cluster_n_triangles).

    device=None (default) uses the device path and falls back to scipy on
    failure; True/False force a path."""
    tris = np.asarray(mesh.triangles)
    nv = len(mesh.vertices)
    if len(tris) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if device is False:
        return cluster_connected_triangles_host(mesh)
    try:
        import jax.numpy as jnp

        vlabels = np.asarray(
            _vertex_labels_device(jnp.asarray(tris, jnp.int32), int(nv))
        )
    except Exception as e:  # noqa: BLE001 - any device failure -> oracle
        if device is True:
            raise
        print(f"[Warning] device component labeling failed ({e}); "
              "falling back to scipy")
        return cluster_connected_triangles_host(mesh)
    tlabels = vlabels[tris[:, 0]]
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

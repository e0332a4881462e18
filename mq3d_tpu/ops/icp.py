"""Point-cloud registration: multi-scale ICP, evaluation, information matrix.

Re-design of o3d.t.pipelines.registration.{multi_scale_icp,
evaluate_registration, get_information_matrix} (used by the reference at
refine_fragment_poses.py:136-182).  KD-trees don't map to TPU; two
tree-free NN structures serve different call profiles:

- **CSR voxel bucket grid** (GridNN): exact in-radius nearest neighbor.
  With cell size >= the search radius the true NN is inside the 2x2x2
  cell neighborhood, so a query reduces 8 * max_occ candidates
  incrementally — up to ~1024 gathers/point at production density.  Used
  for single-pass exact stats (evaluate_registration, information
  matrices) where it runs once, not per iteration.
- **Discrete-Voronoi nearest-id field** (VoroNN): one device scatter-min
  build per target, then ~32 gathers/point/query (8 cells x 1 id +
  3 coords).  The returned neighbor is within O(cell) of the true
  nearest — the iterated ICP correspondence pass tolerates this (cf.
  Open3D hybrid search), and the ~30x cheaper query is what keeps the
  batched O(F^2) pair refinement launches short.  Used for every ICP
  iteration loop.

Transform estimation is point-to-point Umeyama/Kabsch: the device pass
reduces masked correspondence sums (centroids, cross-covariance, rmse), the
3x3 SVD happens on host.  Convergence criteria mirror
ICPConvergenceCriteria (relative_fitness / relative_rmse / max_iteration).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from mq3d_tpu.utils.host import fetch, fetch_float, fetch_int


# ---------------------------------------------------------------------------
# Downsampling (host)
# ---------------------------------------------------------------------------

def voxel_down_sample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Average points per voxel (o3d voxel_down_sample semantics)."""
    if len(points) == 0:
        return points
    keys = np.floor(points / voxel_size).astype(np.int64)
    kmin = keys.min(axis=0)
    keys = keys - kmin
    dims = keys.max(axis=0) + 1
    lin = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    pts_s = points[order]
    boundaries = np.concatenate([[True], lin_s[1:] != lin_s[:-1]])
    seg_ids = np.cumsum(boundaries) - 1
    n_seg = seg_ids[-1] + 1
    sums = np.zeros((n_seg, 3))
    np.add.at(sums, seg_ids, pts_s)
    counts = np.bincount(seg_ids)
    return sums / counts[:, None]


def uniform_down_sample(points: np.ndarray, every_k: int) -> np.ndarray:
    """Every k-th point (o3d uniform_down_sample)."""
    return points[:: max(int(every_k), 1)]


# ---------------------------------------------------------------------------
# Grid-bucket nearest neighbor
# ---------------------------------------------------------------------------

@dataclass
class GridNN:
    """CSR voxel bucket index over a target cloud.

    `order` holds target point ids sorted by cell; `starts[lin]` is each
    cell's offset into it (one entry past the last real cell closes the
    final range).  Memory is O(points + cells) instead of the dense
    (n_cells * capacity) slot table this replaces — at fine ICP pyramid
    levels the slot table reached 2^25 slots (134 MB) for <1M points.
    `max_occ` (max per-cell occupancy, capped at `capacity`, rounded up
    to a power of two for compile-cache stability) bounds the query loop,
    so sparse cells cost their real occupancy, not the worst-case cap."""

    target: np.ndarray  # (M_pad, 3) float32, padded with +inf
    order: np.ndarray  # (M_ord_pad,) int32 target ids sorted by cell
    starts: np.ndarray  # (n_cells_pad,) int32 CSR offsets into order
    gmin: np.ndarray  # (3,) float32
    dims: np.ndarray  # (3,) int32
    cell: float
    capacity: int
    max_occ: int
    n_target: int


def _bucket_pow2(n: int, floor: int = 1024) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def build_grid_nn(target: np.ndarray, radius: float, capacity: int = 32) -> GridNN:
    """Host-side build: one sort over target points.

    Cell size is 2x the search radius: with the query point anywhere in its
    cell, the 2x2x2 neighborhood around floor(rel - 0.5) then covers at
    least `radius` in every direction.
    """
    target = np.asarray(target, np.float32)
    m = len(target)
    cell = float(radius) * 2.0
    gmin = target.min(axis=0) - cell if m else np.zeros(3, np.float32)
    keys = np.floor((target - gmin) / cell).astype(np.int64) if m else np.zeros((0, 3), np.int64)
    dims = (keys.max(axis=0) + 2) if m else np.ones(3, np.int64)
    lin = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    n_cells = int(np.prod(dims))

    order = np.argsort(lin, kind="stable").astype(np.int32)
    counts = np.bincount(lin, minlength=n_cells) if m else np.zeros(
        n_cells, np.int64)
    # CSR offsets; one closing entry, padded cells read start == end == m.
    starts = np.full(_bucket_pow2(n_cells + 1), m, np.int32)
    starts[0] = 0
    starts[1:n_cells + 1] = np.cumsum(counts).astype(np.int32)
    # Power-of-two loop bound for compile-cache stability across scenes.
    max_occ = _bucket_pow2(int(min(counts.max() if m else 0, capacity)), 1)

    m_ord_pad = _bucket_pow2(max(m, 1), 256)
    order_pad = np.zeros(m_ord_pad, np.int32)
    order_pad[:m] = order
    m_pad = _bucket_pow2(max(m, 1), 256)
    tgt_pad = np.full((m_pad, 3), np.inf, np.float32)
    tgt_pad[:m] = target
    return GridNN(
        target=tgt_pad,
        order=order_pad,
        starts=starts,
        gmin=gmin.astype(np.float32),
        dims=dims.astype(np.int32),
        cell=cell,
        capacity=capacity,
        max_occ=max_occ,
        n_target=m,
    )


@partial(jax.jit, static_argnames=("max_occ",))
def _nn_query(
    src,  # (N, 3) float32 (padded with inf)
    T,  # (4, 4) float64/float32 applied to src
    target,  # (M_pad, 3)
    order,  # (M_ord_pad,) i32 target ids sorted by cell
    starts,  # (S_pad,) i32 CSR offsets, starts[lin]..starts[lin+1]
    gmin,  # (3,)
    dims,  # (3,)
    cell,  # () f32
    max_occ: int,
):
    """Returns (idx (N,), dist (N,)): nearest target within the 2x2x2 cell
    neighborhood (covers everything within `cell`); inf dist if none.

    Candidates reduce INCREMENTALLY (fori over the CSR cell range) so only
    (N,)-shaped vectors are ever live: the obvious (N, K, 3) gather pads
    its minor dim 3 -> 128 in the T(8,128) layout — a 42x blow-up that
    OOMed HBM at production cloud sizes under vmap.  The loop bound is
    the grid's true max occupancy, not the worst-case capacity, so sparse
    grids march 8*max_occ steps instead of 8*32."""
    Tf = T.astype(jnp.float32)
    p = src @ Tf[:3, :3].T + Tf[:3, 3]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    tx, ty, tz = target[:, 0], target[:, 1], target[:, 2]
    rel = (p - gmin) / cell
    base = jnp.floor(rel - 0.5).astype(jnp.int32)

    n_cells = dims[0] * dims[1] * dims[2]
    s_last = starts.shape[0] - 1
    m_ord = order.shape[0]

    best_d2 = jnp.full(p.shape[0], jnp.inf, jnp.float32)
    best_i = jnp.full(p.shape[0], -1, jnp.int32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                c = base + jnp.asarray([dx, dy, dz], jnp.int32)
                ok = jnp.all((c >= 0) & (c < dims), axis=-1)
                lin = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
                lin = jnp.where(ok & (lin < n_cells), lin, 0)
                lin = jnp.minimum(lin, s_last - 1)
                s = jnp.where(ok, starts[lin], 0)
                e = jnp.where(ok, starts[lin + 1], 0)

                def k_body(k, carry, s=s, e=e):
                    bd2, bi = carry
                    pos = s + k
                    live = pos < e
                    ti = order[jnp.minimum(pos, m_ord - 1)]  # (N,)
                    d2 = ((px - tx[ti]) ** 2 + (py - ty[ti]) ** 2
                          + (pz - tz[ti]) ** 2)
                    d2 = jnp.where(live, d2, jnp.inf)
                    better = d2 < bd2
                    return (jnp.where(better, d2, bd2),
                            jnp.where(better, ti, bi))

                best_d2, best_i = jax.lax.fori_loop(
                    0, max_occ, k_body, (best_d2, best_i))
    return best_i, jnp.sqrt(best_d2)


# ---------------------------------------------------------------------------
# Discrete-Voronoi nearest-id field (fast approximate NN for the hot
# batched pair-ICP path)
# ---------------------------------------------------------------------------

@dataclass
class VoroNN:
    """Dense nearest-target-id field at cell size == the search radius.

    Each in-range cell stores the id of the target point nearest to the
    CELL CENTER (a discretized Voronoi diagram, built by one device
    scatter-min of every target id into its 3x3x3 cell neighborhood with a
    packed (distance-bits << 32 | id) key).  A query gathers the ids of its
    2x2x2 surrounding cells and takes the true-distance argmin over those
    <= 8 candidates: ~32 gathers per query point vs the CSR grid's
    8 * max_occ * 4 (up to 1024 at production fragment density) — the
    difference between a ~2 s and a ~60 ms ICP iteration at 1M points.

    Approximation: the per-cell winner is nearest to the cell center, not
    to the query, so the returned neighbor can be farther than the true
    nearest by O(cell).  Every target within `radius` of the query is
    guaranteed to have been scattered into at least one queried cell
    (|cell(t) - cell(p)| <= 1 per axis and the scatter covers the full
    3x3x3 of cell(t), which contains cell(p)); only shadowing by a
    closer-to-center point loses it, and the shadowing point is itself a
    near-optimal correspondence.  ICP tolerates this class of approximate
    correspondence (cf. Open3D's hybrid search); the A/B test
    (tests/test_icp.py) bounds the converged-transform delta."""

    target: np.ndarray  # (M_pad, 3) float32, padded with +inf
    ids: np.ndarray  # (n_cells_pad,) int32 nearest id per cell, -1 empty
    gmin: np.ndarray  # (3,) float32
    dims: np.ndarray  # (3,) int32
    cell: float
    n_target: int


# Refuse to densify absurd extents (falls back to the CSR grid).
_VORO_MAX_CELLS = 64 * 1024 * 1024

_NEIGH27 = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), -1
).reshape(-1, 3).astype(np.int32)


@partial(jax.jit, static_argnames=("n_cells_pad",))
def _voro_scatter(pts, gmin, dims, cell, n_cells_pad: int):
    """Scatter-min of (dist-to-cell-center, id) over each point's 3x3x3
    cell neighborhood.  f32 distance bits order like the floats for
    non-negative values, so one int64 key carries both."""
    keys = jnp.floor((pts - gmin) / cell).astype(jnp.int32)  # (m, 3)
    cells = keys[:, None, :] + jnp.asarray(_NEIGH27)[None]  # (m, 27, 3)
    centers = (cells.astype(jnp.float32) + 0.5) * cell + gmin
    d2 = jnp.sum((pts[:, None, :] - centers) ** 2, -1)  # (m, 27) f32
    lin = (cells[..., 0] * dims[1] + cells[..., 1]) * dims[2] + cells[..., 2]
    m = pts.shape[0]
    ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, 27))
    key = (
        jax.lax.bitcast_convert_type(d2, jnp.int32).astype(jnp.int64) << 32
    ) | ids.astype(jnp.int64)
    field = jnp.full((n_cells_pad,), jnp.iinfo(jnp.int64).max, jnp.int64)
    field = field.at[lin.reshape(-1)].min(key.reshape(-1), mode="drop")
    return jnp.where(
        field == jnp.iinfo(jnp.int64).max,
        jnp.int32(-1),
        (field & 0x7FFFFFFF).astype(jnp.int32),
    )


def build_voronoi_nn(target: np.ndarray, radius: float) -> "VoroNN | GridNN":
    """Build the nearest-id field on device (one scatter-min launch).

    Falls back to the exact CSR grid when the dense field would exceed
    _VORO_MAX_CELLS (degenerate extents / tiny radius)."""
    target = np.asarray(target, np.float32)
    m = len(target)
    cell = float(radius)
    if m == 0:
        return build_grid_nn(target, radius)
    tmin = target.min(axis=0)
    tmax = target.max(axis=0)
    # Two guard cells on each side: scatter cells (key +- 1) and query
    # cells (floor(rel - 0.5) + {0,1}) both stay in bounds for any point
    # inside [tmin - cell, tmax + cell].
    gmin = tmin - 2.0 * cell
    dims = np.floor((tmax - gmin) / cell).astype(np.int64) + 3
    n_cells = int(np.prod(dims))
    if n_cells > _VORO_MAX_CELLS:
        return build_grid_nn(target, radius)

    n_cells_pad = _bucket_pow2(n_cells, 1024)
    ids = _voro_scatter(
        jnp.asarray(target), jnp.asarray(gmin, np.float32),
        jnp.asarray(dims.astype(np.int32)), jnp.float32(cell), n_cells_pad)

    m_pad = _bucket_pow2(max(m, 1), 256)
    tgt_pad = np.full((m_pad, 3), np.inf, np.float32)
    tgt_pad[:m] = target
    return VoroNN(
        target=tgt_pad,
        ids=ids,
        gmin=gmin.astype(np.float32),
        dims=dims.astype(np.int32),
        cell=cell,
        n_target=m,
    )


def _nn_query_voro(src, T, target, ids, gmin, dims, cell):
    """Approximate NN via the Voronoi field: 8 id gathers + 8 true-distance
    checks.  Returns (idx (N,), dist (N,)); inf where no candidate."""
    Tf = T.astype(jnp.float32)
    p = src @ Tf[:3, :3].T + Tf[:3, 3]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    tx, ty, tz = target[:, 0], target[:, 1], target[:, 2]
    rel = (p - gmin) / cell
    base = jnp.floor(rel - 0.5).astype(jnp.int32)
    n_cells = dims[0] * dims[1] * dims[2]
    i_last = ids.shape[0] - 1

    best_d2 = jnp.full(p.shape[0], jnp.inf, jnp.float32)
    best_i = jnp.full(p.shape[0], -1, jnp.int32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                c = base + jnp.asarray([dx, dy, dz], jnp.int32)
                ok = jnp.all((c >= 0) & (c < dims), axis=-1)
                lin = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
                lin = jnp.where(ok & (lin < n_cells), lin, 0)
                ti = ids[jnp.minimum(lin, i_last)]
                ok = ok & (ti >= 0)
                tis = jnp.maximum(ti, 0)
                d2 = ((px - tx[tis]) ** 2 + (py - ty[tis]) ** 2
                      + (pz - tz[tis]) ** 2)
                d2 = jnp.where(ok, d2, jnp.inf)
                better = d2 < best_d2
                best_d2 = jnp.where(better, d2, best_d2)
                best_i = jnp.where(better, tis, best_i)
    return best_i, jnp.sqrt(best_d2)


@partial(jax.jit, static_argnames=("max_occ",))
def _corr_reduce(
    src, T, target, order, starts, gmin, dims, cell, max_corr, n_src,
    max_occ: int,
):
    """One ICP data pass: masked correspondence statistics.

    Returns (n_inlier, sse, sum_s, sum_q, sum_sq outer (3,3)) — everything
    Kabsch needs, reduced on device.
    """
    idx, dist = _nn_query(
        src, T, target, order, starts, gmin, dims, cell, max_occ)
    npts = src.shape[0]
    in_src = jnp.arange(npts) < n_src
    inlier = in_src & (dist <= max_corr) & jnp.isfinite(dist)

    Tf = T.astype(jnp.float32)
    p = src @ Tf[:3, :3].T + Tf[:3, 3]  # transformed source
    q = target[jnp.maximum(idx, 0)]
    # Zero out masked rows BEFORE any arithmetic: padded rows are +inf and
    # inf * 0 = nan would poison the reductions.
    p = jnp.where(inlier[:, None], p, 0.0)
    q = jnp.where(inlier[:, None], q, 0.0)
    n_in = jnp.sum(inlier)
    sse = jnp.sum(jnp.where(inlier, dist ** 2, 0.0))
    sum_p = jnp.sum(p, axis=0)
    sum_q = jnp.sum(q, axis=0)
    outer = jnp.einsum("ni,nj->ij", p, q, preferred_element_type=jnp.float64)
    sum_ppT = jnp.einsum("ni,nj->ij", p, p, preferred_element_type=jnp.float64)
    return n_in, sse, sum_p.astype(jnp.float64), sum_q.astype(jnp.float64), outer, sum_ppT


def _horn_rotation(H):
    """Optimal rotation from a 3x3 cross-covariance via Horn's quaternion
    method: the max-eigenvector of a symmetric 4x4 (device-friendly —
    jnp.linalg.eigh on a 4x4 instead of a host SVD)."""
    S = H
    tr = S[0, 0] + S[1, 1] + S[2, 2]
    N = jnp.array(
        [
            [tr, S[1, 2] - S[2, 1], S[2, 0] - S[0, 2], S[0, 1] - S[1, 0]],
            [S[1, 2] - S[2, 1], 2 * S[0, 0] - tr, S[0, 1] + S[1, 0], S[0, 2] + S[2, 0]],
            [S[2, 0] - S[0, 2], S[0, 1] + S[1, 0], 2 * S[1, 1] - tr, S[1, 2] + S[2, 1]],
            [S[0, 1] - S[1, 0], S[0, 2] + S[2, 0], S[1, 2] + S[2, 1], 2 * S[2, 2] - tr],
        ]
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # (w, x, y, z), max eigenvalue
    w, x, y, z = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )
    return R


def _kabsch_loop(corr_stats, n_src, T0, relative_fitness, relative_rmse,
                 max_iteration):
    """Shared ICP driver: while_loop over {corr_stats -> Horn update ->
    convergence check} in one device launch, then a final stats pass at
    the converged transform.  `corr_stats(T)` returns the five masked
    correspondence moments (n_in, sse, sum_p, sum_q, outer); the query
    strategy (CSR grid / Voronoi field, flat / tiled) lives entirely in
    the closure."""

    def cond(carry):
        T, prev_f, prev_r, it, done = carry
        return (~done) & (it < max_iteration)

    def body(carry):
        T, prev_f, prev_r, it, _ = carry
        n_in, sse, sum_p, sum_q, outer = corr_stats(T)
        nf = jnp.maximum(n_in, 1).astype(jnp.float32)
        fitness = (n_in / jnp.maximum(n_src, 1)).astype(jnp.float32)
        rmse = jnp.sqrt(sse / nf).astype(jnp.float32)

        cp = sum_p / nf
        cq = sum_q / nf
        H = outer / nf - jnp.outer(cp, cq)
        R = _horn_rotation(H.astype(jnp.float64)).astype(jnp.float64)
        t = cq.astype(jnp.float64) - R @ cp.astype(jnp.float64)
        delta = jnp.eye(4, dtype=jnp.float64).at[:3, :3].set(R).at[:3, 3].set(t)
        T_new = jnp.where(n_in >= 3, delta @ T, T)

        converged = (
            (it > 0)
            & (jnp.abs(fitness - prev_f) < relative_fitness)
            & (jnp.abs(rmse - prev_r) < relative_rmse)
        )
        done = converged | (n_in < 3)
        return (T_new, fitness, rmse, it + 1, done)

    init = (
        T0.astype(jnp.float64),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.bool_(False),
    )
    T, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    n_in, sse, _, _, _ = corr_stats(T)
    fitness = (n_in / jnp.maximum(n_src, 1)).astype(jnp.float32)
    rmse = jnp.sqrt(
        sse / jnp.maximum(n_in, 1).astype(jnp.float32)
    ).astype(jnp.float32)
    return T, fitness, rmse, n_in


def _corr_stats_flat(query, src, n_src, target, max_corr):
    """Masked correspondence moments over one flat (N, 3) source array."""

    def corr_stats(T):
        idx, dist = query(src, T)
        npts = src.shape[0]
        in_src = jnp.arange(npts) < n_src
        inlier = in_src & (dist <= max_corr) & jnp.isfinite(dist)
        Tf = T.astype(jnp.float32)
        p = src @ Tf[:3, :3].T + Tf[:3, 3]
        q = target[jnp.maximum(idx, 0)]
        p = jnp.where(inlier[:, None], p, 0.0)
        q = jnp.where(inlier[:, None], q, 0.0)
        n_in = jnp.sum(inlier)
        sse = jnp.sum(jnp.where(inlier, dist ** 2, 0.0))
        return n_in, sse, jnp.sum(p, 0), jnp.sum(q, 0), p.T @ q

    return corr_stats


@partial(
    jax.jit,
    static_argnames=("max_occ", "max_iteration"),
)
def _icp_level_device(
    src, n_src, target, order, starts, gmin, dims, cell, max_corr, T0,
    relative_fitness, relative_rmse,
    max_occ: int, max_iteration: int,
):
    """Full point-to-point ICP at one pyramid level in ONE device launch:
    while_loop over {NN query -> masked moments -> Horn update -> convergence
    check}.  Avoids a host round trip per iteration."""
    query = partial(
        _nn_query, target=target, order=order, starts=starts, gmin=gmin,
        dims=dims, cell=cell, max_occ=max_occ)
    corr_stats = _corr_stats_flat(
        lambda s, T: query(s, T), src, n_src, target, max_corr)
    return _kabsch_loop(corr_stats, n_src, T0, relative_fitness,
                        relative_rmse, max_iteration)


@partial(jax.jit, static_argnames=("max_iteration",))
def _icp_level_device_voro(
    src, n_src, target, ids, gmin, dims, cell, max_corr, T0,
    relative_fitness, relative_rmse, max_iteration: int,
):
    """_icp_level_device with the Voronoi-field query (~32 gathers/point
    instead of 8 * max_occ * 4)."""
    corr_stats = _corr_stats_flat(
        lambda s, T: _nn_query_voro(s, T, target, ids, gmin, dims, cell),
        src, n_src, target, max_corr)
    return _kabsch_loop(corr_stats, n_src, T0, relative_fitness,
                        relative_rmse, max_iteration)


@dataclass
class RegistrationResult:
    transformation: np.ndarray
    fitness: float = 0.0
    inlier_rmse: float = 0.0
    n_correspondences: int = 0


@dataclass
class ICPConvergenceCriteria:
    max_iteration: int = 30
    relative_fitness: float = 1e-6
    relative_rmse: float = 1e-6


def _pad_src(points: np.ndarray) -> Tuple[np.ndarray, int]:
    n = len(points)
    n_pad = _bucket_pow2(max(n, 1), 256)
    out = np.full((n_pad, 3), np.inf, np.float32)
    out[:n] = points
    return out, n


def _stats(grid: GridNN, src_pad, n_src, T, max_corr):
    n_in, sse, sum_p, sum_q, outer, sum_ppT = _corr_reduce(
        jnp.asarray(src_pad), jnp.asarray(T), jnp.asarray(grid.target),
        jnp.asarray(grid.order), jnp.asarray(grid.starts),
        jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
        jnp.float32(grid.cell), jnp.float32(max_corr), jnp.asarray(n_src),
        grid.max_occ,
    )
    return (
        fetch_int(n_in), fetch_float(sse), fetch(sum_p), fetch(sum_q),
        fetch(outer), fetch(sum_ppT),
    )


def registration_icp(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence_distance: float,
    init: Optional[np.ndarray] = None,
    criteria: Optional[ICPConvergenceCriteria] = None,
    grid: Optional[GridNN] = None,
) -> RegistrationResult:
    """Point-to-point ICP (TransformationEstimationPointToPoint).

    The entire iteration loop runs in one device launch (_icp_level_device)."""
    criteria = criteria or ICPConvergenceCriteria()
    T = np.eye(4) if init is None else np.asarray(init, np.float64)
    if grid is None:
        grid = build_grid_nn(target, max_correspondence_distance)
    src_pad, n_src = _pad_src(np.asarray(source, np.float32))
    if n_src == 0 or grid.n_target == 0:
        return RegistrationResult(T)

    if isinstance(grid, VoroNN):
        T_out, fitness, rmse, n_in = _icp_level_device_voro(
            jnp.asarray(src_pad), jnp.asarray(n_src),
            jnp.asarray(grid.target), jnp.asarray(grid.ids),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell),
            jnp.float32(max_correspondence_distance),
            jnp.asarray(T, jnp.float64),
            jnp.float32(criteria.relative_fitness),
            jnp.float32(criteria.relative_rmse),
            max_iteration=int(criteria.max_iteration),
        )
        return RegistrationResult(
            fetch(T_out), fetch_float(fitness), fetch_float(rmse),
            fetch_int(n_in)
        )

    T_out, fitness, rmse, n_in = _icp_level_device(
        jnp.asarray(src_pad), jnp.asarray(n_src), jnp.asarray(grid.target),
        jnp.asarray(grid.order), jnp.asarray(grid.starts),
        jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
        jnp.float32(grid.cell), jnp.float32(max_correspondence_distance),
        jnp.asarray(T, jnp.float64),
        jnp.float32(criteria.relative_fitness), jnp.float32(criteria.relative_rmse),
        max_occ=grid.max_occ, max_iteration=int(criteria.max_iteration),
    )
    return RegistrationResult(
        fetch(T_out), fetch_float(fitness), fetch_float(rmse), fetch_int(n_in)
    )


def multi_scale_icp(
    source: np.ndarray,
    target: np.ndarray,
    voxel_sizes: List[float],
    criteria_list: List[ICPConvergenceCriteria],
    max_correspondence_distances: List[float],
    init_source_to_target: Optional[np.ndarray] = None,
) -> RegistrationResult:
    """Coarse-to-fine ICP over a voxel pyramid (o3d multi_scale_icp)."""
    T = np.eye(4) if init_source_to_target is None else np.asarray(init_source_to_target)
    result = RegistrationResult(T)
    for voxel, crit, max_corr in zip(voxel_sizes, criteria_list, max_correspondence_distances):
        src = voxel_down_sample(source, voxel) if voxel > 0 else source
        tgt = voxel_down_sample(target, voxel) if voxel > 0 else target
        result = registration_icp(src, tgt, max_corr, init=T, criteria=crit)
        T = result.transformation
    return result


def evaluate_registration(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence_distance: float,
    transformation: Optional[np.ndarray] = None,
) -> RegistrationResult:
    T = np.eye(4) if transformation is None else np.asarray(transformation, np.float64)
    grid = build_grid_nn(target, max_correspondence_distance)
    src_pad, n_src = _pad_src(np.asarray(source, np.float32))
    if n_src == 0 or grid.n_target == 0:
        return RegistrationResult(T)
    n_in, sse, *_ = _stats(grid, src_pad, n_src, T, max_correspondence_distance)
    return RegistrationResult(
        T, n_in / n_src, float(np.sqrt(sse / n_in)) if n_in else 0.0, n_in
    )


def get_information_matrix(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence_distance: float,
    transformation: np.ndarray,
    grid: Optional[GridNN] = None,
) -> np.ndarray:
    """Sum G^T G over corresponding target points (o3d
    GetInformationMatrixFromPointClouds semantics)."""
    if grid is None:
        grid = build_grid_nn(target, max_correspondence_distance)
    src_pad, n_src = _pad_src(np.asarray(source, np.float32))
    if n_src == 0 or grid.n_target == 0:
        return np.eye(6)
    if isinstance(grid, VoroNN):
        idx, dist = _nn_query_voro(
            jnp.asarray(src_pad), jnp.asarray(transformation),
            jnp.asarray(grid.target), jnp.asarray(grid.ids),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell),
        )
    else:
        idx, dist = _nn_query(
            jnp.asarray(src_pad), jnp.asarray(transformation),
            jnp.asarray(grid.target),
            jnp.asarray(grid.order), jnp.asarray(grid.starts),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell), grid.max_occ,
        )
    idx = np.asarray(idx)
    dist = np.asarray(dist)
    inlier = (dist <= max_correspondence_distance) & np.isfinite(dist)
    inlier[n_src:] = False
    q = np.asarray(grid.target)[np.maximum(idx, 0)][inlier].astype(np.float64)
    if len(q) == 0:
        return np.eye(6)
    G = np.zeros((len(q), 3, 6))
    G[:, 0, 1] = q[:, 2]
    G[:, 0, 2] = -q[:, 1]
    G[:, 0, 3] = 1.0
    G[:, 1, 0] = -q[:, 2]
    G[:, 1, 2] = q[:, 0]
    G[:, 1, 4] = 1.0
    G[:, 2, 0] = q[:, 1]
    G[:, 2, 1] = -q[:, 0]
    G[:, 2, 5] = 1.0
    return np.einsum("nri,nrj->ij", G, G)


@partial(jax.jit, static_argnames=("max_occ",))
def _info_stats_device(
    src, n_src, T, target, order, starts, gmin, dims, cell, max_corr,
    max_occ: int,
):
    """Inlier-masked reductions for the information matrix: (n, Σq, Σqqᵀ).

    Sum Gᵀ G has the closed form [[|q|²I − qqᵀ, skew(q)], [skew(q)ᵀ, I]]
    summed over target inliers q, so only these three masked reductions
    are needed — no (N, 3, 6) Jacobian materializes, and the qᵀq matmul
    is MXU work."""
    idx, dist = _nn_query(
        src, T, target, order, starts, gmin, dims, cell, max_occ)
    npts = src.shape[0]
    inlier = (
        (dist <= max_corr) & jnp.isfinite(dist) & (jnp.arange(npts) < n_src)
    )
    q = target[jnp.maximum(idx, 0)]
    q = jnp.where(inlier[:, None], q, 0.0)
    return inlier.sum(), q.sum(axis=0), q.T @ q


_info_stats_vmapped = jax.jit(
    jax.vmap(
        _info_stats_device,
        in_axes=(0, 0, 0, None, None, None, None, None, None, None, None),
    ),
    static_argnums=(10,),
)


@jax.jit
def _info_stats_device_voro(
    src, n_src, T, target, ids, gmin, dims, cell, max_corr,
):
    """_info_stats_device over the discrete-Voronoi nearest-id field:
    ~8 id gathers + 8 distance checks per point instead of the CSR scan's
    27 cells x max_occ — the difference between ~22 min and ~40 s for the
    scene pose-graph information matrices at production fragment sizes.
    Correspondences are the field's near-tie-approximate NN with an exact
    distance gate (see VoroNN docstring); the 6x6 moments perturb by well
    under 1% (tests/test_icp.py bounds it)."""
    idx, dist = _nn_query_voro(src, T, target, ids, gmin, dims, cell)
    npts = src.shape[0]
    inlier = (
        (dist <= max_corr) & jnp.isfinite(dist) & (jnp.arange(npts) < n_src)
    )
    q = target[jnp.maximum(idx, 0)]
    q = jnp.where(inlier[:, None], q, 0.0)
    return inlier.sum(), q.sum(axis=0), q.T @ q


_info_stats_voro_vmapped = jax.jit(
    jax.vmap(
        _info_stats_device_voro,
        in_axes=(0, 0, 0, None, None, None, None, None, None),
    ),
)


def _assemble_info(n: float, s: np.ndarray, S: np.ndarray) -> np.ndarray:
    if n == 0:
        return np.eye(6)
    s = np.asarray(s, np.float64)
    S = np.asarray(S, np.float64)
    skew_s = np.array(
        [[0.0, -s[2], s[1]], [s[2], 0.0, -s[0]], [-s[1], s[0], 0.0]]
    )
    info = np.zeros((6, 6))
    info[:3, :3] = np.trace(S) * np.eye(3) - S
    # Host-oracle G = [skew(q)ᵀ | I], so the off-diagonal blocks are
    # Σ skew(q) = skew(Σq) up top and its transpose below.
    info[:3, 3:] = skew_s
    info[3:, :3] = skew_s.T
    info[3:, 3:] = float(n) * np.eye(3)
    return info


def get_information_matrix_batch(
    sources,
    grid: GridNN,
    max_correspondence_distance: float,
    transformations,
):
    """Information matrices for many pairs sharing one TARGET grid, in one
    (chunked) device launch — replaces the per-pair get_information_matrix
    dispatch loop on the O(F²) scene pose-graph path.  `grid` is either the
    exact CSR GridNN or the discrete-Voronoi VoroNN field (~30x fewer
    gathers; default on the pipeline path via
    FragmentPoseRefinementConfig.exact_information_matrices=False).
    Returns a list of (6, 6) float64 arrays with the same semantics as the
    single-pair op."""
    B = len(sources)
    if B == 0:
        return []
    if grid.n_target == 0:
        return [np.eye(6)] * B
    voro = isinstance(grid, VoroNN)

    src_pads = [_pad_src(np.asarray(s, np.float32)) for s in sources]
    n_pad = max(s.shape[0] for s, _ in src_pads)
    # Above the vmap per-lane width limit (see _VMAP_SRC_PAD_LIMIT), each
    # source splits into tiles that become extra batch entries — the info
    # moments are plain sums, so per-pair results are the sum over its
    # tiles' results.
    n_tiles = max((n_pad + _VMAP_SRC_PAD_LIMIT - 1)
                  // _VMAP_SRC_PAD_LIMIT, 1)
    width = min(n_pad, _VMAP_SRC_PAD_LIMIT)

    src = np.full((B, n_tiles * width, 3), np.inf, np.float32)
    n_src = np.zeros((B,), np.int32)
    for j, (sp, n) in enumerate(src_pads):
        src[j, : sp.shape[0]] = sp
        n_src[j] = n
    T = np.stack([np.asarray(t, np.float64) for t in transformations])

    # Tile view: (B*n_tiles, width, 3) with per-tile n_src offsets.
    src_t = src.reshape(B * n_tiles, width, 3)
    bases = np.tile(np.arange(n_tiles, dtype=np.int32) * width, B)
    n_src_t = np.clip(np.repeat(n_src, n_tiles) - bases, 0, width)
    T_t = np.repeat(T, n_tiles, axis=0)

    if voro:
        n_in, s_sum, S_sum = _info_stats_voro_vmapped(
            jnp.asarray(src_t), jnp.asarray(n_src_t), jnp.asarray(T_t),
            jnp.asarray(grid.target), jnp.asarray(grid.ids),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell),
            jnp.float32(max_correspondence_distance),
        )
    else:
        n_in, s_sum, S_sum = _info_stats_vmapped(
            jnp.asarray(src_t), jnp.asarray(n_src_t), jnp.asarray(T_t),
            jnp.asarray(grid.target), jnp.asarray(grid.order),
            jnp.asarray(grid.starts),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell), jnp.float32(max_correspondence_distance),
            grid.max_occ,
        )
    n_in = np.asarray(n_in).reshape(B, n_tiles).sum(1)
    s_sum = np.asarray(s_sum).reshape(B, n_tiles, 3).sum(1)
    S_sum = np.asarray(S_sum).reshape(B, n_tiles, 3, 3).sum(1)
    return [
        _assemble_info(int(n_in[j]), s_sum[j], S_sum[j]) for j in range(B)
    ]


# ---------------------------------------------------------------------------
# Batched / multi-chip pair ICP
# ---------------------------------------------------------------------------

_icp_level_vmapped = jax.jit(
    jax.vmap(
        _icp_level_device,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
    ),
    static_argnums=(12, 13),
)


def _stack_pairs(sources, grids, max_corrs, inits, criteria):
    """Pad B heterogeneous (source, GridNN) pairs to common device shapes.

    Per-pair pads are already pow2-bucketed, so the common max rarely
    expands anything; CSR `starts` pads fill with each grid's own point
    count (empty trailing cells) and targets pad with +inf (masked by
    distance)."""
    B = len(sources)

    src_pads = [_pad_src(np.asarray(s, np.float32)) for s in sources]
    n_pad = max(s.shape[0] for s, _ in src_pads)
    m_pad = max(g.target.shape[0] for g in grids)
    o_pad = max(g.order.shape[0] for g in grids)
    s_pad = max(g.starts.shape[0] for g in grids)
    max_occ = max(g.max_occ for g in grids)

    src = np.full((B, n_pad, 3), np.inf, np.float32)
    n_src = np.zeros((B,), np.int32)
    target = np.full((B, m_pad, 3), np.inf, np.float32)
    order = np.zeros((B, o_pad), np.int32)
    starts = np.zeros((B, s_pad), np.int32)
    gmin = np.zeros((B, 3), np.float32)
    dims = np.ones((B, 3), np.int32)
    cell = np.ones((B,), np.float32)
    for i, ((s, n), g) in enumerate(zip(src_pads, grids)):
        src[i, : s.shape[0]] = s
        n_src[i] = n
        target[i, : g.target.shape[0]] = g.target
        order[i, : g.order.shape[0]] = g.order
        # Pad trailing cells as empty (start = end = n_target); queries
        # only reach them for out-of-grid cells, which mask anyway.
        starts[i] = g.n_target
        starts[i, : g.starts.shape[0]] = g.starts
        gmin[i] = g.gmin
        dims[i] = g.dims
        cell[i] = g.cell

    T0 = np.stack([np.eye(4) if t is None else np.asarray(t, np.float64)
                   for t in inits])
    rel_f = np.asarray([c.relative_fitness for c in criteria], np.float32)
    rel_r = np.asarray([c.relative_rmse for c in criteria], np.float32)
    return (src, n_src, target, order, starts, gmin, dims, cell,
            np.asarray(max_corrs, np.float32), T0, rel_f, rel_r, max_occ)


def registration_icp_batch(
    sources,
    grids,
    max_corrs,
    inits=None,
    criteria=None,
    mesh=None,
    axis: str = "pairs",
):
    """Run B independent point-to-point ICPs in one launch (vmapped
    while_loop — numerically identical to per-pair registration_icp).

    With `mesh`, the pair axis shards over the device mesh via shard_map
    (pairs pad to a device multiple; padded lanes carry n_src=0 and retire
    on iteration one).  This is the multi-chip path for the O(F^2)
    fragment-pair refinement (reference refine_fragment_poses.py:122-193,
    which runs pairs serially on the host)."""
    B = len(sources)
    if B == 0:
        return []
    inits = inits if inits is not None else [None] * B
    criteria = criteria if criteria is not None else [
        ICPConvergenceCriteria() for _ in range(B)
    ]
    max_iter = max(int(c.max_iteration) for c in criteria)

    packed = _stack_pairs(sources, grids, max_corrs, inits, criteria)
    max_occ = packed[-1]
    arrays = [np.asarray(a) for a in packed[:-1]]

    n_dev = 1 if mesh is None else int(np.prod([mesh.devices.size]))
    B_pad = ((B + n_dev - 1) // n_dev) * n_dev
    if B_pad != B:
        arrays = [
            np.concatenate([a, np.repeat(a[-1:], B_pad - B, axis=0)])
            for a in arrays
        ]
        arrays[1] = arrays[1].copy()
        arrays[1][B:] = 0  # n_src = 0 -> immediate retirement

    if mesh is None:
        out = _icp_level_vmapped(*map(jnp.asarray, arrays), max_occ,
                                 max_iter)
    else:
        from jax.sharding import PartitionSpec as P

        def run(*a):
            return jax.vmap(
                _icp_level_device, in_axes=(0,) * 12 + (None, None)
            )(*a, max_occ, max_iter)

        sharded = jax.jit(
            jax.shard_map(
                run,
                mesh=mesh,
                in_specs=tuple(P(axis) for _ in arrays),
                out_specs=P(axis),
                check_vma=False,
            )
        )
        out = sharded(*map(jnp.asarray, arrays))

    T, fitness, rmse, n_in = (np.asarray(o) for o in out)
    return [
        RegistrationResult(T[i], float(fitness[i]), float(rmse[i]),
                           int(n_in[i]))
        for i in range(B)
    ]


_icp_level_vmapped_shared = jax.jit(
    jax.vmap(
        _icp_level_device,
        in_axes=(0, 0, None, None, None, None, None, None, 0, 0, 0, 0,
                 None, None),
    ),
    static_argnums=(12, 13),
)

# Largest source pad the vmapped shared-grid executable survives on the
# installed TPU runtime: bisected to [131072 ok, 262144 kernel-faults the
# worker] at any batch size — the per-LANE width is what trips it, not
# the batch.  Above the limit the batched path runs _icp_level_device_
# tiled, whose per-lane shapes stay at the tile size (a lax.scan over
# source tiles accumulates the same correspondence moments), so
# production-size pair refinement stays batched instead of falling back
# to one launch per pair.
_VMAP_SRC_PAD_LIMIT = 131072


def _corr_stats_tiled(query, src_tiles, n_src, target, max_corr):
    """Correspondence moments with the source axis tiled: every array op
    is (TILE,)-shaped, a scan accumulates the five moments across tiles.
    Numerically the same Kabsch update as the flat pass (summation order
    differs across tiles; fitness/rmse agree to f32 rounding)."""
    n_tiles, TILE, _ = src_tiles.shape

    def corr_stats(T):
        Tf = T.astype(jnp.float32)

        def tile(carry, args):
            src_t, base = args
            idx, dist = query(src_t, T)
            in_src = (jnp.arange(TILE) + base) < n_src
            inlier = in_src & (dist <= max_corr) & jnp.isfinite(dist)
            p = src_t @ Tf[:3, :3].T + Tf[:3, 3]
            q = target[jnp.maximum(idx, 0)]
            p = jnp.where(inlier[:, None], p, 0.0)
            q = jnp.where(inlier[:, None], q, 0.0)
            n_in, sse, sum_p, sum_q, outer = carry
            # Explicit casts: x64 is enabled package-wide, so bare sums
            # would widen and break the scan carry typing.
            return (
                n_in + jnp.sum(inlier).astype(jnp.int32),
                sse + jnp.sum(jnp.where(inlier, dist ** 2, 0.0))
                .astype(jnp.float32),
                sum_p + jnp.sum(p, 0).astype(jnp.float32),
                sum_q + jnp.sum(q, 0).astype(jnp.float32),
                outer + (p.T @ q).astype(jnp.float32),
            ), None

        z3 = jnp.zeros((3,), jnp.float32)
        init = (jnp.int32(0), jnp.float32(0.0), z3, z3,
                jnp.zeros((3, 3), jnp.float32))
        bases = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
        out, _ = jax.lax.scan(tile, init, (src_tiles, bases))
        return out

    return corr_stats


@partial(jax.jit, static_argnames=("max_occ", "max_iteration"))
def _icp_level_device_tiled(
    src_tiles,  # (n_tiles, TILE, 3) f32, inf-padded
    n_src, target, order, starts, gmin, dims, cell, max_corr, T0,
    relative_fitness, relative_rmse,
    max_occ: int, max_iteration: int,
):
    """_icp_level_device with the source axis tiled (see
    _corr_stats_tiled)."""
    corr_stats = _corr_stats_tiled(
        lambda s, T: _nn_query(s, T, target, order, starts, gmin, dims,
                               cell, max_occ),
        src_tiles, n_src, target, max_corr)
    return _kabsch_loop(corr_stats, n_src, T0, relative_fitness,
                        relative_rmse, max_iteration)


@partial(jax.jit, static_argnames=("max_iteration",))
def _icp_level_device_voro_tiled(
    src_tiles, n_src, target, ids, gmin, dims, cell, max_corr, T0,
    relative_fitness, relative_rmse, max_iteration: int,
):
    """Tiled ICP level with the Voronoi-field query."""
    corr_stats = _corr_stats_tiled(
        lambda s, T: _nn_query_voro(s, T, target, ids, gmin, dims, cell),
        src_tiles, n_src, target, max_corr)
    return _kabsch_loop(corr_stats, n_src, T0, relative_fitness,
                        relative_rmse, max_iteration)


_icp_level_vmapped_shared_tiled = jax.jit(
    jax.vmap(
        _icp_level_device_tiled,
        in_axes=(0, 0, None, None, None, None, None, None, 0, 0, 0, 0,
                 None, None),
    ),
    static_argnums=(12, 13),
)

_icp_level_vmapped_voro = jax.jit(
    jax.vmap(
        _icp_level_device_voro,
        in_axes=(0, 0, None, None, None, None, None, 0, 0, 0, 0, None),
    ),
    static_argnums=(11,),
)

_icp_level_vmapped_voro_tiled = jax.jit(
    jax.vmap(
        _icp_level_device_voro_tiled,
        in_axes=(0, 0, None, None, None, None, None, 0, 0, 0, 0, None),
    ),
    static_argnums=(11,),
)


def registration_icp_batch_shared(
    sources,
    grid: GridNN,
    max_corrs,
    inits=None,
    criteria=None,
    max_stack_bytes: int = 256 * 1024 * 1024,
):
    """Batched ICP for pairs sharing one TARGET grid: the grid stays
    un-stacked on device (one copy regardless of batch size) and only the
    sources batch.  This is the memory-safe shape for the O(F^2) fragment
    pairs, where each target fragment serves ~F sources and a stacked
    per-pair grid table (100+ MB each at fine pyramid levels) OOMs HBM.

    Sources chunk by stacked bytes so device residency stays bounded."""
    B = len(sources)
    if B == 0:
        return []
    inits = inits if inits is not None else [None] * B
    criteria = criteria if criteria is not None else [
        ICPConvergenceCriteria() for _ in range(B)
    ]

    src_pads = [_pad_src(np.asarray(s, np.float32)) for s in sources]
    n_pad = max(s.shape[0] for s, _ in src_pads)

    # Above the vmap per-lane width limit (see _VMAP_SRC_PAD_LIMIT), the
    # batched path switches to the source-tiled executable: same Kabsch
    # loop, per-lane shapes held at the tile size by a scan over tiles.
    tiled = n_pad > _VMAP_SRC_PAD_LIMIT
    if tiled:
        n_pad = ((n_pad + _VMAP_SRC_PAD_LIMIT - 1)
                 // _VMAP_SRC_PAD_LIMIT) * _VMAP_SRC_PAD_LIMIT

    per_src_bytes = n_pad * 3 * 4
    chunk = max(int(max_stack_bytes // max(per_src_bytes, 1)), 1)

    voro = isinstance(grid, VoroNN)
    tgt = jnp.asarray(grid.target)
    if voro:
        ids = jnp.asarray(grid.ids)
    else:
        order = jnp.asarray(grid.order)
        starts = jnp.asarray(grid.starts)
    gmin = jnp.asarray(grid.gmin)
    dims = jnp.asarray(grid.dims)

    out: list = []
    for s0 in range(0, B, chunk):
        idxs = range(s0, min(s0 + chunk, B))
        bs = len(idxs)
        src = np.full((bs, n_pad, 3), np.inf, np.float32)
        n_src = np.zeros((bs,), np.int32)
        for j, i in enumerate(idxs):
            sp, n = src_pads[i]
            src[j, : sp.shape[0]] = sp
            n_src[j] = n
        T0 = np.stack([
            np.eye(4) if inits[i] is None else np.asarray(inits[i],
                                                          np.float64)
            for i in idxs])
        rel_f = np.asarray([criteria[i].relative_fitness for i in idxs],
                           np.float32)
        rel_r = np.asarray([criteria[i].relative_rmse for i in idxs],
                           np.float32)
        mc = np.asarray([max_corrs[i] for i in idxs], np.float32)
        max_iter = max(int(criteria[i].max_iteration) for i in idxs)

        if tiled:
            src_in = src.reshape(bs, n_pad // _VMAP_SRC_PAD_LIMIT,
                                 _VMAP_SRC_PAD_LIMIT, 3)
        else:
            src_in = src
        if voro:
            runner = (_icp_level_vmapped_voro_tiled if tiled
                      else _icp_level_vmapped_voro)
            T, fitness, rmse, n_in = runner(
                jnp.asarray(src_in), jnp.asarray(n_src), tgt, ids,
                gmin, dims, jnp.float32(grid.cell), jnp.asarray(mc),
                jnp.asarray(T0), jnp.asarray(rel_f), jnp.asarray(rel_r),
                max_iter)
        else:
            runner = (_icp_level_vmapped_shared_tiled if tiled
                      else _icp_level_vmapped_shared)
            T, fitness, rmse, n_in = runner(
                jnp.asarray(src_in), jnp.asarray(n_src), tgt, order, starts,
                gmin, dims,
                jnp.float32(grid.cell), jnp.asarray(mc), jnp.asarray(T0),
                jnp.asarray(rel_f), jnp.asarray(rel_r),
                grid.max_occ, max_iter)
        T, fitness, rmse, n_in = (np.asarray(x)
                                  for x in (T, fitness, rmse, n_in))
        out.extend(
            RegistrationResult(T[j], float(fitness[j]), float(rmse[j]),
                               int(n_in[j]))
            for j in range(bs))
    return out

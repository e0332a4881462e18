"""Multi-chip TSDF integration: frames data-parallel over a jax Mesh.

The reference's only concurrency is host process pools (reference:
scripts/utils/paralell_utils.py:6-69); the TPU-native scaling axis is SPMD
over ICI.  TSDF fusion is an exact data-parallel reduction because the
Open3D update rule tsdf' = (tsdf*w + obs)/(w+1) is an unweighted running
mean of observations:

  * allocation:  per-device touched-block sets union via `psum` (a set
    union is a commutative max/sum) -> every device derives an *identical*
    slot table with the same prefix-sum, no coordination needed;
  * integration: each device accumulates (sum_obs, count) for its frame
    shard over the shared slot table; one `psum` merges the shards exactly.

Collectives ride the ICI mesh axis; nothing is host-mediated.  The same
function runs single-chip (mesh of 1) and is exercised on a virtual CPU
mesh in tests and by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mq3d_tpu.ops.tsdf import (
    TSDFConfig,
    TSDFState,
    _alloc_and_window,
    _frame_touch_grid,
    _integrate_pairs,
    _merge_window,
    _pairs_from_grid,
    create_state,
)


def padded_rows(cfg: TSDFConfig, n_dev: int) -> int:
    """Voxel-table row count for the partitioned state: cap+1 (sentinel)
    rounded up to a device multiple so the block axis shards evenly."""
    cap1 = cfg.block_count + 1
    return ((cap1 + n_dev - 1) // n_dev) * n_dev


def create_state_partitioned(cfg: TSDFConfig, mesh: Mesh,
                             axis: str = "data") -> TSDFState:
    """TSDFState whose tsdf/weight rows are sharded over the mesh block
    axis (extra pad rows beyond the sentinel are never addressed)."""
    from jax.sharding import NamedSharding

    n_dev = int(mesh.devices.size)
    rows = padded_rows(cfg, n_dev)
    base = create_state(cfg)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def grow(a):
        pad = jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
        return jax.device_put(jnp.concatenate([a, pad]), shard)

    return TSDFState(
        slot_table=jax.device_put(base.slot_table, repl),
        block_coords=jax.device_put(base.block_coords, repl),
        tsdf=grow(base.tsdf),
        weight=grow(base.weight),
        n_active=jax.device_put(base.n_active, repl),
        overflow=jax.device_put(base.overflow, repl),
        dropped_active=jax.device_put(base.dropped_active, repl),
    )


def sharded_integrate_step(cfg: TSDFConfig, mesh: Mesh, axis: str = "data",
                           partition_state: bool = False):
    """Build a pjit-able one-step function: (state, frame shard) -> state.

    Frames shard over `axis`.  With partition_state=False the TSDF state is
    replicated and merged with full psums.  With partition_state=True the
    voxel tables (tsdf/weight) live SHARDED over the block axis and the
    observation sums merge with psum_scatter (reduce_scatter): half the
    collective bytes of the all-reduce and 1/n_dev of the per-device state
    HBM — use create_state_partitioned() for the initial state.
    """
    G3 = cfg.grid_dim ** 3
    cap = cfg.block_count
    M = cfg.chunk_active_capacity
    n_dev = int(mesh.devices.size)
    rows = padded_rows(cfg, n_dev) if partition_state else cap + 1
    rows_local = rows // n_dev

    def step_local(state: TSDFState, depth, intrinsics, T_wc, frame_valid):
        C = depth.shape[0]  # local frames per device
        depth = depth.astype(jnp.float32)
        T_wc = T_wc.astype(jnp.float32)
        T_cw = jnp.linalg.inv(T_wc)

        # ---- allocation: local touched sets -> global union (psum) ---------
        # Same phase helpers as the single-chip kernel (ops/tsdf.py); the
        # touch grids stay per-frame LOCAL (gating integration like the
        # single-chip path, so sharded == per-frame exactly) and only the
        # chunk union crosses devices.
        frame_touched = _frame_touch_grid(
            cfg, depth, intrinsics, T_cw, frame_valid)
        touched_local = jnp.max(
            frame_touched.reshape(C, G3 + 1), axis=0)[:G3].astype(jnp.int32)
        touched = jax.lax.psum(touched_local, axis)  # union (count>0 == any)

        (slot_table, block_coords, n_active, overflow, dropped_active,
         active_slots, wkeys, _n_act) = _alloc_and_window(
            cfg, state, touched, jnp.int32(0))

        # ---- local integration over the frame shard's pairs -----------------
        pair_codes, n_pairs = _pairs_from_grid(
            cfg, frame_touched, wkeys, active_slots < cap, C)
        sums, cnts = _integrate_pairs(
            cfg, depth, intrinsics, T_wc, block_coords, active_slots,
            pair_codes, n_pairs)

        # ---- exact cross-device merge ---------------------------------------
        # The accumulators are WINDOW-LOCAL (M+1, R^3) — the collective moves
        # ~200 MB instead of reducing the full 50k-row voxel tables (the
        # round-4 sharded path psum_scattered 819 MB per step and ran 6x
        # slower than single-chip at production shape on a mesh of 1).
        sums = jax.lax.psum(sums, axis)
        cnts = jax.lax.psum(cnts, axis)

        if partition_state:
            # Each device folds the window rows it owns into its local
            # voxel-table shard.
            row0 = jax.lax.axis_index(axis) * rows_local
            in_rng = (active_slots >= row0) & (active_slots < row0 + rows_local)
            valid = in_rng & (active_slots < cap)
            loc = jnp.where(valid, active_slots - row0, rows_local)
            loc_safe = jnp.minimum(loc, rows_local - 1)
            t_old = state.tsdf[loc_safe]
            w_old = state.weight[loc_safe]
            s = sums[:M]
            c = cnts[:M]
            new_w_rows = w_old + c
            new_t_rows = jnp.where(
                c > 0, (t_old * w_old + s) / jnp.maximum(new_w_rows, 1.0),
                t_old)
            new_t = state.tsdf.at[loc].set(
                jnp.where(valid[:, None], new_t_rows, t_old), mode="drop")
            new_w = state.weight.at[loc].set(
                jnp.where(valid[:, None], new_w_rows, w_old), mode="drop")
        else:
            new_t, new_w = _merge_window(
                cfg, state.tsdf, state.weight, active_slots, sums, cnts)
        return TSDFState(
            slot_table, block_coords, new_t, new_w, n_active, overflow,
            dropped_active,
        )

    if partition_state:
        state_spec = TSDFState(
            slot_table=P(), block_coords=P(), tsdf=P(axis), weight=P(axis),
            n_active=P(), overflow=P(), dropped_active=P(),
        )
    else:
        state_spec = P()
    sharded = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(
            state_spec,
            P(axis),  # depth
            P(axis),  # intrinsics
            P(axis),  # extrinsics
            P(axis),  # frame_valid
        ),
        out_specs=state_spec,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def sharded_confidence_step(mesh: Mesh, axis: str = "data"):
    """Multi-chip confidence estimation: the reference-frame batch shards
    over the mesh (each device computes its refs against the replicated
    frame stack); outputs concatenate along the batch axis.

    Usage: fn = sharded_confidence_step(mesh); fn(depth, K, T_cw, T_wc,
    valid, refs, depth_max=..., error_threshold=..., window=...) with
    len(refs) divisible by the mesh size.
    """
    from functools import partial as _partial

    from mq3d_tpu.recon.confidence import confidence_for_refs

    def build(depth_max: float, error_threshold: float, window: int):
        local = _partial(
            confidence_for_refs,
            depth_max=depth_max,
            error_threshold=error_threshold,
            window=window,
        )

        def step_local(depth, K, T_cw, T_wc, valid, refs):
            return local(depth, K, T_cw, T_wc, valid, refs)

        return jax.jit(
            jax.shard_map(
                step_local,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )
        )

    return build


# Jitted shard_map renderers keyed on their static configuration (see
# sharded_raycast_batch).
_RAYCAST_EXECUTABLES: dict = {}


def sharded_raycast_batch(
    volume,
    mesh: Mesh,
    intrinsics: np.ndarray,  # (F, 3, 3), cx already mirror-flipped
    extrinsics_wc: np.ndarray,  # (F, 4, 4)
    width: int,
    height: int,
    axis: str = "data",
    t_min: float = 0.05,
    t_max: float | None = None,
    edge_eps: float = 1e-3,
):
    """Multi-chip color-aligned depth raycast: frames data-parallel over
    the mesh (reference renders frames serially through one Embree scene,
    o3d_utils.py:324-341).

    The scene tables (slot_dist/ext/AABB) replicate — they are read-only
    and a fraction of HBM — and each device runs the full coherent
    pyramid on its own frame shard with a PER-DEVICE edge cap, so the
    edge compaction (cumsum + scatter) stays chip-local and no
    cross-chip gathers are emitted.  Only the scalar overflow count is
    psum'd.  Bitwise identical to the single-chip render of the same
    frames when no edge budget overflows (each pixel's march is
    independent; the cap only bounds how many march).

    Returns ((F, height, width) z-depth, total overflow count).
    """
    from mq3d_tpu.ops.raycast import _prep_cache, _render_frames

    cfg = volume.cfg
    t_max_v = t_max if t_max is not None else cfg.depth_max * 1.5
    slot_dist, ext, aabb, n_bucket = _prep_cache.get(volume)
    n_dev = mesh.devices.size
    F = intrinsics.shape[0]
    if F % n_dev:
        raise ValueError(f"frame count {F} not divisible by mesh size {n_dev}")
    T_cw = np.linalg.inv(np.asarray(extrinsics_wc, np.float64)).astype(
        np.float32)
    edge_cap = max((F // n_dev) * width * height // 16, 4096)

    # One jitted executable per static configuration: rebuilding the
    # shard_map closure per call would re-trace the full pyramid render
    # program every time (the persistent XLA cache absorbs the re-compile
    # but not the re-trace/lower).
    key = (cfg, mesh, axis, n_bucket, width, height, edge_cap,
           float(t_min), float(t_max_v), float(edge_eps))
    fn = _RAYCAST_EXECUTABLES.get(key)
    if fn is None:
        def local(sd, e, ab, K_l, R_l, o_l):
            z, overflow = _render_frames(
                cfg, sd, e, ab, n_bucket, K_l, R_l, o_l,
                jnp.float32(t_min), jnp.float32(t_max_v),
                width, height, edge_cap, jnp.float32(edge_eps),
            )
            return z, jax.lax.psum(overflow, axis)

        fn = jax.jit(jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
        ))
        _RAYCAST_EXECUTABLES[key] = fn
    z, overflow = fn(
        slot_dist, ext, aabb,
        jnp.asarray(np.asarray(intrinsics, np.float32)),
        jnp.asarray(T_cw[:, :3, :3]),
        jnp.asarray(np.ascontiguousarray(T_cw[:, :3, 3])),
    )
    return np.asarray(z), int(np.asarray(overflow))


def integrate_dataset_sharded(
    cfg: TSDFConfig,
    mesh: Mesh,
    depth: np.ndarray,  # (N, H, W), N divisible by mesh size * chunk
    intrinsics: np.ndarray,
    extrinsics_wc: np.ndarray,
    frame_valid: np.ndarray,
    frames_per_device_chunk: int = 8,
) -> TSDFState:
    """Convenience driver: chunk a whole dataset through the sharded step."""
    n_dev = mesh.devices.size
    step = sharded_integrate_step(cfg, mesh)
    state = create_state(cfg)

    chunk = n_dev * frames_per_device_chunk
    n = depth.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        pad = n_pad - n
        depth = np.concatenate([depth, np.zeros((pad,) + depth.shape[1:], np.float32)])
        intrinsics = np.concatenate(
            [intrinsics, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))]
        )
        extrinsics_wc = np.concatenate(
            [extrinsics_wc, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))]
        )
        frame_valid = np.concatenate([frame_valid, np.zeros(pad, bool)])

    for s in range(0, n_pad, chunk):
        state = step(
            state,
            jnp.asarray(depth[s : s + chunk], jnp.float32),
            jnp.asarray(intrinsics[s : s + chunk], jnp.float32),
            jnp.asarray(extrinsics_wc[s : s + chunk], jnp.float32),
            jnp.asarray(frame_valid[s : s + chunk]),
        )
    return state

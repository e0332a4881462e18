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
    _block_keys,
    _keys_to_coords,
    _voxel_offsets,
    create_state,
)


def _local_alloc_keys(cfg: TSDFConfig, depth, intrinsics, T_cw, frame_valid):
    """Candidate block keys for a local frame shard: (n_keys,) int32 with
    sentinel G^3 for invalid."""
    C, H, W = depth.shape
    G = cfg.grid_dim
    ds = cfg.alloc_pixel_stride
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]

    d_sub = depth[:, ::ds, ::ds]
    u = (jnp.arange(0, W, ds, dtype=jnp.float32))[None, None, :]
    v = (jnp.arange(0, H, ds, dtype=jnp.float32))[None, :, None]
    valid_px = (d_sub > 0) & (d_sub <= cfg.depth_max) & frame_valid[:, None, None]
    pc = jnp.stack([(u - cx) / fx * d_sub, (v - cy) / fy * d_sub, d_sub], axis=-1)
    Rcw = T_cw[:, :3, :3]
    tcw = T_cw[:, :3, 3]
    pw = jnp.einsum("cij,chwj->chwi", Rcw, pc) + tcw[:, None, None, :]

    offs = jnp.asarray(
        np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"), -1)
        .reshape(-1, 3)
        .astype(np.float32)
        * cfg.trunc
    )
    cand = pw[:, :, :, None, :] + offs[None, None, None, :, :]
    bcoord = jnp.floor(cand / cfg.block_size).astype(jnp.int32)
    keys = _block_keys(bcoord, G)
    return jnp.where(valid_px[..., None], keys, G ** 3).reshape(-1)


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
    G = cfg.grid_dim
    R = cfg.block_resolution
    cap = cfg.block_count
    n_dev = int(mesh.devices.size)
    rows = padded_rows(cfg, n_dev) if partition_state else cap + 1
    rows_local = rows // n_dev
    voxel_offs = jnp.asarray(_voxel_offsets(R))

    def step_local(state: TSDFState, depth, intrinsics, T_wc, frame_valid):
        C = depth.shape[0]  # local frames per device
        T_cw = jnp.linalg.inv(T_wc.astype(jnp.float32))

        # ---- allocation: local touched set -> global union (psum) ----------
        keys = _local_alloc_keys(cfg, depth, intrinsics, T_cw, frame_valid)
        # Per-local-frame touch sets (gating integration like the single-chip
        # path, so sharded == per-frame exactly).
        n_pix27 = keys.shape[0] // C
        frame_offsets = (
            jnp.arange(C, dtype=jnp.int32) * (G ** 3 + 1)
        ).repeat(n_pix27)
        frame_touched = (
            jnp.zeros((C * (G ** 3 + 1),), jnp.uint8)
            .at[keys + frame_offsets]
            .max(jnp.uint8(1))
        )
        touched_local = jnp.max(
            frame_touched.reshape(C, G ** 3 + 1), axis=0
        )[: G ** 3].astype(jnp.int32)
        touched = jax.lax.psum(touched_local, axis)  # union (count>0 == any)

        new_mask = (touched > 0) & (state.slot_table < 0)
        ranks = jnp.cumsum(new_mask.astype(jnp.int32))
        total_new = ranks[-1]
        slot_for_new = state.n_active + ranks - 1
        can_fit = slot_for_new < cap
        slot_table = jnp.where(new_mask & can_fit, slot_for_new, state.slot_table)
        grid_keys = jnp.arange(G ** 3, dtype=jnp.int32)
        coords_all = _keys_to_coords(grid_keys, G)
        scatter_idx = jnp.where(new_mask & can_fit, slot_for_new, cap)
        block_coords = state.block_coords.at[scatter_idx].set(coords_all, mode="drop")
        n_active = jnp.minimum(state.n_active + total_new, cap)
        overflow = state.overflow + jnp.maximum(state.n_active + total_new - cap, 0)

        # ---- chunk active list (identical on every device) ------------------
        M = cfg.chunk_active_capacity
        active_mask = (touched > 0) & (slot_table >= 0)
        rank2 = jnp.cumsum(active_mask.astype(jnp.int32))
        list_idx = jnp.where(active_mask & (rank2 <= M), rank2 - 1, M)
        active_slots = (
            jnp.full((M + 1,), cap, jnp.int32).at[list_idx].set(slot_table, mode="drop")
        )[:M]
        dropped_active = state.dropped_active + jnp.maximum(rank2[-1] - M, 0)

        # ---- local integration over the frame shard -------------------------
        H, W = depth.shape[1], depth.shape[2]
        Rwc = T_wc[:, :3, :3].astype(jnp.float32)
        twc = T_wc[:, :3, 3].astype(jnp.float32)
        inv_trunc = jnp.float32(1.0 / cfg.trunc)
        TM = cfg.integrate_tile
        n_tiles = (M + TM - 1) // TM

        n_act_chunk = jnp.minimum(rank2[-1], M)
        n_tiles_dyn = jnp.minimum((n_act_chunk + TM - 1) // TM, n_tiles)

        def tile_body(t, acc):
            # `t` may exceed n_tiles-1 (group padding); clamp only the slice
            # start — the guard uses the RAW index so a padded revisit of the
            # last tile is a no-op when the chunk saturates capacity.
            sums, cnts = acc
            t_clamped = jnp.minimum(t, n_tiles - 1)
            slots = jax.lax.dynamic_slice(active_slots, (t_clamped * TM,), (TM,))
            slot_ok = (slots < cap) & (t < n_tiles_dyn)
            bc = block_coords[jnp.minimum(slots, cap)]
            tile_keys = _block_keys(bc, G)
            touch_bits = frame_touched[
                tile_keys[:, None]
                + (jnp.arange(C, dtype=jnp.int32) * (G ** 3 + 1))[None, :]
            ]
            p = ((bc * R)[:, None, :] + voxel_offs[None, :, :]).astype(
                jnp.float32
            ) * cfg.voxel_size

            def frame_body(f, a):
                s, c = a
                pc = jnp.einsum("ij,tvj->tvi", Rwc[f], p) + twc[f]
                z = pc[..., 2]
                zs = jnp.where(z > 0, z, 1.0)
                uu = intrinsics[f, 0, 0] * pc[..., 0] / zs + intrinsics[f, 0, 2]
                vv = intrinsics[f, 1, 1] * pc[..., 1] / zs + intrinsics[f, 1, 2]
                ui = jnp.floor(uu + 0.5).astype(jnp.int32)
                vi = jnp.floor(vv + 0.5).astype(jnp.int32)
                in_img = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (z > 0)
                d = depth[f].reshape(-1)[
                    jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
                ]
                ok = (
                    in_img & (d > 0) & (d <= cfg.depth_max) & frame_valid[f]
                    & (touch_bits[:, f] > 0)[:, None]
                )
                sdf = d - z
                ok &= sdf >= -cfg.trunc
                obs = jnp.minimum(sdf, cfg.trunc) * inv_trunc
                s = s + jnp.where(ok, obs, 0.0)
                c = c + ok.astype(jnp.float32)
                return (s, c)

            s0 = jnp.zeros((TM, cfg.r3), jnp.float32)
            c0 = jnp.zeros((TM, cfg.r3), jnp.float32)
            s, c = jax.lax.fori_loop(0, C, frame_body, (s0, c0))
            slots_safe = jnp.where(slot_ok, slots, cap)
            sums = sums.at[slots_safe].add(jnp.where(slot_ok[:, None], s, 0.0))
            cnts = cnts.at[slots_safe].add(jnp.where(slot_ok[:, None], c, 0.0))
            return (sums, cnts)

        sums0 = jnp.zeros((rows, cfg.r3), jnp.float32)
        cnts0 = jnp.zeros((rows, cfg.r3), jnp.float32)
        # Dynamic GROUPED tile loop (see ops/tsdf.py): a data-dependent
        # while over groups of unrolled tiles; the active list is
        # front-compacted and identical on every device, so all devices
        # agree on the trip count.
        from mq3d_tpu.ops.tsdf import _TILE_GROUP

        group = min(_TILE_GROUP, n_tiles)
        n_groups_dyn = (n_tiles_dyn + group - 1) // group

        def tile_cond(c):
            return c[0] < n_groups_dyn

        def tile_step(c):
            g, acc = c
            for k in range(group):
                acc = tile_body(g * group + k, acc)
            return (g + 1, acc)

        _, (sums, cnts) = jax.lax.while_loop(
            tile_cond, tile_step, (jnp.int32(0), (sums0, cnts0))
        )

        # ---- exact cross-device merge ---------------------------------------
        if partition_state:
            # reduce_scatter: each device receives the reduced sums for its
            # own block-row shard and updates only its local voxel rows.
            sums = jax.lax.psum_scatter(sums, axis, scatter_dimension=0,
                                        tiled=True)
            cnts = jax.lax.psum_scatter(cnts, axis, scatter_dimension=0,
                                        tiled=True)
            row0 = jax.lax.axis_index(axis) * rows_local
            global_row = row0 + jnp.arange(rows_local)
            real = (global_row != cap)[:, None]
        else:
            sums = jax.lax.psum(sums, axis)
            cnts = jax.lax.psum(cnts, axis)
            real = None

        new_w = state.weight + cnts
        new_t = jnp.where(
            cnts > 0, (state.tsdf * state.weight + sums) / jnp.maximum(new_w, 1.0),
            state.tsdf,
        )
        if partition_state:
            new_t = jnp.where(real, new_t, 0.0)  # sentinel row stays zero
            new_w = jnp.where(real, new_w, 0.0)
        else:
            new_t = new_t.at[cap].set(0.0)
            new_w = new_w.at[cap].set(0.0)
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

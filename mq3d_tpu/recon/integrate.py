"""TSDF integration driver: dataset -> volume, chunked device launches.

Replaces the reference's per-frame Python loop around vbg.integrate
(reference: scripts/processing/reconstruction/utils/o3d_utils.py:153-238)
with host-side batched loading + chunk-fused device integration.
Confidence-based depth filtering (zeroing pixels below confidence/count
thresholds, reference o3d_utils.py:109-150) is applied on the stacked
arrays before upload.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import IntegrationConfig
from mq3d_tpu.utils.host import fetch_int
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.models.datasets import DepthDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume


def load_filtered_depth_stack(
    depth_data_io: DepthDataIO,
    side: Side,
    dataset: DepthDataset,
    indices: np.ndarray,
    use_confidence_filtered_depth: bool,
    confidence_threshold: float,
    valid_count_threshold: int,
):
    """(N, H, W) linear depth stack with confidence filtering applied.

    Confidence maps arrive as one packed mmap slice per chunk
    (DepthDataIO.load_confidence_stack) and the thresholds apply as a single
    vectorized mask — not one npz open + two masked writes per frame."""
    stack, valid = depth_data_io.load_depth_stack(side, dataset, indices)
    if use_confidence_filtered_depth:
        ts = np.asarray(dataset.timestamps)[np.asarray(indices, np.int64)]
        conf, cnt, have = depth_data_io.load_confidence_stack(side, ts)
        for t in ts[valid & ~have]:
            print(f"[Warning] Confidence map not found for timestamp {t}")
        sel = valid & have
        if sel.any() and conf.shape[1:] == stack.shape[1:]:
            kill = (conf < confidence_threshold) | (cnt < valid_count_threshold)
            kill &= sel[:, None, None]
            stack[kill] = 0.0
        elif sel.any():
            print(
                f"[Warning] Confidence map shape {conf.shape[1:]} does not "
                f"match depth {stack.shape[1:]}; skipping confidence filter"
            )
    return stack, valid


def tsdf_config_from_integration(config: IntegrationConfig) -> TSDFConfig:
    """Duck-typed: also accepts FragmentPoseRefinementConfig (same fields).
    TPU-only knobs fall back to TSDFConfig defaults when absent."""
    return TSDFConfig(
        voxel_size=config.voxel_size,
        block_resolution=config.block_resolution,
        block_count=config.block_count,
        depth_max=config.depth_max,
        trunc_voxel_multiplier=config.trunc_voxel_multiplier,
        alloc_pixel_stride=int(getattr(config, "alloc_pixel_stride", 2)),
        grid_dim=int(getattr(config, "grid_dim", 160)),
        chunk_active_capacity=int(getattr(config, "chunk_active_capacity", 12_288)),
        integrate_tile=int(getattr(config, "integrate_tile", 512)),
    )


def integrate(
    dataset: DepthDataset,
    depth_data_io: DepthDataIO,
    side: Side,
    config: IntegrationConfig,
    vbg_opt: Optional[TSDFVolume] = None,
    show_progress: bool = False,
    desc: Optional[str] = None,
) -> TSDFVolume:
    """Integrate every frame of `dataset` into a (possibly shared) volume.

    Mirrors the reference integrate() surface (o3d_utils.py:153-238): both
    stereo sides accumulate into the same volume when `vbg_opt` is passed.
    Dataset transforms must already be in the OPEN3D camera frame.

    Exhausting the block pool (block_count) grows the pool and replays the
    whole dataset (see _integrate_with_growth) — no observations are lost.
    """
    vol = vbg_opt if vbg_opt is not None else TSDFVolume(
        tsdf_config_from_integration(config)
    )

    n = len(dataset)
    if n == 0:
        return vol

    K = dataset.get_render_intrinsic_matrices().astype(np.float32)
    T_wc = dataset.transforms.extrinsics_wc.astype(np.float32)

    chunk = max(1, int(getattr(config, "frames_per_batch", 16)))

    def run_all(v: TSDFVolume) -> None:
        import jax

        iterator = tqdm(
            range(0, n, chunk), desc=desc, disable=not show_progress
        )
        for s in iterator:
            idx = np.arange(s, min(s + chunk, n))
            stack, valid = load_filtered_depth_stack(
                depth_data_io,
                side,
                dataset,
                idx,
                config.use_confidence_filtered_depth,
                config.confidence_threshold,
                config.valid_count_threshold,
            )
            if not valid.any():
                continue
            # Pad the tail chunk to the static chunk size (no recompiles).
            if len(idx) < chunk:
                pad = chunk - len(idx)
                stack = np.concatenate(
                    [stack, np.zeros((pad,) + stack.shape[1:], np.float32)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
                Kc = np.concatenate(
                    [K[idx], np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
                Tc = np.concatenate(
                    [T_wc[idx], np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
            else:
                Kc, Tc = K[idx], T_wc[idx]
            v.integrate(stack, Kc, Tc, valid)
            # Sync each chunk: long async donation chains intermittently
            # degrade on tunneled TPU runtimes (final waits can take ~50x
            # the compute); a per-chunk barrier costs one RTT and keeps the
            # queue shallow.
            jax.block_until_ready(v.state.tsdf)

    _integrate_with_growth(vol, run_all, entry_empty=_volume_is_empty(vol))
    return vol


def _volume_is_empty(vol: TSDFVolume) -> bool:
    """True when the volume holds no prior content (safe to rebuild from
    scratch on block-pool overflow)."""
    return (
        fetch_int(vol.state.n_active) == 0
        and fetch_int(vol.state.overflow) == 0
    )


# Doubling the block pool more than this many times means the workload is
# ~10x the configured capacity — treat as misconfiguration, keep the data
# we have, and warn.
_MAX_POOL_GROWTHS = 3


def _integrate_with_growth(vol, run_all, entry_empty: bool) -> None:
    """Run `run_all(vol)` and, when the fixed block pool overflows, grow the
    pool in place (2x) and replay from an empty volume until every
    allocation fits (reference semantics: Open3D's VoxelBlockGrid hashmap
    rehashes+grows transparently, core/hashmap/HashMap.cpp — a fixed pool
    that silently drops blocks would diverge from it).

    Growth replays only when the volume held no content at entry (the
    pipeline paths: reconstruct_scene's scene volume, refine's reset
    per-fragment volume); a shared pre-loaded volume cannot be replayed, so
    overflow there keeps the loud warning.
    """
    from dataclasses import replace

    for _ in range(_MAX_POOL_GROWTHS + 1):
        run_all(vol)
        overflow = fetch_int(vol.state.overflow)
        if overflow == 0 or not entry_empty:
            break
        new_count = vol.cfg.block_count * 2
        print(
            f"[Info] TSDF block pool exhausted ({overflow} allocations "
            f"dropped at block_count={vol.cfg.block_count}); growing to "
            f"{new_count} and re-integrating"
        )
        vol.cfg = replace(vol.cfg, block_count=new_count)
        # Fresh state at the larger capacity (in place, so callers that
        # reuse the volume across fragments keep the grown pool).
        from mq3d_tpu.ops.tsdf import create_state

        vol.state = create_state(vol.cfg)
    _warn_volume_overflow(vol)


def _warn_volume_overflow(vol: TSDFVolume) -> None:
    overflow = fetch_int(vol.state.overflow)
    if overflow > 0:
        print(
            f"[Warning] TSDF block capacity exceeded: {overflow} "
            f"allocations dropped (block_count={vol.cfg.block_count})"
        )
    dropped = fetch_int(vol.state.dropped_active)
    if dropped > 0:
        print(
            f"[Warning] TSDF chunk active-block capacity exceeded: {dropped} "
            f"block-chunk integrations skipped (chunk_active_capacity="
            f"{vol.cfg.chunk_active_capacity}; raise it or reduce the chunk "
            f"size — depth observations were dropped)"
        )


def integrate_extract_small(
    dataset_map,
    depth_data_io: DepthDataIO,
    config: IntegrationConfig,
    weight_threshold: float = 3.0,
):
    """ONE-launch fast path for captures that fit a single chunk: fused
    fresh-state init + integration (both sides) + point extraction.

    Small captures on the tunneled TPU runtime are launch-bound (~2-3 s per
    large-footprint launch — TODO.md "Known environment issue"); the
    standard path pays 3 such launches (create_state, integrate_chunk,
    extract) where this pays 1.  Frame count pads to a power-of-two bucket
    (>= 8) instead of the full frames_per_batch chunk, so the depth-stack
    upload is also ~halved for a 16-frame capture.

    Returns (volume, point_cloud) — accumulation-identical to
    `integrate_multi` + `extract_point_cloud` (same impl functions compose
    inside the fused program) — or None when the preconditions don't hold
    (multi-chunk capture, mixed side resolutions, no valid frames) and the
    caller should use the standard path.
    """
    from dataclasses import replace

    from mq3d_tpu.ops.tsdf import fresh_integrate_extract

    sides = [s for s, ds in dataset_map.items() if len(ds) > 0]
    if not sides:
        return None
    shapes = {
        (int(dataset_map[s].heights[0]), int(dataset_map[s].widths[0]))
        for s in sides
    }
    if len(shapes) > 1:
        return None
    n = sum(len(dataset_map[s]) for s in sides)
    chunk = max(1, int(getattr(config, "frames_per_batch", 16)))
    if n == 0 or n > chunk:
        return None

    stacks, valids, Kc, Tc = [], [], [], []
    for s in sides:
        ds = dataset_map[s]
        st, va = load_filtered_depth_stack(
            depth_data_io, s, ds, np.arange(len(ds)),
            config.use_confidence_filtered_depth,
            config.confidence_threshold,
            config.valid_count_threshold,
        )
        stacks.append(st)
        valids.append(va)
        Kc.append(ds.get_render_intrinsic_matrices().astype(np.float32))
        Tc.append(ds.transforms.extrinsics_wc.astype(np.float32))
    stack = np.concatenate(stacks)
    valid = np.concatenate(valids)
    Kb = np.concatenate(Kc)
    Tb = np.concatenate(Tc)
    if not valid.any():
        return None

    C = 8
    while C < n:
        C *= 2
    if C > n:  # pad to the pow2 frame bucket
        pad = C - n
        stack = np.concatenate(
            [stack, np.zeros((pad,) + stack.shape[1:], np.float32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
        Kb = np.concatenate(
            [Kb, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
        Tb = np.concatenate(
            [Tb, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])

    cfg_t = tsdf_config_from_integration(config)
    for _ in range(_MAX_POOL_GROWTHS + 1):
        vol, pcd, overflow = fresh_integrate_extract(
            cfg_t, stack, Kb, Tb, valid, weight_threshold
        )
        if overflow == 0:
            break
        new_count = cfg_t.block_count * 2
        print(
            f"[Info] TSDF block pool exhausted ({overflow} allocations "
            f"dropped at block_count={cfg_t.block_count}); growing to "
            f"{new_count} and re-integrating"
        )
        cfg_t = replace(cfg_t, block_count=new_count)
    _warn_volume_overflow(vol)
    if pcd is None:
        pcd = vol.extract_point_cloud(weight_threshold)
    return vol, pcd


def integrate_multi(
    dataset_map,
    depth_data_io: DepthDataIO,
    config: IntegrationConfig,
    vbg_opt: Optional[TSDFVolume] = None,
    show_progress: bool = False,
    desc: Optional[str] = None,
) -> TSDFVolume:
    """Integrate every frame of every side's dataset into ONE volume, with
    chunks that span side boundaries.

    Accumulation-identical to sequential per-side `integrate()` calls in
    `dataset_map` iteration order (the chunk-fused kernel is bit-exact vs
    per-frame integration regardless of chunk boundaries); the difference
    is launch count: frames chunk across the LEFT/RIGHT boundary, so a
    16-frame capture integrates in ONE device launch instead of two.  The
    tunneled TPU runtime charges ~1.3 s of launch overhead per
    large-footprint program, which dominates small captures (reference
    integrates sides sequentially into the shared VBG, o3d_utils.py:153-238
    called once per side from reconstruct_scene.py).

    Falls back to sequential per-side integration when the sides' depth
    resolutions differ (stacks could not be fused into one array).
    """
    sides = [s for s, ds in dataset_map.items() if len(ds) > 0]
    if not sides:
        return vbg_opt if vbg_opt is not None else TSDFVolume(
            tsdf_config_from_integration(config)
        )
    shapes = set()
    for s in sides:
        ds = dataset_map[s]
        shapes.add((int(ds.heights[0]), int(ds.widths[0])))
    if len(shapes) > 1:
        vol = vbg_opt
        for s in sides:
            vol = integrate(
                dataset=dataset_map[s], depth_data_io=depth_data_io,
                side=s, config=config, vbg_opt=vol,
                show_progress=show_progress, desc=desc,
            )
        return vol

    vol = vbg_opt if vbg_opt is not None else TSDFVolume(
        tsdf_config_from_integration(config)
    )
    Ks = {
        s: dataset_map[s].get_render_intrinsic_matrices().astype(np.float32)
        for s in sides
    }
    Ts = {
        s: dataset_map[s].transforms.extrinsics_wc.astype(np.float32)
        for s in sides
    }
    seq = [(s, i) for s in sides for i in range(len(dataset_map[s]))]
    n = len(seq)
    chunk = max(1, int(getattr(config, "frames_per_batch", 16)))
    scan = max(1, int(getattr(config, "chunks_per_launch", 4)))

    def load_chunk(part):
        """One padded (chunk, H, W) stack + (chunk,) valid + K/T arrays."""
        stacks, valids, Kc, Tc = [], [], [], []
        j = 0
        while j < len(part):
            s = part[j][0]
            k = j
            while k < len(part) and part[k][0] == s:
                k += 1
            idx = np.asarray([i for _, i in part[j:k]])
            st, va = load_filtered_depth_stack(
                depth_data_io, s, dataset_map[s], idx,
                config.use_confidence_filtered_depth,
                config.confidence_threshold,
                config.valid_count_threshold,
            )
            stacks.append(st)
            valids.append(va)
            Kc.append(Ks[s][idx])
            Tc.append(Ts[s][idx])
            j = k
        stack = np.concatenate(stacks)
        valid = np.concatenate(valids)
        Kb = np.concatenate(Kc)
        Tb = np.concatenate(Tc)
        if len(part) < chunk:  # pad the tail to the static chunk size
            pad = chunk - len(part)
            stack = np.concatenate(
                [stack, np.zeros((pad,) + stack.shape[1:], np.float32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
            Kb = np.concatenate(
                [Kb, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
            Tb = np.concatenate(
                [Tb, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
        return stack, Kb, Tb, valid

    def run_chunked(v: TSDFVolume) -> None:
        """Per-chunk launches with auto-split — the exact-capacity path."""
        import jax

        iterator = tqdm(
            range(0, n, chunk), desc=desc, disable=not show_progress
        )
        for c0 in iterator:
            stack, Kb, Tb, valid = load_chunk(seq[c0:c0 + chunk])
            if not valid.any():
                continue
            v.integrate(stack, Kb, Tb, valid)
            # Per-chunk barrier: see integrate().
            jax.block_until_ready(v.state.tsdf)

    def run_all(v: TSDFVolume) -> None:
        """Scan-fused: one launch per `scan` chunks, one deferred
        capacity check per batch; per-chunk replay if a chunk's touched
        set exceeded chunk_active_capacity (rare — warns + replays only
        when the volume was empty at entry, like pool growth)."""
        if scan <= 1 or not _volume_is_empty(v):
            run_chunked(v)
            return
        d_before = fetch_int(v.state.dropped_active)
        per = chunk * scan
        iterator = tqdm(
            range(0, n, per), desc=desc, disable=not show_progress
        )
        for g0 in iterator:
            groups = [
                load_chunk(seq[c0:c0 + chunk])
                for c0 in range(g0, min(g0 + per, n), chunk)
            ]
            while len(groups) < scan:  # pad tail group: all-invalid chunk
                z = groups[0]
                groups.append((
                    np.zeros_like(z[0]),
                    np.tile(np.eye(3, dtype=np.float32), (chunk, 1, 1)),
                    np.tile(np.eye(4, dtype=np.float32), (chunk, 1, 1)),
                    np.zeros(chunk, bool),
                ))
            v.integrate_scan(
                np.stack([g[0] for g in groups]),
                np.stack([g[1] for g in groups]),
                np.stack([g[2] for g in groups]),
                np.stack([g[3] for g in groups]),
            )
        if fetch_int(v.state.dropped_active) != d_before:
            print(
                "[Info] chunk_active_capacity exceeded inside a scan-fused "
                "integrate batch; replaying per-chunk with window splits"
            )
            v.state = create_state(v.cfg)
            run_chunked(v)

    from mq3d_tpu.ops.tsdf import create_state

    _integrate_with_growth(vol, run_all, entry_empty=_volume_is_empty(vol))
    return vol

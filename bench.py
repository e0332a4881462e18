#!/usr/bin/env python
"""Benchmark: flagship kernels + end-to-end pipeline on real hardware.

Primary metric: chunk-fused TSDF integration throughput (frames/sec/chip)
at the reference's production configuration (voxel 1 cm, block 16^3, 50k
blocks, depth_max 4 m, Quest-depth-sized 320x288 frames) over a synthetic
1000-frame capture.  The JSON line's `extra` dict carries two more tracked
metrics on the same volume/process:

  raycast_ms_per_frame    full-frame 1280x960 color-aligned depth render,
                          device execution time (reference: Embree CPU,
                          o3d_utils.py:324-341; measured stand-in bound
                          42.7 ms/frame 16-core — BASELINE.md)
  raycast_stream_ms_per_frame  the same render streamed through the
                          production generator including per-frame host
                          readback over this image's tunneled transport
                          (~6-34 MB/s; deployment PCIe makes this ~equal
                          to the device number)
  e2e_pipeline_seconds    run_full_pipeline on a 16-frame synthetic
                          capture (fast config, compile-included)

vs_baseline compares against the reference pipeline's CPU Open3D
VoxelBlockGrid.integrate path.  The reference publishes no numbers
(BASELINE.md) and Open3D is not installable in this image, so the baseline
is MEASURED from native/ref_tsdf_cpu.cpp — a well-optimized C++
transcription of the same allocate-then-integrate loop, semantically
parity-checked against ops/tsdf.py (<0.01% observation-count divergence;
tools/bench_reference_cpu.py --parity) — on this host's single core:
19.3 frames/s on the identical workload.  The constant below multiplies
that by a reference-favorable 16 cores x 0.8 parallel efficiency for the
user-workstation bound (Open3D's TBB integrate scales near-linearly).
"""

import json
import os
import sys
import time

import numpy as np

# Measured 19.26 f/s single-core C++ x 16 cores x 0.8 efficiency
# (tools/bench_reference_cpu.py, 2026-08-17; derivation in BASELINE.md).
BASELINE_FRAMES_PER_SEC = 246.6
# Measured 547 ms/frame single-core BVH stand-in / 16 cores / 0.8 eff.
# (tools/bench_reference_raycast.py, 2026-08-18; BASELINE.md "Round-3
# measured reference baselines").  raycast_vs_embree_cpu divides by THIS
# number since round 4; the legacy 200 ms budget survives one round as
# raycast_vs_legacy_budget for cross-round continuity.
BASELINE_RAYCAST_MS = 42.7
LEGACY_RAYCAST_BUDGET_MS = 200.0

N_FRAMES = 1000
H, W = 288, 320
H_C, W_C = 960, 1280
CHUNK = 20
RAYCAST_BATCH = 8


def make_capture():
    """Synthetic room orbit at Quest depth-camera scale."""
    sys.path.insert(0, ".")
    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig,
        orbit_poses_o3d,
        render_box_depth,
        intrinsics_from_cfg,
    )

    cfg = SyntheticSceneConfig(
        n_frames=N_FRAMES, depth_width=W, depth_height=H, sweep=2 * np.pi
    )
    fx, fy, cx, cy = intrinsics_from_cfg(cfg, W, H)
    cxf = W - cx
    gt = orbit_poses_o3d(cfg)
    poses_cw = gt.extrinsics_cw.astype(np.float64)

    uniq = 50
    depths = np.empty((uniq, H, W), np.float32)
    for i in range(uniq):
        depths[i] = render_box_depth(
            poses_cw[i * (N_FRAMES // uniq)], fx, fy, cxf, cy, W, H,
            cfg.box_min, cfg.box_max,
        )
    depth = depths[np.arange(N_FRAMES) % uniq]

    K = np.zeros((N_FRAMES, 3, 3), np.float32)
    K[:, 0, 0] = fx
    K[:, 1, 1] = fy
    K[:, 0, 2] = cxf
    K[:, 1, 2] = cy
    K[:, 2, 2] = 1
    order = (np.arange(N_FRAMES) % uniq) * (N_FRAMES // uniq)
    T_wc = np.linalg.inv(poses_cw[order]).astype(np.float32)
    valid = np.ones(N_FRAMES, bool)
    return depth, K, T_wc, valid, gt, cfg


def bench_integrate(cfg_t, depth, K, T_wc, valid):
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import create_state, integrate_chunk

    # Best-of-3 with a fresh volume per repetition: the tunneled chip
    # throttles for minutes after a cold connect (observed 1.2k vs 3.5k f/s
    # for IDENTICAL code minutes apart), so a single timed pass can record
    # the tunnel, not the kernel.  Fresh state keeps every rep the same
    # allocate-then-integrate workload; the last rep's state feeds the
    # raycast bench.
    from mq3d_tpu.utils.host import fetch_int

    best = 0.0
    for _ in range(3):
        state = create_state(cfg_t)
        state = integrate_chunk(
            cfg_t, state,
            jnp.asarray(depth[:CHUNK]), jnp.asarray(K[:CHUNK]),
            jnp.asarray(T_wc[:CHUNK]), jnp.asarray(valid[:CHUNK]),
        )
        # True sync: the tunneled runtime's block_until_ready does NOT
        # block (measured 2026-08-19 — an 8192^3 matmul "completed" in
        # 0.04 ms), so every timing boundary fetches a scalar that depends
        # on the full computation chain instead.
        fetch_int(state.n_active)

        t0 = time.perf_counter()
        for s in range(CHUNK, N_FRAMES, CHUNK):
            state = integrate_chunk(
                cfg_t, state,
                jnp.asarray(depth[s:s + CHUNK]), jnp.asarray(K[s:s + CHUNK]),
                jnp.asarray(T_wc[s:s + CHUNK]), jnp.asarray(valid[s:s + CHUNK]),
            )
        fetch_int(state.n_active)
        elapsed = time.perf_counter() - t0
        best = max(best, (N_FRAMES - CHUNK) / elapsed)
    return best, state


def bench_integrate_fused(cfg_t, depth, K, T_wc, valid, scan=5):
    """Scan-fused streamed integrate: one launch per `scan` chunks
    (ops/tsdf.py integrate_chunks), inputs shipped per launch.  Amortizes
    the tunnel's fixed per-launch cost over scan*CHUNK frames; the
    remaining floor is the h2d stream itself (~40 MB/s asymptote measured,
    docs/ROOFLINE_TSDF.md)."""
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import create_state, integrate_chunks
    from mq3d_tpu.utils.host import fetch_int

    per = scan * CHUNK

    def put(s0):
        sl = slice(s0, s0 + per)
        sh = depth.shape[1:]
        return (
            jnp.asarray(depth[sl]).reshape(scan, CHUNK, *sh),
            jnp.asarray(K[sl]).reshape(scan, CHUNK, 3, 3),
            jnp.asarray(T_wc[sl]).reshape(scan, CHUNK, 4, 4),
            jnp.asarray(valid[sl]).reshape(scan, CHUNK),
        )

    best = 0.0
    for _ in range(2):
        state = create_state(cfg_t)
        state = integrate_chunks(cfg_t, state, *put(0))
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        n = 0
        for s0 in range(per, (N_FRAMES // per) * per, per):
            state = integrate_chunks(cfg_t, state, *put(s0))
            n += per
        fetch_int(state.n_active)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def bench_integrate_fused_u16(cfg_t, depth, K, T_wc, valid, scan=5):
    """Scan-fused streamed integrate with uint16 fixed-point depth
    (quantize_depth_u16: 0.061 mm step at depth_max 4 m): halves the
    per-launch h2d bytes on the ~38 MB/s tunnel."""
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import (
        create_state, integrate_chunks_u16, quantize_depth_u16)
    from mq3d_tpu.utils.host import fetch_int

    dq, scale = quantize_depth_u16(depth, cfg_t.depth_max)
    per = scan * CHUNK
    sh = depth.shape[1:]

    def put(s0):
        sl = slice(s0, s0 + per)
        return (
            jnp.asarray(dq[sl]).reshape(scan, CHUNK, *sh),
            jnp.float32(scale),
            jnp.asarray(K[sl]).reshape(scan, CHUNK, 3, 3),
            jnp.asarray(T_wc[sl]).reshape(scan, CHUNK, 4, 4),
            jnp.asarray(valid[sl]).reshape(scan, CHUNK),
        )

    best = 0.0
    for _ in range(2):
        state = create_state(cfg_t)
        state = integrate_chunks_u16(cfg_t, state, *put(0))
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        n = 0
        for s0 in range(per, (N_FRAMES // per) * per, per):
            state = integrate_chunks_u16(cfg_t, state, *put(s0))
            n += per
        fetch_int(state.n_active)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def bench_integrate_devres(cfg_t, depth, K, T_wc, valid, scan=5):
    """Device-resident scan-fused integrate: all frames staged to HBM first
    (in <=32 MB slices; one 370 MB device_put wedges the tunnel), then
    timed with zero per-launch h2d.  This is the kernel's own rate under
    the same residency convention as the CPU reference baseline
    (native/ref_tsdf_cpu.cpp integrates RAM-resident frames).  Returns
    (frames_per_sec, staging_seconds, staged_mb)."""
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import create_state, integrate_chunks
    from mq3d_tpu.utils.host import fetch_float, fetch_int

    # Stage per-launch (scan, CHUNK, H, W) groups: a single 370 MB
    # device_put or a device concat into 370 MB both wedge the tunnel
    # (observed 2026-08-20); the 37 MB group transfers are safe.
    per = scan * CHUNK
    sh = depth.shape[1:]
    n_groups = N_FRAMES // per
    t0 = time.perf_counter()
    groups = []
    for g in range(n_groups):
        sl = slice(g * per, (g + 1) * per)
        groups.append((
            jax.device_put(depth[sl].reshape(scan, CHUNK, *sh)),
            jax.device_put(
                np.ascontiguousarray(K[sl]).reshape(scan, CHUNK, 3, 3)),
            jax.device_put(np.ascontiguousarray(
                np.asarray(T_wc[sl], np.float32)).reshape(scan, CHUNK, 4, 4)),
            jax.device_put(valid[sl].reshape(scan, CHUNK)),
        ))
        fetch_float(groups[-1][0][-1, -1, -1, -1])
    stage_s = time.perf_counter() - t0
    staged_mb = depth[:n_groups * per].nbytes / 1e6

    best = 0.0
    for _ in range(2):
        state = create_state(cfg_t)
        state = integrate_chunks(cfg_t, state, *groups[0])
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        n = 0
        for g in groups[1:]:
            state = integrate_chunks(cfg_t, state, *g)
            n += per
        fetch_int(state.n_active)
        best = max(best, n / (time.perf_counter() - t0))
    del groups
    return best, stage_s, staged_mb


def bench_raycast(cfg_t, state, gt, scene_cfg):
    """Streaming z-depth render at the color-camera resolution on the volume
    just integrated — the color-aligned-depth workload (reference casts rays
    per frame through Embree and consumes the map on host,
    o3d_utils.py:324-341).  Measures the production generator
    (`raycast_in_color_view`), which overlaps each batch's device compute
    with the previous batch's host readback.  Returns ms/frame."""
    from mq3d_tpu.models.datasets import CameraDataset
    from mq3d_tpu.ops.raycast import raycast_in_color_view
    from mq3d_tpu.ops.tsdf import TSDFVolume
    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg

    vol = TSDFVolume(cfg_t, state)
    fx, fy, cx, cy = intrinsics_from_cfg(scene_cfg, W_C, H_C)

    def make_ds(n):
        ones = np.ones(n)
        return CameraDataset(
            directory_relative_path="bench",
            image_file_names=np.array([f"{i}.png" for i in range(n)]),
            timestamps=np.arange(n, dtype=np.int64),
            fx=fx * ones, fy=fy * ones, cx=cx * ones, cy=cy * ones,
            transforms=type(gt)(
                coordinate_system=gt.coordinate_system,
                positions=gt.positions[:n],
                rotations=gt.rotations[:n],
            ),
            widths=np.full(n, W_C, np.int64),
            heights=np.full(n, H_C, np.int64),
        )

    # Warmup (compile + scene prep).
    d = next(raycast_in_color_view(vol, make_ds(RAYCAST_BATCH)))
    assert np.isfinite(d).mean() > 0.5, "raycast: mostly misses"

    # Device render time: the number comparable to Embree's ~200 ms/frame
    # CPU trace (both produce the depth map on the compute device; a
    # deployment host drains the 4.9 MB/frame result over PCIe in ~1 ms,
    # where this image's tunneled transport runs at 6-34 MB/s — a harness
    # artifact, not a property of the design).
    import jax

    from mq3d_tpu.ops.raycast import _render_frames_device

    ds = make_ds(2 * RAYCAST_BATCH)
    Kb = np.asarray(ds.get_render_intrinsic_matrices(), np.float32)
    Tb = np.asarray(ds.transforms.extrinsics_wc, np.float64)

    def sync(z):
        # block_until_ready is a no-op through the tunneled runtime
        # (2026-08-19); fetch a scalar that depends on the render instead.
        return float(jax.device_get(z[-1, -1, -1]))

    z, _ = _render_frames_device(vol, Kb, Tb, W_C, H_C)
    sync(z)
    # 3 back-to-back launches per timed rep: the device serializes them, so
    # one closing fetch (~30 ms tunnel RTT) amortizes over 48 frames.
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _rep in range(3):
            z, _ = _render_frames_device(vol, Kb, Tb, W_C, H_C)
        sync(z)
        ts.append(time.perf_counter() - t0)
    device_ms = float(min(ts) / (3 * Kb.shape[0]) * 1e3)

    # Streaming wall-clock through the production generator (device compute
    # overlapped with per-frame host readback): the in-tunnel pipeline rate.
    n_stream = 4 * RAYCAST_BATCH
    t0 = time.perf_counter()
    for d in raycast_in_color_view(vol, make_ds(n_stream)):
        d.ravel()[0]  # touch on host, like the npy save would
    stream_ms = float((time.perf_counter() - t0) / n_stream * 1e3)

    # Same stream with uint16 fixed-point readback (halves the bytes on
    # the bandwidth-bound tunnel; maps dequantize to f32 on host —
    # quantization step 0.061 mm at depth_max 4 m).
    t0 = time.perf_counter()
    for d in raycast_in_color_view(vol, make_ds(n_stream), transfer_u16=True):
        d.ravel()[0]
    stream_u16_ms = float((time.perf_counter() - t0) / n_stream * 1e3)
    return device_ms, stream_ms, stream_u16_ms


def bench_sharded_prod(cfg_t, depth, K, T_wc, valid, n_steps=10):
    """Partitioned-state sharded integrate at PRODUCTION shape on a mesh of
    1 (the real chip): proves the multichip program compiles, fits, and runs
    at the reference scale — the virtual-CPU dryrun covers n>1 topology,
    this covers real-hardware footprint.  Returns frames/s."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mq3d_tpu.parallel.sharded import (
        create_state_partitioned,
        sharded_integrate_step,
    )
    from mq3d_tpu.utils.host import fetch_int

    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("data",))
    step = sharded_integrate_step(cfg_t, mesh, partition_state=True)
    state = create_state_partitioned(cfg_t, mesh)

    def args(s):
        return (
            jnp.asarray(depth[s:s + CHUNK]), jnp.asarray(K[s:s + CHUNK]),
            jnp.asarray(T_wc[s:s + CHUNK]), jnp.asarray(valid[s:s + CHUNK]),
        )

    state = step(state, *args(0))
    fetch_int(state.n_active)  # true sync (see bench_integrate)
    t0 = time.perf_counter()
    for i in range(1, 1 + n_steps):
        state = step(state, *args(i * CHUNK))
    fetch_int(state.n_active)
    return n_steps * CHUNK / (time.perf_counter() - t0)


def bench_e2e(tmp="/tmp/bench_e2e"):
    """run_full_pipeline on a small synthetic capture, in-process
    (one-TPU-one-process rule), compile-included."""
    import shutil
    from pathlib import Path

    import yaml

    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig,
        write_synthetic_project,
    )

    proj = Path(tmp)
    shutil.rmtree(proj, ignore_errors=True)
    write_synthetic_project(proj, SyntheticSceneConfig(n_frames=16))
    cfg = yaml.safe_load(Path("config/pipeline_config_batch.yml").read_text())
    rec = cfg["reconstruction"]
    # Volume scale lives under the two integration sub-configs, not at the
    # reconstruction top level (configs.py).
    for k in ("fragment_pose_refinement", "depth_integration"):
        rec[k]["voxel_size"] = 0.05
        rec[k]["block_count"] = 4096
        rec[k]["use_confidence_filtered_depth"] = False
    for k in ("estimate_depth_confidences", "optimize_depth_pose",
              "optimize_color_pose", "render_color_aligned_depth"):
        rec[k] = False
    cfg_path = proj / "bench_cfg.yml"
    cfg_path.write_text(yaml.dump(cfg))

    import scripts.run_full_pipeline as rfp

    # Sub-stage timing in the bench log: the 16-frame wall-clock is launch/
    # cache-load bound in this environment, and the [Substep] lines record
    # where (see TODO.md "Known environment issue").
    os.environ.setdefault("MQ3D_SUBSTEP_TIMING", "1")
    t0 = time.perf_counter()
    rfp.main(["--session_dir", str(proj), "--config", str(cfg_path)])
    return time.perf_counter() - t0


def _probe_device():
    """The tunneled TPU backend can HANG init for ~25 min when the terminal
    is wedged (observed 2026-08-17), and even after init the first COMPUTE
    round-trip can hang for minutes after a previous client exits (observed
    repeatedly 2026-08-21).  Probe a real tiny computation in a killable
    subprocess (tools/tpu_health.py — self-deadlines, exits cleanly) and
    RETRY across the typical wedge-recovery window before falling back to
    CPU, so the bench records TPU numbers whenever the chip is reachable
    and still always emits a valid JSON line."""
    import subprocess
    import time as _time

    if os.environ.get("MQ3D_FORCE_CPU"):
        return
    for attempt in range(4):
        try:
            r = subprocess.run(
                [sys.executable, "tools/tpu_health.py", "240"],
                timeout=300, capture_output=True, text=True,
            )
            if "HEALTHY" in (r.stdout or ""):
                if attempt:
                    print(f"[bench] TPU healthy after {attempt} retries",
                          file=sys.stderr, flush=True)
                return
        except Exception:
            pass
        print(f"[bench] TPU probe attempt {attempt + 1}/4 failed "
              "(wedged tunnel?); waiting before retry",
              file=sys.stderr, flush=True)
        _time.sleep(150)
    print("[bench] TPU unreachable after 4 probes; falling back to CPU",
          file=sys.stderr, flush=True)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["MQ3D_FORCE_CPU"] = "1"


def main():
    sys.path.insert(0, ".")
    _probe_device()
    import jax

    # Persistent compile cache is enabled by mq3d_tpu.__init__
    # (~/.cache/jax); compiled executables from previous bench runs and
    # pipeline runs reload in seconds.

    from mq3d_tpu.ops.tsdf import TSDFConfig

    cfg_t = TSDFConfig(
        voxel_size=0.01,
        block_resolution=16,
        block_count=50_000,
        grid_dim=160,
        depth_max=4.0,
        trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2,
        chunk_active_capacity=12_288,
        integrate_tile=512,
    )

    depth, K, T_wc, valid, gt, scene_cfg = make_capture()
    print("[bench] capture ready", file=sys.stderr, flush=True)
    fps_chunk, state = bench_integrate(cfg_t, depth, K, T_wc, valid)
    print(f"[bench] integrate (per-chunk streamed) {fps_chunk:.0f} f/s",
          file=sys.stderr, flush=True)
    fps_stream = bench_integrate_fused(cfg_t, depth, K, T_wc, valid)
    print(f"[bench] integrate (scan-fused streamed) {fps_stream:.0f} f/s",
          file=sys.stderr, flush=True)
    fps_stream_u16 = bench_integrate_fused_u16(cfg_t, depth, K, T_wc, valid)
    print(f"[bench] integrate (scan-fused streamed u16) "
          f"{fps_stream_u16:.0f} f/s", file=sys.stderr, flush=True)
    fps_dev, stage_s, staged_mb = bench_integrate_devres(
        cfg_t, depth, K, T_wc, valid)
    print(f"[bench] integrate (device-resident) {fps_dev:.0f} f/s "
          f"(staged {staged_mb:.0f} MB in {stage_s:.1f} s)",
          file=sys.stderr, flush=True)
    raycast_ms, stream_ms, stream_u16_ms = bench_raycast(
        cfg_t, state, gt, scene_cfg)
    print(f"[bench] raycast {raycast_ms:.0f} ms/frame device, "
          f"{stream_ms:.0f} ms/frame streamed f32, "
          f"{stream_u16_ms:.0f} u16", file=sys.stderr, flush=True)
    del state  # free the 1.6 GB single-chip volume before the sharded state
    sharded_fps = bench_sharded_prod(cfg_t, depth, K, T_wc, valid)
    print(f"[bench] sharded prod integrate {sharded_fps:.0f} f/s",
          file=sys.stderr, flush=True)
    e2e_s = bench_e2e()
    print(f"[bench] e2e {e2e_s:.0f} s", file=sys.stderr, flush=True)

    # Headline = device-resident kernel rate: same residency convention as
    # the 246.6 f/s baseline (native/ref_tsdf_cpu.cpp integrates
    # RAM-resident frames; BASELINE.md round-5 section).  The streamed
    # rates through this image's ~40 MB/s debug relay are reported in
    # extra with the transport identity (docs/ROOFLINE_TSDF.md).
    print(json.dumps({
        "metric": "tsdf_frames_per_sec",
        "value": round(fps_dev, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_dev / BASELINE_FRAMES_PER_SEC, 2),
        "extra": {
            "tsdf_streamed_frames_per_sec": round(fps_stream, 2),
            "tsdf_streamed_u16_frames_per_sec": round(fps_stream_u16, 2),
            "tsdf_streamed_per_chunk_frames_per_sec": round(fps_chunk, 2),
            "tsdf_staging_mb_per_sec": round(staged_mb / stage_s, 1),
            # Device execution time (wall through the tunneled transport is
            # raycast_stream_ms_per_frame — definitions fixed since r04).
            "raycast_ms_per_frame": round(raycast_ms, 1),
            "raycast_vs_embree_cpu": round(BASELINE_RAYCAST_MS / raycast_ms,
                                           2),
            "raycast_vs_legacy_budget": round(
                LEGACY_RAYCAST_BUDGET_MS / raycast_ms, 2),
            "raycast_stream_ms_per_frame": round(stream_ms, 1),
            "raycast_stream_u16_ms_per_frame": round(stream_u16_ms, 1),
            "sharded_prod_frames_per_sec": round(sharded_fps, 1),
            "e2e_pipeline_seconds": round(e2e_s, 1),
        },
    }))


if __name__ == "__main__":
    main()

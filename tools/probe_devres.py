#!/usr/bin/env python
"""Decompose the DEVICE-RESIDENT scan-fused integrate launch cost.

BENCH r5 interim: device-resident S=5 runs ~79 f/s (1.27 s per 100-frame
launch) — barely above the streamed-u16 rate, even though it ships zero
bytes per launch.  That says the cost is in the launch itself, not the
transfer.  This probe separates, with forced scalar-fetch syncs and all
inputs pre-staged to HBM:

  N  no-op state pass-through launch at the full 1.6 GB state footprint
     (donated): pure launch + donation/aliasing overhead
  S1/S5/S15  integrate_chunks at scan lengths 1/5/15 over the same 300
     frames: fixed-per-launch vs per-chunk marginal cost
  V  frame_valid=False at S=5: Phase A compute with zero Phase B tiles
  B  full - V: Phase B marginal

Stages inputs in <=37 MB groups (a single >=370 MB device_put wedges this
tunnel — docs/ROOFLINE_TSDF.md hazards) and self-deadlines via
faulthandler so it can never need an external kill.

Usage: python tools/probe_devres.py [N S V]
"""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")
faulthandler.dump_traceback_later(1800, exit=True)

import bench  # noqa: E402

import os  # noqa: E402

CH = int(os.environ.get("MQ3D_PROBE_CHUNK", bench.CHUNK))  # default 20


def stage(depth, K, T_wc, valid, n_frames, scan):
    import jax

    per = scan * CH
    sh = depth.shape[1:]
    groups = []
    from mq3d_tpu.utils.host import fetch_float

    for g in range(n_frames // per):
        sl = slice(g * per, (g + 1) * per)
        groups.append((
            jax.device_put(depth[sl].reshape(scan, CH, *sh)),
            jax.device_put(np.ascontiguousarray(K[sl]).reshape(scan, CH, 3, 3)),
            jax.device_put(np.ascontiguousarray(
                np.asarray(T_wc[sl], np.float32)).reshape(scan, CH, 4, 4)),
            jax.device_put(valid[sl].reshape(scan, CH)),
        ))
        fetch_float(groups[-1][0][-1, -1, -1, -1])
    return groups


def run(cfg_t, groups, scan, tag, reps=2):
    from mq3d_tpu.ops.tsdf import create_state, integrate_chunks
    from mq3d_tpu.utils.host import fetch_int

    best = None
    for _ in range(reps):
        state = create_state(cfg_t)
        state = integrate_chunks(cfg_t, state, *groups[0])
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        for g in groups[1:]:
            state = integrate_chunks(cfg_t, state, *g)
        fetch_int(state.n_active)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n_l = len(groups) - 1
    print(f"{tag}: {best:.3f}s total, {best / n_l * 1e3:.1f} ms/launch, "
          f"{best / (n_l * scan) * 1e3:.1f} ms/chunk, "
          f"{n_l * scan * CH / best:.1f} f/s  ({n_l} launches)", flush=True)
    return best / n_l


def main():
    which = set(sys.argv[1:]) or {"N", "S", "V"}
    import jax
    import jax.numpy as jnp
    from functools import partial

    depth, K, T_wc, valid, gt, scene_cfg = bench.make_capture()
    over = {}
    if os.environ.get("MQ3D_PROBE_LOOKUP"):
        over["depth_lookup"] = os.environ["MQ3D_PROBE_LOOKUP"]
    cfg_t = __import__(
        "tools.probe_integrate_decomp", fromlist=["x"]).make_cfg(**over)
    print(f"[probe] capture ready (lookup={cfg_t.depth_lookup})", flush=True)

    from mq3d_tpu.ops.tsdf import TSDFState, create_state
    from mq3d_tpu.utils.host import fetch_int

    if "N" in which:
        @partial(jax.jit, donate_argnums=(0,))
        def passthrough(state):
            return TSDFState(
                state.slot_table, state.block_coords, state.tsdf,
                state.weight, state.n_active + 1, state.overflow,
                state.dropped_active)

        state = create_state(cfg_t)
        state = passthrough(state)
        fetch_int(state.n_active)
        for n in (10, 30):
            t0 = time.perf_counter()
            for _ in range(n):
                state = passthrough(state)
            fetch_int(state.n_active)
            dt = time.perf_counter() - t0
            print(f"[N] no-op donated launch x{n}: {dt / n * 1e3:.1f} ms/launch",
                  flush=True)

    if "S" in which:
        for scan, n_frames in ((1, 300), (5, 600), (15, 600)):
            groups = stage(depth, K, T_wc, valid, n_frames, scan)
            run(cfg_t, groups, scan, f"[S{scan}] full integrate")
            del groups

    if "V" in which:
        novalid = np.zeros_like(valid)
        groups = stage(depth, K, T_wc, novalid, 600, 5)
        run(cfg_t, groups, 5, "[V] frame_valid=False S=5")
        del groups


if __name__ == "__main__":
    main()

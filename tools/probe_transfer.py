#!/usr/bin/env python
"""Measure host->device transfer through the tunneled runtime, and the TSDF
integrate with DEVICE-RESIDENT frames (zero per-chunk h2d).

Hypothesis (2026-08-20): probe_integrate_decomp [B] showed frame_valid=False
costs 323 ms/launch vs 331 full -- the step is NOT compute-bound.  A 20-frame
chunk moves 20 x 320x288 f32 depth = 7.4 MB/launch host->device through the
TCP-over-stdio relay; if the relay runs ~25 MB/s that alone is ~300 ms and
the kernel is at the TRANSFER roofline of this environment, not the VPU one.

Variants (run one per process; each self-deadlines via faulthandler):
  h2d        device_put bandwidth/latency curve: 64 KB .. 64 MB
  devres     full 1000-frame integrate with ALL frames staged on device
             up front (one bulk transfer, timed separately)
  devres-u16 same but frames staged as u16 NDC and converted on device
             inside the integrate launch (halves staging bytes)
"""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")

faulthandler.dump_traceback_later(540, exit=True)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "h2d"
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.utils.host import fetch_float, fetch_int

    if variant == "h2d":
        # Latency/bandwidth curve.  Sync by fetching a data-dependent
        # scalar computed from the transferred buffer.
        one = jnp.ones((8, 128))  # warm a trivial executable
        fetch_float(one.sum())
        f = jax.jit(lambda x: x.ravel()[-1].astype(jnp.float32))
        for size in (1 << 16, 1 << 20, 1 << 22, 7_372_800, 1 << 24, 1 << 26):
            buf = np.random.default_rng(0).integers(
                0, 255, size=(size,), dtype=np.uint8).view(np.uint8)
            x = jax.device_put(buf)
            fetch_float(f(x))  # warm compile at this shape
            n = max(2, min(8, (1 << 26) // size))
            t0 = time.perf_counter()
            for _ in range(n):
                x = jax.device_put(buf)
                fetch_float(f(x))
            dt = (time.perf_counter() - t0) / n
            print(f"h2d {size / 1e6:8.2f} MB: {dt * 1e3:8.1f} ms  "
                  f"{size / dt / 1e6:8.1f} MB/s", flush=True)
        return

    import bench
    from mq3d_tpu.ops.tsdf import TSDFConfig, create_state, integrate_chunk

    depth, K, T_wc, valid, gt, scene_cfg = bench.make_capture()
    cfg = TSDFConfig(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )
    CH = 20
    n_frames = 1000

    if variant.startswith("devres"):
        # devres[S]: stage per-launch (S, CH, H, W) groups directly -- a
        # single 370 MB device_put OR a device concat into 370 MB both
        # WEDGE the tunnel (observed 2026-08-20 twice); per-group 37 MB
        # transfers are proven safe (scan5 streams them).
        from mq3d_tpu.ops.tsdf import integrate_chunks

        S = int(variant[6:] or 5)
        per = S * CH
        n_groups = n_frames // per
        t0 = time.perf_counter()
        groups = []
        for g in range(n_groups):
            sl = slice(g * per, (g + 1) * per)
            groups.append((
                jax.device_put(depth[sl].reshape(S, CH, *depth.shape[1:])),
                jax.device_put(K[sl].reshape(S, CH, 3, 3)),
                jax.device_put(np.asarray(
                    T_wc[sl], np.float32).reshape(S, CH, 4, 4)),
                jax.device_put(valid[sl].reshape(S, CH)),
            ))
            fetch_float(groups[-1][0][-1, -1, -1, -1])
        stage_s = time.perf_counter() - t0
        mb = depth[:n_groups * per].nbytes / 1e6
        print(f"staging {mb:.0f} MB: {stage_s:.2f} s "
              f"({mb / stage_s:.1f} MB/s)", flush=True)

        state = create_state(cfg)
        state = integrate_chunks(cfg, state, *groups[0])
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        for g in groups[1:]:
            state = integrate_chunks(cfg, state, *g)
        fetch_int(state.n_active)
        dt = time.perf_counter() - t0
        n_launch = n_groups - 1
        print(f"devres S={S}: {dt:.3f}s, {dt / n_launch * 1e3:.1f} "
              f"ms/launch, {n_launch * per / dt:.1f} f/s", flush=True)
        return

    if variant.startswith("scan"):
        # scan<S>: S 20-frame chunks per launch, streamed h2d per launch.
        # The S-scaling curve separates fixed per-launch cost (amortizes)
        # from per-byte/per-compute cost (does not).
        from mq3d_tpu.ops.tsdf import integrate_chunks

        S = int(variant[4:] or 5)
        per = S * CH
        state = create_state(cfg)

        def put(s0):
            sl = slice(s0, s0 + per)
            return (
                jnp.asarray(depth[sl]).reshape(S, CH, *depth.shape[1:]),
                jnp.asarray(K[sl]).reshape(S, CH, 3, 3),
                jnp.asarray(np.asarray(T_wc[sl], np.float32)).reshape(
                    S, CH, 4, 4),
                jnp.asarray(valid[sl]).reshape(S, CH),
            )

        state = integrate_chunks(cfg, state, *put(0))
        fetch_int(state.n_active)
        t0 = time.perf_counter()
        n_launch = 0
        for s0 in range(per, (n_frames // per) * per, per):
            state = integrate_chunks(cfg, state, *put(s0))
            n_launch += 1
        fetch_int(state.n_active)
        dt = time.perf_counter() - t0
        print(f"scan S={S}: {dt:.3f}s, {dt / n_launch * 1e3:.1f} ms/launch, "
              f"{n_launch * per / dt:.1f} f/s", flush=True)
        return

    raise SystemExit(f"unknown variant {variant}")


if __name__ == "__main__":
    main()

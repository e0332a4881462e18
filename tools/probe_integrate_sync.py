#!/usr/bin/env python
"""Dissect the honest-sync integrate stream: is the ~2.7 s per 20-frame
launch H2D transfer, per-launch barrier, or device compute?

Phases (all timings end in a scalar fetch that depends on the work):
  A  H2D: move one chunk's arrays to device, fetch a dependent scalar.
  B  pre-staged launches: all inputs already on device; chain N
     integrate_chunk launches, fetch once at the end.
  C  per-launch: same but fetch after every launch.
  D  the bench loop verbatim (asarray inside the loop) for N chunks.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.ops.tsdf import TSDFConfig, create_state, integrate_chunk
    from mq3d_tpu.utils.host import fetch_int, fetch_float

    from bench import make_capture, CHUNK

    cfg_t = TSDFConfig(
        voxel_size=0.01, block_resolution=16, block_count=50_000,
        grid_dim=160, depth_max=4.0, trunc_voxel_multiplier=10.0,
        alloc_pixel_stride=2, chunk_active_capacity=12_288,
        integrate_tile=512,
    )
    depth, K, T_wc, valid, _gt, _cfg = make_capture()
    print("capture ready", flush=True)

    N_CHUNKS = 8

    def chunk_np(i):
        s = i * CHUNK
        return (depth[s:s+CHUNK], K[s:s+CHUNK], T_wc[s:s+CHUNK],
                valid[s:s+CHUNK])

    # Warm compile.
    state = create_state(cfg_t)
    state = integrate_chunk(cfg_t, state, *map(jnp.asarray, chunk_np(0)))
    fetch_int(state.n_active)
    print("warm", flush=True)

    # A: H2D of one chunk (7.4 MB depth + small).
    for rep in range(3):
        arrs = chunk_np(rep + 1)
        t0 = time.perf_counter()
        dev = [jnp.asarray(a) for a in arrs]
        s = sum(jnp.sum(a[-1]).astype(jnp.float32) for a in dev)
        fetch_float(s)
        print(f"A h2d+reduce chunk: {time.perf_counter()-t0:.3f}s", flush=True)

    # B: pre-staged chained launches.
    dev_chunks = [tuple(map(jnp.asarray, chunk_np(i))) for i in range(N_CHUNKS)]
    fetch_float(jnp.sum(dev_chunks[-1][0][-1]).astype(jnp.float32))
    state = create_state(cfg_t)
    state = integrate_chunk(cfg_t, state, *dev_chunks[0])
    fetch_int(state.n_active)
    t0 = time.perf_counter()
    for i in range(1, N_CHUNKS):
        state = integrate_chunk(cfg_t, state, *dev_chunks[i])
    fetch_int(state.n_active)
    dt = time.perf_counter() - t0
    print(f"B pre-staged x{N_CHUNKS-1}: {dt:.3f}s "
          f"({dt/(N_CHUNKS-1):.3f}s/launch, "
          f"{(N_CHUNKS-1)*CHUNK/dt:.0f} f/s)", flush=True)

    # C: pre-staged, fetch per launch.
    dev_chunks = [tuple(map(jnp.asarray, chunk_np(i))) for i in range(N_CHUNKS)]
    state = create_state(cfg_t)
    state = integrate_chunk(cfg_t, state, *dev_chunks[0])
    fetch_int(state.n_active)
    t0 = time.perf_counter()
    for i in range(1, N_CHUNKS):
        state = integrate_chunk(cfg_t, state, *dev_chunks[i])
        fetch_int(state.n_active)
    dt = time.perf_counter() - t0
    print(f"C per-launch-fetch x{N_CHUNKS-1}: {dt:.3f}s "
          f"({dt/(N_CHUNKS-1):.3f}s/launch)", flush=True)

    # D: bench-loop verbatim (asarray in loop).
    state = create_state(cfg_t)
    state = integrate_chunk(cfg_t, state, *map(jnp.asarray, chunk_np(0)))
    fetch_int(state.n_active)
    t0 = time.perf_counter()
    for i in range(1, N_CHUNKS):
        state = integrate_chunk(cfg_t, state, *map(jnp.asarray, chunk_np(i)))
    fetch_int(state.n_active)
    dt = time.perf_counter() - t0
    print(f"D asarray-in-loop x{N_CHUNKS-1}: {dt:.3f}s "
          f"({dt/(N_CHUNKS-1):.3f}s/launch, "
          f"{(N_CHUNKS-1)*CHUNK/dt:.0f} f/s)", flush=True)

    print(f"n_active={fetch_int(state.n_active)}", flush=True)


if __name__ == "__main__":
    main()

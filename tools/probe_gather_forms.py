#!/usr/bin/env python
"""Compare TPU lowering speed of candidate depth-lookup forms for the TSDF
integrate inner loop.

Workload per step = one (tile-group, frame) body at production scale:
indices (512 blocks x 4096 voxels) into a 288x320 depth image.  The shipped
kernel runs this 8 groups x 20 frames = 160x per chunk, so ms/step x 160
approximates the chunk's lookup spend.

Every timing fetches a data-dependent scalar (sum of the gathered values).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, W = 288, 320
B, V = 512, 4096  # blocks per tile-group, voxels per block
N = H * W


def main():
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.utils.host import fetch_float

    rng = np.random.default_rng(0)
    depth_np = rng.random((H, W), np.float32) + 0.5
    # Spatially coherent indices: each block projects to a small patch.
    cy = rng.integers(12, H - 12, size=(B, 1))
    cx = rng.integers(12, W - 12, size=(B, 1))
    dy = rng.integers(-11, 12, size=(B, V))
    dx = rng.integers(-11, 12, size=(B, V))
    vi_np = (cy + dy).astype(np.int32)
    ui_np = (cx + dx).astype(np.int32)
    flat_np = vi_np * W + ui_np

    depth = jnp.asarray(depth_np)
    vi = jnp.asarray(vi_np)
    ui = jnp.asarray(ui_np)
    flat = jnp.asarray(flat_np)

    def timed(tag, fn, *args, reps=10):
        f = jax.jit(fn)
        fetch_float(f(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        s = fetch_float(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag}: {dt*1e3:8.2f} ms/step  (sum={s:.1f})", flush=True)
        return dt

    # (a) shipped form: flat 1-D gather
    timed("a flat-1d      ", lambda d, ix: d.reshape(-1)[ix].sum(), depth, flat)

    # (b) 2-D advanced indexing
    timed("b 2d-vu        ", lambda d, y, x: d[y, x].sum(), depth, vi, ui)

    # (c) lane-replicated table, take_along_axis over sublanes, 1 piece
    dep_rep = jnp.broadcast_to(depth.reshape(-1, 1), (N, 128))
    dep_rep = jax.device_put(np.ascontiguousarray(np.asarray(dep_rep)))

    def c_form(drep, ix):
        ix2 = ix.reshape(-1, 128)
        return jnp.take_along_axis(drep, ix2, axis=0).sum()

    timed("c talx-1piece  ", c_form, dep_rep, flat)

    # (d) 8-piece lane-replicated take_along_axis + select
    P = 8
    piece = N // P  # 11520
    dep8 = jax.device_put(
        np.ascontiguousarray(
            np.broadcast_to(depth_np.reshape(P, piece, 1), (P, piece, 128))
        )
    )

    def d_form(d8, ix):
        ix2 = ix.reshape(-1, 128)
        pid = ix2 // piece
        loc = ix2 - pid * piece
        out = jnp.zeros_like(ix2, jnp.float32)
        for p in range(P):
            g = jnp.take_along_axis(d8[p], loc, axis=0)
            out = jnp.where(pid == p, g, out)
        return out.sum()

    timed("d talx-8piece  ", d_form, dep8, flat)

    # (e) separable one-hot matmul over per-block 24x24 patches
    PS = 24
    y0 = jnp.asarray((cy - 12).astype(np.int32))  # (B,1)
    x0 = jnp.asarray((cx - 12).astype(np.int32))

    def e_form(d, y, x, yy0, xx0):
        starts = jnp.concatenate([yy0, xx0], axis=1)  # (B,2)
        patch = jax.vmap(
            lambda s: jax.lax.dynamic_slice(d, (s[0], s[1]), (PS, PS))
        )(starts)  # (B,PS,PS)
        ly = (y - yy0)  # (B,V) in [0,PS)
        lx = (x - xx0)
        io = jnp.arange(PS, dtype=jnp.int32)
        oh_y = (ly[..., None] == io).astype(jnp.float32)  # (B,V,PS)
        oh_x = (lx[..., None] == io).astype(jnp.float32)
        tmp = jnp.einsum("bpq,bvq->bvp", patch, oh_x)
        out = jnp.einsum("bvp,bvp->bv", oh_y, tmp)
        return out.sum()

    timed("e onehot-24p f32", e_form, depth, vi, ui, y0, x0)

    # (e2) same but bf16 hi/lo split for exactness at MXU rate
    def e2_form(d, y, x, yy0, xx0):
        starts = jnp.concatenate([yy0, xx0], axis=1)
        patch = jax.vmap(
            lambda s: jax.lax.dynamic_slice(d, (s[0], s[1]), (PS, PS))
        )(starts)
        hi = patch.astype(jnp.bfloat16)
        lo = (patch - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ly = (y - yy0)
        lx = (x - xx0)
        io = jnp.arange(PS, dtype=jnp.int32)
        oh_y = (ly[..., None] == io).astype(jnp.bfloat16)
        oh_x = (lx[..., None] == io).astype(jnp.bfloat16)
        t_hi = jnp.einsum("bpq,bvq->bvp", hi, oh_x,
                          preferred_element_type=jnp.float32)
        t_lo = jnp.einsum("bpq,bvq->bvp", lo, oh_x,
                          preferred_element_type=jnp.float32)
        tmp = t_hi + t_lo
        out = jnp.einsum("bvp,bvp->bv", oh_y.astype(jnp.float32), tmp)
        return out.sum()

    timed("e2 onehot-24p bf", e2_form, depth, vi, ui, y0, x0)

    # (f) pure-compute floor: no gather at all
    timed("f no-gather    ",
          lambda d, ix: (d.reshape(-1)[0] + ix.astype(jnp.float32) * 0).sum(),
          depth, flat)

    # (g) patch extraction alone (cost of vmapped dynamic_slice)
    def g_form(d, yy0, xx0):
        starts = jnp.concatenate([yy0, xx0], axis=1)
        patch = jax.vmap(
            lambda s: jax.lax.dynamic_slice(d, (s[0], s[1]), (PS, PS))
        )(starts)
        return patch.sum()

    timed("g patches-only ", g_form, depth, y0, x0)


if __name__ == "__main__":
    main()

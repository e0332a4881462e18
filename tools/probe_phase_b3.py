#!/usr/bin/env python
"""Phase B lookup variants, round 3: time the EXACT candidates.

From probe_phase_b2: precision (DEFAULT, HIGHEST) on the patch x one-hot
einsum is bit-exact (the one-hot operand needs only one bf16 term; XLA's
operand order in the lowered dot is swapped vs the einsum argument order,
hence dH not Hd) and geom_elem beats geom_einsum.  This probe times:

  full dH        geom_elem + (DEFAULT,HIGHEST)+(HIGHEST) lookup [exact]
  full dH ps32   same with PS=32 patches (traffic/FLOPs ~4x down; real
                 kernel would route big-footprint pairs to a PS64 pass)
  full dH vc1/8  V-chunking 1 vs 8 (intermediate (b,v,PS) sizing)
  full i8        int8 two-step hi/lo (MXU int8 path, s32 accumulate,
                 exact for u16-quantized depth) — plus exactness check
"""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")
faulthandler.dump_traceback_later(1500, exit=True)

TP, V = 512, 4096
C, H, W = 20, 288, 320
M = 12288
T = 57


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (C, H, W)).astype(np.float32))
    f = jnp.asarray(rng.integers(0, C, TP).astype(np.int32))
    widx = jnp.asarray(rng.integers(0, M, TP).astype(np.int32))
    Rwc = jnp.asarray(rng.standard_normal((C, 3, 3)).astype(np.float32))
    twc = jnp.asarray(rng.standard_normal((C, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-2, 2, (TP, V, 3)).astype(np.float32))
    P_ = jax.lax.Precision

    def mk_coords(PS):
        y0 = jnp.asarray(rng.integers(0, H - PS, TP).astype(np.int32))
        x0 = jnp.asarray(rng.integers(0, W - PS, TP).astype(np.int32))
        vi = jnp.asarray(rng.integers(0, PS, (TP, V)).astype(np.int32))
        ui = jnp.asarray(rng.integers(0, PS, (TP, V)).astype(np.int32))
        return y0, x0, vi, ui

    coords = {PS: mk_coords(PS) for PS in (64, 32)}

    def geom_elem(fv, pp):
        R = Rwc[fv]
        t = twc[fv]
        px, py, pz = pp[..., 0], pp[..., 1], pp[..., 2]
        x = (R[:, 0, 0, None] * px + R[:, 0, 1, None] * py
             + R[:, 0, 2, None] * pz + t[:, 0, None])
        y = (R[:, 1, 0, None] * px + R[:, 1, 1, None] * py
             + R[:, 1, 2, None] * pz + t[:, 1, None])
        z = (R[:, 2, 0, None] * px + R[:, 2, 1, None] * py
             + R[:, 2, 2, None] * pz + t[:, 2, None])
        return z

    def patches(fv, PS):
        y0, x0, _, _ = coords[PS]
        starts = jnp.stack([fv, y0, x0], axis=1)
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(
                depth, (st[0], st[1], st[2]), (1, PS, PS))[0])(starts)

    def oh_lookup(patch, PS, VC):
        _, _, vi, ui = coords[PS]
        io = jnp.arange(PS, dtype=jnp.int32)
        yr = vi.reshape(TP, VC, V // VC)
        xr = ui.reshape(TP, VC, V // VC)
        outs = []
        for k in range(VC):
            oh_x = (xr[:, k][..., None] == io).astype(jnp.float32)
            oh_y = (yr[:, k][..., None] == io).astype(jnp.float32)
            tmp = jnp.einsum("bpq,bvq->bvp", patch, oh_x,
                             precision=(P_.DEFAULT, P_.HIGHEST))
            outs.append(jnp.einsum("bvp,bvp->bv", oh_y, tmp,
                                   precision=P_.HIGHEST))
        return jnp.stack(outs, axis=1).reshape(TP, V)

    def i8_lookup(patch, PS, VC):
        _, _, vi, ui = coords[PS]
        io = jnp.arange(PS, dtype=jnp.int32)
        q = jnp.round(patch * (65534.0 / 4.0)).astype(jnp.int32)
        qh = (q >> 8).astype(jnp.int8)
        ql = (q & 0xFF).astype(jnp.int8)  # int8 holds 0..255? NO: -128..127
        # encode bytes offset by -128 to fit int8, undo after contraction:
        qh8 = (q >> 8).astype(jnp.int32) - 128
        ql8 = (q & 0xFF) - 128
        both = jnp.concatenate([qh8, ql8], axis=1).astype(jnp.int8)
        yr = vi.reshape(TP, VC, V // VC)
        xr = ui.reshape(TP, VC, V // VC)
        del qh, ql
        outs = []
        for k in range(VC):
            oh_x = (xr[:, k][..., None] == io).astype(jnp.int8)
            oh_y = (yr[:, k][..., None] == io).astype(jnp.int8)
            tmp = jax.lax.dot_general(
                both, oh_x, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (b, 2PS, v)
            tmp = jnp.moveaxis(tmp, 1, 2)  # (b, v, 2PS)
            th, tl = tmp[..., :PS], tmp[..., PS:]
            dq = jax.lax.dot_general(
                (th * 256 + tl).astype(jnp.float32)[..., None, :],
                oh_y.astype(jnp.float32)[..., None, :],
                (((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
                precision=P_.HIGHEST)[..., 0, 0]
            # undo the -128 offsets: sum(oh)=1 per row -> offset is
            # 128*256 + 128 exactly once
            outs.append((dq + 128.0 * 256.0 + 128.0) * (4.0 / 65534.0))
        return jnp.stack(outs, axis=1).reshape(TP, V)

    def gather_truth(PS):
        y0, x0, vi, ui = coords[PS]
        flat = (f[:, None] * (H * W) + (y0[:, None] + vi) * W
                + (x0[:, None] + ui))
        return depth.reshape(-1)[flat]

    from mq3d_tpu.utils.host import fetch_float

    # exactness of the i8 path vs the U16-QUANTIZED truth
    patch0 = patches(f, 64)
    tq = np.round(np.asarray(gather_truth(64)) * (65534.0 / 4.0))
    got = np.asarray(i8_lookup(patch0, 64, 4)) * (65534.0 / 4.0)
    print("i8 exact vs quantized truth:",
          bool(np.allclose(np.round(got), tq)),
          " max|err|=", float(np.abs(np.round(got) - tq).max()), flush=True)

    def timed(tag, fn):
        runf = jax.jit(fn)
        fetch_float(runf(jnp.float32(0.0)))
        ts = []
        for r in range(2):
            t0 = time.perf_counter()
            fetch_float(runf(jnp.float32(r + 1.0)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / T * 1e3
        print(f"{tag:16s}: {ms:6.2f} ms/tile ({ms * T:6.1f} ms/chunk-57)",
              flush=True)

    def full(look, PS, VC):
        def run(seed):
            def body(t, acc):
                s, sums = acc
                fv = (f + t) % C
                z = geom_elem(fv, p + s * 1e-6)
                patch = patches(fv, PS)
                d = look(patch, PS, VC)
                obs = jnp.minimum(d - z, 0.1)
                sums = sums.at[widx].add(obs)
                return (s + sums[0, 0], sums)
            s, sums = jax.lax.fori_loop(
                0, T, body, (seed, jnp.zeros((M + 1, V), jnp.float32)))
            return s + sums.sum()
        return run

    timed("full dH ps64", full(oh_lookup, 64, 4))
    timed("full dH ps32", full(oh_lookup, 32, 4))
    timed("full dH vc1", full(oh_lookup, 64, 1))
    timed("full dH vc8", full(oh_lookup, 64, 8))
    timed("full i8 ps64", full(i8_lookup, 64, 4))
    timed("full i8 ps32", full(i8_lookup, 32, 4))


if __name__ == "__main__":
    main()

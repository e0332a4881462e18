#!/usr/bin/env python
"""Phase A component costs at production shapes on the real bench capture
(follow-up to probe_devres.py: Phase A + fixed ~ 78 ms/chunk while the
scatter-count arithmetic only accounts for ~26 ms).

Times, each as its own jitted program over the same staged chunk:

  cand      _candidate_keys only
  dedup     + _dedup_candidates
  touch     full _frame_touch_grid (adds the kept-scatter)
  touch2    two-level dedup variant: re-group the level-1 survivors and
            keep 24 distinct again before scattering (5.3x fewer indices;
            exactness guarded by the same n_missed fallback chain)
  alloc     _alloc_and_window on the chunk-union grid
  allocM    same but only M=12288 searchsorted queries for new blocks
            (new-per-chunk <= touched-per-chunk <= M on any windowed pass)
  pairs     _pairs_from_grid

Prints ms/call (forced scalar-fetch sync, best of 3 after compile).
"""

import faulthandler
import sys
import time

import numpy as np

sys.path.insert(0, ".")
faulthandler.dump_traceback_later(1500, exit=True)

import bench  # noqa: E402

CH = bench.CHUNK


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mq3d_tpu.ops import tsdf as TT
    from mq3d_tpu.utils.host import fetch_float, fetch_int

    cfg = __import__("tools.probe_integrate_decomp", fromlist=["x"]).make_cfg()
    depth, K, T_wc, valid, gt, scene_cfg = bench.make_capture()
    print("[probe] capture ready", flush=True)

    d = jax.device_put(depth[:CH])
    Ki = jax.device_put(np.ascontiguousarray(K[:CH]))
    Ti = jax.device_put(np.ascontiguousarray(np.asarray(T_wc[:CH], np.float32)))
    vi = jax.device_put(valid[:CH])
    fetch_float(d[-1, -1, -1])

    G3 = cfg.grid_dim ** 3
    M = cfg.chunk_active_capacity

    state = TT.create_state(cfg)
    state = TT.integrate_chunk(cfg, state, d, Ki, Ti, vi)
    fetch_int(state.n_active)

    def timed(tag, fn, *args):
        jf = jax.jit(fn)
        r = jf(*args)
        fetch_float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
                    .astype(jnp.float32))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = jf(*args)
            fetch_float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
                        .astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:8s}: {min(ts) * 1e3:7.1f} ms", flush=True)
        return r

    timed("cand", lambda a, b, c, e: TT._candidate_keys(cfg, a, b, c, e),
          d, Ki, Ti, vi)
    timed("dedup",
          lambda a, b, c, e: TT._dedup_candidates(
              TT._candidate_keys(cfg, a, b, c, e), G3)[0],
          d, Ki, Ti, vi)
    ft = timed("touch", lambda a, b, c, e: TT._frame_touch_grid(
        cfg, a, b, c, e), d, Ki, Ti, vi)

    def touch2(a, b, c, e):
        keys = TT._candidate_keys(cfg, a, b, c, e)
        kept, miss1 = TT._dedup_candidates(keys, G3)
        C = keys.shape[0]
        # level-2: regroup level-1 survivors (C, n_groups*24) and thin again
        flat = kept.reshape(C, -1)
        n = flat.shape[1]
        pad = (-n) % TT._DEDUP_GROUP
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=G3)
        g = flat.reshape(C, -1, TT._DEDUP_GROUP)
        outs = []
        cur = g
        for _ in range(TT._DEDUP_KEEP):
            m = jnp.min(cur, axis=-1, keepdims=True)
            outs.append(m[..., 0])
            cur = jnp.where(cur == m, G3, cur)
        miss2 = jnp.sum(jnp.min(cur, axis=-1) < G3)
        kept2 = jnp.stack(outs, axis=-1)
        off = (jnp.arange(C, dtype=jnp.int32) * (G3 + 1))[:, None, None]
        flat2 = (kept2 + off).reshape(-1)
        grid = jnp.zeros((C * (G3 + 1),), jnp.uint8).at[flat2].max(
            jnp.uint8(1))
        return grid, miss1 + miss2

    t2 = timed("touch2", touch2, d, Ki, Ti, vi)
    same = bool(np.array_equal(np.asarray(ft), np.asarray(t2[0])))
    print(f"touch2 == touch: {same}  (miss={int(t2[1])})", flush=True)

    frame_touched = np.asarray(ft)
    union = (frame_touched.reshape(CH, G3 + 1).max(axis=0))[:G3]
    union_j = jax.device_put(union)

    timed("alloc", lambda u: TT._alloc_and_window(cfg, state, u, 0)[:5],
          union_j)

    def alloc_m(u):
        # identical math, M-bounded new-block query window
        cap = cfg.block_count
        new_mask = (u > 0) & (state.slot_table < 0)
        ranks = jnp.cumsum(new_mask.astype(jnp.int32))
        qn = jnp.arange(1, M + 1, dtype=jnp.int32)
        key_of_new = jnp.searchsorted(ranks, qn).astype(jnp.int32)
        return key_of_new.sum() + ranks[-1]

    timed("allocM", alloc_m, union_j)
    timed("pairs", lambda ftg: TT._pairs_from_grid(
        cfg, ftg, jnp.arange(M, dtype=jnp.int32), jnp.ones(M, bool), CH), ft)


if __name__ == "__main__":
    main()

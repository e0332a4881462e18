#!/usr/bin/env python
"""Can Mosaic on this toolchain do dynamic gathers from a VMEM table?

Round 1 reported crashes on vector gathers; this probes exactly which forms
work: jnp.take / indexing of a VMEM scratch table with a vector of runtime
indices, at several table sizes, plus a scalar-loop fallback.
"""

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, fn, *args, n=5):
    try:
        r = np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        print(f"[ok] {name}: {dt * 1e3:8.2f} ms  checksum {r.ravel()[:3]}")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


N_IDX = 1 << 19


def make(table_elems, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random(table_elems).astype(dtype))
    idx = jnp.asarray(rng.integers(0, table_elems, N_IDX).astype(np.int32))
    return tab, idx


# --- A: whole table as VMEM input, vector indexing via jnp.take ------------
def gather_take_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def try_take(table_elems):
    tab, idx = make(table_elems)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            gather_take_kernel,
            out_shape=jax.ShapeDtypeStruct((N_IDX,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    mb = table_elems * 4 / 1e6
    return timed(f"pallas take, {mb:.0f}MB table, 512k idx", run, tab, idx)


# --- B: 2-D table form (sublane, lane) indexing -----------------------------
def gather2d_kernel(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]  # (Rows, 128)
    i = idx_ref[:]
    out_ref[:] = t.reshape(-1)[i]


def try_index2d(table_elems):
    tab, idx = make(table_elems)
    tab2 = tab.reshape(-1, 128)

    @jax.jit
    def run(tab2, idx):
        return pl.pallas_call(
            gather2d_kernel,
            out_shape=jax.ShapeDtypeStruct((N_IDX,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2, idx)

    mb = table_elems * 4 / 1e6
    return timed(f"pallas flat-index, {mb:.0f}MB table", run, tab2, idx)


# --- C: grid over index blocks, table resident across grid ------------------
def gather_grid_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def try_grid(table_elems, blk=8192):
    tab, idx = make(table_elems)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            gather_grid_kernel,
            out_shape=jax.ShapeDtypeStruct((N_IDX,), jnp.float32),
            grid=(N_IDX // blk,),
            in_specs=[
                pl.BlockSpec((table_elems,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(tab, idx)

    mb = table_elems * 4 / 1e6
    return timed(f"pallas grid take, {mb:.0f}MB table, blk {blk}", run, tab, idx)


if __name__ == "__main__":
    print(f"jax {jax.__version__}")
    try_take(1 << 20)        # 4 MB
    try_take(1 << 22)        # 16 MB
    try_index2d(1 << 20)
    try_grid(1 << 20)
    try_take(1 << 23)        # 32 MB
    try_take(1 << 24)        # 64 MB
    try_take(1 << 25)        # 128 MB

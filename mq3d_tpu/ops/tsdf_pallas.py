"""Pallas TPU kernel for the TSDF integrate depth lookup.

Replaces the one-hot patch-matmul formulation of the per-voxel depth
fetch (ops/tsdf.py `_integrate_pairs.onehot_lookup`) with a direct
VMEM-resident gather: each (window-block, frame) pair's PSxPS depth
patch is row-gathered by the voxels' in-patch row indices (Mosaic
supports gathers on 2-D operands — the 1-D form is what round 2's port
attempt died on, tools/probe_pallas_gather.py), then the column is
selected with a 64-lane one-hot multiply-sum on the VPU.

Cost per pair: V row-gathers of PS lanes + V*PS VPU MACs, vs the
one-hot form's V*PS*PS MXU MACs — PS(=64)x fewer multiply-adds and no
(pairs, V, PS) one-hot operands materialized to HBM.

Semantics (must stay bit-identical to the XLA forms):
  out[p, v] = patch[p, vi[p, v], ui[p, v]]   if 0 <= vi, ui < PS
            = 0.0                            otherwise
matching the one-hot path where an out-of-patch voxel matches no
selector column and reads 0.0 (those voxels are exactly the ones the
caller's `ok` mask discards).

Reference semantics being accelerated: Open3D VoxelBlockGrid.integrate's
per-voxel nearest depth fetch (o3d_utils.py:212-229 in the reference).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pairs per grid step: bounds VMEM (PB patches + index/output blocks) and
# unrolls the per-pair gather loop.
_PB = 8


def _lookup_kernel(patch_ref, vi_ref, ui_ref, out_ref):
    PS = patch_ref.shape[-1]
    V = vi_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (V, PS), 1)
    for p in range(_PB):
        vi = vi_ref[p]
        ui = ui_ref[p]
        in_patch = (vi >= 0) & (vi < PS) & (ui >= 0) & (ui < PS)
        rows = jnp.take(
            patch_ref[p], jnp.clip(vi, 0, PS - 1), axis=0,
            unique_indices=False, indices_are_sorted=False,
        )  # (V, PS)
        onehot = (jnp.clip(ui, 0, PS - 1)[:, None] == lane)
        d = jnp.sum(jnp.where(onehot, rows, 0.0), axis=1)
        out_ref[p] = jnp.where(in_patch, d, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def patch_lookup(patch, vi, ui, interpret=False):
    """Per-pair patch gather: (TP,PS,PS) f32, (TP,V) i32 x2 -> (TP,V) f32.

    TP must be a multiple of _PB; V a multiple of 128.
    """
    TP, PS, _ = patch.shape
    V = vi.shape[1]
    assert TP % _PB == 0 and V % 128 == 0, (TP, V)
    grid = (TP // _PB,)
    return pl.pallas_call(
        _lookup_kernel,
        out_shape=jax.ShapeDtypeStruct((TP, V), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PB, PS, PS), lambda i: (i, 0, 0)),
            pl.BlockSpec((_PB, V), lambda i: (i, 0)),
            pl.BlockSpec((_PB, V), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_PB, V), lambda i: (i, 0)),
        interpret=interpret,
    )(patch, vi, ui)

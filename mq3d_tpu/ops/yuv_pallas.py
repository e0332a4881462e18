"""Pallas TPU kernel: fused I420 -> BGR color conversion.

The preprocessing kernel from the build plan (SURVEY.md §7 step 2): the
fixed-point BT.601 conversion of ops/yuv.py as a hand-tiled Pallas kernel —
row-striped grid, luma/chroma blocks staged through VMEM, chroma upsampled
in-register with pltpu.repeat, all integer VPU math.  Bit-identical to the
XLA path (and to OpenCV); selected automatically on TPU backends, with the
XLA version serving CPU/interpret runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SHIFT = 20
_HALF = 1 << (_SHIFT - 1)
_CY = 1220542
_CUB = 2116026
_CUG = -409993
_CVG = -852492
_CVR = 1673527

ROW_TILE = 64  # luma rows per grid step (chroma: 32)


def _i420_kernel(y_ref, u_ref, v_ref, b_ref, g_ref, r_ref):
    """Chroma-resolution 2x2-quad formulation: y_ref is (4, h/2, w/2) — the
    four luma subplanes of each chroma sample — so every op is elementwise
    at a single resolution (the Mosaic toolchain here miscompiles in-kernel
    2x upsampling).  All constants pinned to int32: under jax_enable_x64
    weak literals otherwise promote to 64-bit ops Mosaic cannot lower."""
    i32 = jnp.int32
    uu = u_ref[:].astype(i32) - i32(128)
    vv = v_ref[:].astype(i32) - i32(128)
    ruv = i32(_HALF) + i32(_CVR) * vv
    guv = i32(_HALF) + i32(_CVG) * vv + i32(_CUG) * uu
    buv = i32(_HALF) + i32(_CUB) * uu
    lo = jnp.int32(0)
    hi = jnp.int32(255)
    shift = jnp.int32(_SHIFT)

    def sat(x):
        # jnp.clip recurses under x64 weak-type promotion inside pallas
        # tracing; explicit int32 min/max avoids it.
        return jnp.minimum(jnp.maximum(x >> shift, lo), hi).astype(jnp.uint8)

    for s in range(4):
        y00 = jnp.maximum(y_ref[s].astype(i32) - i32(16), i32(0)) * i32(_CY)
        r_ref[s] = sat(y00 + ruv)
        g_ref[s] = sat(y00 + guv)
        b_ref[s] = sat(y00 + buv)


@partial(jax.jit, static_argnames=("interpret",))
def _convert_padded(y, u, v, interpret: bool = False):
    """(h, w) luma + (h/2, w/2) chroma -> 3x (h, w) uint8 planes (b, g, r).

    Outside the kernel (plain XLA): split luma into the four 2x2 subplanes
    and re-interleave the outputs; the Pallas kernel does all the
    fixed-point color arithmetic at chroma resolution.
    """
    h, w = y.shape
    hc, wc = h // 2, w // 2
    grid = (hc // (ROW_TILE // 2),)
    quad_spec = pl.BlockSpec(
        (4, ROW_TILE // 2, wc), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    chroma_spec = pl.BlockSpec(
        (ROW_TILE // 2, wc), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # Mosaic miscompiles these kernels when traced under jax_enable_x64
    # (grid indexing picks up 64-bit types); trace with x64 off — the kernel
    # is pure 8/32-bit anyway.
    with jax.enable_x64(False):
        y_sub = jnp.stack(
            [y[0::2, 0::2], y[0::2, 1::2], y[1::2, 0::2], y[1::2, 1::2]]
        )
        outs = pl.pallas_call(
            _i420_kernel,
            grid=grid,
            out_shape=[jax.ShapeDtypeStruct((4, hc, wc), jnp.uint8)] * 3,
            in_specs=[quad_spec, chroma_spec, chroma_spec],
            out_specs=[quad_spec] * 3,
            interpret=interpret,
        )(y_sub, u, v)

        def interleave(sub):  # (4, hc, wc) -> (h, w), XLA-side
            top = jnp.stack([sub[0], sub[1]], axis=-1).reshape(hc, w)
            bot = jnp.stack([sub[2], sub[3]], axis=-1).reshape(hc, w)
            return jnp.stack([top, bot], axis=1).reshape(h, w)

        return [interleave(o) for o in outs]


def yuv420_to_bgr_pallas(y, u, v, interpret: bool = False) -> np.ndarray:
    """(N|-, H, W) planes -> (..., H, W, 3) BGR uint8 via the Pallas kernel.

    Frames are padded to the (ROW_TILE, 128) tile grid and cropped back.
    """
    y = np.asarray(y)
    batched = y.ndim == 3
    ys = y if batched else y[None]
    us = np.asarray(u) if batched else np.asarray(u)[None]
    vs = np.asarray(v) if batched else np.asarray(v)[None]

    n, h, w = ys.shape
    hp = -(-h // ROW_TILE) * ROW_TILE
    wp = -(-w // 256) * 256  # chroma width must also hit the 128 lane tile
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        yp = np.zeros((hp, wp), np.uint8)
        yp[:h, :w] = ys[i]
        up = np.zeros((hp // 2, wp // 2), np.uint8)
        up[: h // 2, : w // 2] = us[i]
        vp = np.zeros((hp // 2, wp // 2), np.uint8)
        vp[: h // 2, : w // 2] = vs[i]
        b, g, r = _convert_padded(yp, up, vp, interpret=interpret)
        out[i] = np.stack(
            [np.asarray(b)[:h, :w], np.asarray(g)[:h, :w], np.asarray(r)[:h, :w]], -1
        )
    return out if batched else out[0]


def pallas_supported() -> bool:
    """Pallas path needs a real TPU backend (CPU runs use interpret/XLA)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

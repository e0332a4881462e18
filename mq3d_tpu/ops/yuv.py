"""YUV420_888 -> RGB conversion and image-quality filters, TPU-batched.

Re-design of the reference's per-frame OpenCV path (reference:
scripts/utils/image_utils.py:6-89, scripts/processing/yuv_conversion/
convert_yuv_dir.py:15-105).  The reference de-strides planes with a Python
row loop and calls cv2.COLOR_YUV2BGR_I420 per frame inside a process pool;
here de-striding is pure numpy slicing and the color conversion is a single
batched integer kernel over a stack of frames, bit-exact with OpenCV's
fixed-point BT.601 path (validated in tests against cv2).

OpenCV's ITU-R BT.601 fixed-point constants (20-bit shift):
  CY=1220542  CUB=2116026  CUG=-409993  CVG=-852492  CVR=1673527
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mq3d_tpu.models.camera import ImageFormatInfo

_SHIFT = 20
_CY = 1220542
_CUB = 2116026
_CUG = -409993
_CVG = -852492
_CVR = 1673527


# ---------------------------------------------------------------------------
# Host-side plane de-striding (memory reshuffling, not compute)
# ---------------------------------------------------------------------------

def destride_plane(data: np.ndarray, offset: int, width: int, height: int,
                   row_stride: int, pixel_stride: int) -> np.ndarray:
    """Extract a (height, width) plane from a strided Android image buffer
    (replaces the Python row loop of reference image_utils.py:6-16 with a
    single strided view + copy)."""
    needed = offset + (height - 1) * row_stride + width * pixel_stride
    flat = np.frombuffer(data, dtype=np.uint8, count=min(needed, len(data)))
    # Pad if the final row is short of a full stride (legal in the format).
    if len(flat) < needed:
        flat = np.concatenate([flat, np.zeros(needed - len(flat), np.uint8)])
    rows = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=(height, width), strides=(row_stride, pixel_stride)
    )
    return np.ascontiguousarray(rows)


def split_yuv420_planes(
    raw_data: bytes | np.ndarray, format_info: ImageFormatInfo, uv_order: str = "NV12"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Raw YUV420_888 buffer -> (Y, U, V) planes.

    Handles planar (pixel_stride 1) and semi-planar NV12/NV21 (pixel_stride 2)
    chroma layouts (reference image_utils.py:19-57).
    """
    w, h = format_info.width, format_info.height
    planes = format_info.planes
    if len(planes) != 3:
        raise ValueError("Expected 3 planes for YUV420_888 format")

    y = destride_plane(raw_data, 0, w, h, planes[0].row_stride, planes[0].pixel_stride)
    u_offset = planes[0].buffer_size
    cw, ch = w // 2, h // 2
    ps_uv = planes[1].pixel_stride
    rs_uv = planes[1].row_stride

    if ps_uv == 1:
        u = destride_plane(raw_data, u_offset, cw, ch, rs_uv, 1)
        v_offset = u_offset + planes[1].buffer_size
        v = destride_plane(raw_data, v_offset, cw, ch, planes[2].row_stride, 1)
    else:
        first = destride_plane(raw_data, u_offset, cw, ch, rs_uv, ps_uv)
        second = destride_plane(raw_data, u_offset + 1, cw, ch, rs_uv, ps_uv)
        if uv_order == "NV21":
            v, u = first, second
        else:
            u, v = first, second
    return y, u, v


def assemble_i420(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Planes -> packed I420 buffer of shape (H*3//2, W), as cv2 expects."""
    h, w = y.shape
    return np.concatenate([y.ravel(), u.ravel(), v.ravel()]).reshape(h * 3 // 2, w)


# ---------------------------------------------------------------------------
# Device-side batched color conversion (bit-exact with OpenCV BT.601)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("order",))
def yuv420_to_8uc3(y, u, v, order: str = "bgr"):
    """Batched (N, H, W) planes + (N, H/2, W/2) chroma -> (N, H, W, 3) uint8.

    Integer math replicates OpenCV's cvtColor(..., COLOR_YUV2BGR_I420)
    fixed-point path exactly, so outputs are byte-identical to the
    reference's PNGs.
    """
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)

    # Upsample chroma 2x (nearest, matching I420 sampling).
    u_full = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1)
    v_full = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)

    uu = u_full - 128
    vv = v_full - 128
    half = 1 << (_SHIFT - 1)
    ruv = half + _CVR * vv
    guv = half + _CVG * vv + _CUG * uu
    buv = half + _CUB * uu

    y00 = jnp.maximum(y - 16, 0) * _CY
    r = jnp.clip((y00 + ruv) >> _SHIFT, 0, 255).astype(jnp.uint8)
    g = jnp.clip((y00 + guv) >> _SHIFT, 0, 255).astype(jnp.uint8)
    b = jnp.clip((y00 + buv) >> _SHIFT, 0, 255).astype(jnp.uint8)

    channels = (b, g, r) if order == "bgr" else (r, g, b)
    return jnp.stack(channels, axis=-1)


def convert_yuv420_888_to_bgr(
    raw_data, format_info: ImageFormatInfo, uv_order: str = "NV12"
) -> np.ndarray:
    """Single-frame convenience wrapper matching the reference API
    (reference image_utils.py:60-71)."""
    y, u, v = split_yuv420_planes(raw_data, format_info, uv_order)
    out = yuv420_to_8uc3(y[None], u[None], v[None], order="bgr")
    return np.asarray(out[0])


def convert_yuv_batch(
    raw_buffers: list, format_info: ImageFormatInfo, uv_order: str = "NV12"
) -> np.ndarray:
    """Batched conversion: de-stride on host, convert the full stack in one
    device launch. Returns (N, H, W, 3) BGR uint8."""
    ys, us, vs = [], [], []
    for raw in raw_buffers:
        y, u, v = split_yuv420_planes(raw, format_info, uv_order)
        ys.append(y)
        us.append(u)
        vs.append(v)
    out = yuv420_to_8uc3(np.stack(ys), np.stack(us), np.stack(vs), order="bgr")
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Image-quality filters (blur / exposure), batched
# ---------------------------------------------------------------------------

@jax.jit
def bgr_to_gray(bgr):
    """OpenCV-exact BGR -> gray: round(0.299 R + 0.587 G + 0.114 B) with
    banker's rounding (cv2 >= 5 computes this path in float)."""
    b = bgr[..., 0].astype(jnp.float64)
    g = bgr[..., 1].astype(jnp.float64)
    r = bgr[..., 2].astype(jnp.float64)
    return jnp.rint(0.299 * r + 0.587 * g + 0.114 * b).astype(jnp.uint8)


@jax.jit
def laplacian_variance(gray):
    """Blur metric: variance of the 3x3 Laplacian with reflect-101 borders,
    matching cv2.Laplacian(img, CV_64F).var()
    (reference image_utils.py:74-75).  gray: (..., H, W) uint8."""
    x = gray.astype(jnp.float32)
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="reflect")
    lap = (
        p[..., :-2, 1:-1] + p[..., 2:, 1:-1] + p[..., 1:-1, :-2] + p[..., 1:-1, 2:]
        - 4.0 * x
    )
    mean = jnp.mean(lap, axis=(-2, -1), keepdims=True)
    return jnp.mean((lap - mean) ** 2, axis=(-2, -1))


@jax.jit
def exposure_cdf(gray):
    """Normalized histogram CDF over 256 bins (reference image_utils.py:78-83).
    gray: (..., H, W) uint8 -> (..., 256) float32."""
    flat = gray.reshape((-1,) if gray.ndim == 2 else (gray.shape[0], -1))

    def hist_one(v):
        h = jnp.zeros((256,), jnp.float32).at[v].add(1.0)
        return h / jnp.sum(h)

    if flat.ndim == 1:
        cdf = jnp.cumsum(hist_one(flat))
    else:
        cdf = jnp.cumsum(jax.vmap(hist_one)(flat), axis=-1)
    return cdf


def is_over_or_under_exposed(gray, low_thresh=0.02, high_thresh=0.02) -> np.ndarray:
    """cum[5] > low or cum[250] < high (reference image_utils.py:78-83)."""
    cdf = np.asarray(exposure_cdf(gray))
    return (cdf[..., 5] > low_thresh) | (cdf[..., 250] < high_thresh)


def is_blur_image(bgr, blur_threshold: float = 50.0) -> np.ndarray:
    gray = bgr_to_gray(bgr)
    return np.asarray(laplacian_variance(gray)) < blur_threshold

"""TSDF raycasting: depth rendering without Embree.

The reference renders color-aligned depth by building an Embree
RaycastingScene over the extracted mesh and casting pinhole rays per frame
(reference: scripts/processing/reconstruction/utils/o3d_utils.py:324-341,
reconstruct_scene.py:180-226).  A BVH is the wrong tool on TPU; since we own
the TSDF volume we sphere-trace it directly.

TPU-first design, sized by measured v5e rates (tools/probe_gather*.py):
random gathers run at only ~30-70 M/s and every extra launch pays a ~10 ms+
tunneled-dispatch cost, so the renderer (a) fuses the whole frame batch into
ONE jitted program and (b) budgets *gathers per output pixel*:

  prep    (per volume revision, cached)
          - slot_dist (G^3,) int32 fused table: >= 0 -> block slot, < 0 ->
            minus the block-level Chebyshev distance to the nearest
            allocated block (one gather = slot AND skip distance)
          - ext (n_bucket*17^3+1,) f32: per-block extended tsdf (the +1
            face/edge/corner voxels copied from the 7 positive neighbors),
            +2.0 sentinel where unobserved.  Trilinear cells never straddle
            blocks, so one slot lookup serves all 8 corners.
  march   unified while_loop, 2 gathers/step: tsdf-proportional steps in the
          truncation band, Chebyshev block skips in empty space; returns a
          bracketing sample pair around the zero crossing.
  refine  bracket expanded one voxel (nearest-voxel staircase noise), 4
          dense trilinear samples re-bracket on the smooth field, then two
          false-position iterations + closing secant (~54 gathers, only
          where it runs) -> ~0.01 mm residual on the trilinear field.
  pyramid only 1/8 is marched+refined in full; every finer level is a
          DENSE upsampling in 1/z (bilinear on inverse depth is exact for
          planar surfaces) with march+refine only for *edge pixels* (depth
          discontinuities / curvature), compacted to per-level fixed-
          capacity buffers so the while_loop never runs at full width.
          Cost model: dead lanes still gather every iteration, so each
          level's cost is its STATIC cap width x the last-live-lane
          iteration count.  Caps hug measured edge densities: edges are
          curves, so each level's cap is a per-frame multiple of
          sqrt(h*w) (loosest at the first fine level, tightest at full
          res), not an area fraction — area fractions starve small
          frames, where the constant-width edge band is a large share of
          the pixels.  An undersized MID cap is the expensive failure
          mode — unprocessed overflow re-flags ~2x wider at the next
          level and cascades.
          pyramid_scales trades static width against serial while_loop
          depth ([8,4,2,1] default; [8,2,1]/[8,1] fewer-but-wider).

Matches Open3D's t_hit convention: pinhole ray directions are the
*unnormalized* K^-1 (u,v,1), so t_hit equals camera z-depth; misses are inf.
"""

from __future__ import annotations

from functools import partial

import math

import jax
import jax.numpy as jnp
import numpy as np

from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFState, TSDFVolume, _block_keys

_SENTINEL = 2.0  # ext-table value for unobserved voxels (tsdf in [-1, 1])
_DIST_MAX = 15  # Chebyshev distance-field saturation (blocks)
_EXT = 17  # extended block side (R + 1)
_EXT3 = _EXT * _EXT * _EXT
_F32 = jnp.float32  # x64 is enabled package-wide; pin everything


@partial(jax.jit, static_argnames=("cfg", "n_bucket"))
def prepare_scene(cfg: TSDFConfig, state: TSDFState, n_bucket: int):
    """Precompute (slot_dist (G^3,) int32, ext (n_bucket*17^3+1,) f32).

    n_bucket is a static power-of-two bucket >= n_active so the ext table
    is sized by actual occupancy, not capacity (a 50k-block table would be
    ~1 GB; a real scene's ~8k blocks are ~160 MB)."""
    G = cfg.grid_dim
    R = cfg.block_resolution
    cap = cfg.block_count

    occupied = state.slot_table >= 0

    # Chebyshev distance to the nearest allocated block, saturated at
    # _DIST_MAX: separable 3-window min-dilations (K rounds = exact up to K).
    # jnp.roll wraps at borders, which only *shrinks* steps — conservative.
    dist = jnp.where(occupied, 0, _DIST_MAX).astype(jnp.int32).reshape(G, G, G)

    def dilate_round(d, _):
        m = d
        for axis in range(3):
            m = jnp.minimum(
                m, jnp.minimum(jnp.roll(m, 1, axis), jnp.roll(m, -1, axis))
            )
        return jnp.minimum(d, m + 1), None

    dist, _ = jax.lax.scan(dilate_round, dist, None, length=_DIST_MAX)
    slot_dist = jnp.where(
        occupied, state.slot_table, -dist.reshape(-1)
    ).astype(jnp.int32)

    packed = jnp.where(state.weight > 0, state.tsdf, _SENTINEL)
    packed = packed.at[cap].set(_SENTINEL)  # sentinel row

    neighbor_offsets = [
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    ]

    slots = jnp.arange(n_bucket, dtype=jnp.int32)
    in_range = slots < state.n_active
    slots_safe = jnp.minimum(slots, cap)
    coords = state.block_coords[slots_safe]
    own = packed[slots_safe].reshape(n_bucket, R, R, R)
    own = jnp.where(in_range[:, None, None, None], own, _SENTINEL)

    ext = jnp.full((n_bucket, _EXT, _EXT, _EXT), _SENTINEL, _F32)
    ext = ext.at[:, :R, :R, :R].set(own)
    for off in neighbor_offsets:
        nb_key = _block_keys(coords + jnp.asarray(off, jnp.int32), G)
        nb_slot = state.slot_table[jnp.minimum(nb_key, G ** 3 - 1)]
        nb_ok = (nb_key < G ** 3) & (nb_slot >= 0) & in_range
        nb = packed[jnp.where(nb_ok, nb_slot, cap)].reshape(n_bucket, R, R, R)
        src = tuple(slice(0, 1) if o else slice(0, R) for o in off)
        dst = tuple(slice(R, R + 1) if o else slice(0, R) for o in off)
        val = jnp.where(
            nb_ok[:, None, None, None], nb[(slice(None),) + src], _SENTINEL
        )
        ext = ext.at[(slice(None),) + dst].set(val)

    # Pack overlapping z-pairs: entry (b, x, y, z) holds f16(v[z]) in the
    # low half and f16(v[z+1]) in the high half of one uint32 (z+1 == 17
    # reads the sentinel).  Any trilinear cell's 8 corners are then 4
    # gathers — the corners differ in z by exactly one — and the march
    # unpacks the low half only.  f16 tsdf loses ~5e-4 of the truncation
    # band near |v|=1 and far less near the zero crossing the refine
    # interpolates (f16 absolute resolution shrinks with magnitude):
    # ~0.03 mm worst-case on surface position at trunc = 10 voxels.
    nxt = jnp.concatenate(
        [ext[..., 1:], jnp.full_like(ext[..., :1], _SENTINEL)], axis=-1
    )
    lo16 = jax.lax.bitcast_convert_type(
        ext.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    hi16 = jax.lax.bitcast_convert_type(
        nxt.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    pair = lo16 | (hi16 << 16)
    sent16 = jax.lax.bitcast_convert_type(
        jnp.float16(_SENTINEL), jnp.uint16).astype(jnp.uint32)
    ext_flat = jnp.concatenate(
        [pair.reshape(-1), (sent16 | (sent16 << 16))[None]]
    )

    # World-space AABB of the active blocks (one voxel of pad): rays are
    # clipped to their [entry, exit] span, so misses and empty approach
    # retire in a few steps instead of marching to the global t_max.
    vs = cfg.voxel_size
    big = jnp.int32(1 << 28)
    c_lo = jnp.where(in_range[:, None], coords, big).min(0)
    c_hi = jnp.where(in_range[:, None], coords, -big).max(0) + 1
    aabb = jnp.stack([
        c_lo.astype(_F32) * (R * vs) - vs,
        c_hi.astype(_F32) * (R * vs) + vs,
    ])
    return slot_dist, ext_flat, aabb


def _sample_ids(cfg: TSDFConfig, n_bucket: int, slot_dist, g):
    """Integer lattice coords g (..., 3) -> (ext index, slot_dist value)."""
    R = cfg.block_resolution
    G = cfg.grid_dim
    b = jnp.floor_divide(g, R)
    local = g - b * R
    key = _block_keys(b, G)
    sd = jnp.where(
        key < G ** 3,
        slot_dist[jnp.minimum(key, G ** 3 - 1)],
        jnp.int32(-_DIST_MAX),
    )
    li = (local[..., 0] * _EXT + local[..., 1]) * _EXT + local[..., 2]
    idx = jnp.where(sd >= 0, sd * _EXT3 + li, n_bucket * _EXT3)
    return idx, sd


def _unpack_lo(u):
    """Low f16 of a packed z-pair -> f32."""
    return jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(_F32)


def _unpack_hi(u):
    return jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.float16).astype(_F32)


def _trilinear(cfg: TSDFConfig, n_bucket: int, slot_dist, ext, p):
    """Trilinear tsdf at world points (..., 3): 1 slot + 4 z-pair gathers
    (each packed entry carries the two z-adjacent corners).
    Returns (value, valid)."""
    gf = p / cfg.voxel_size
    g0 = jnp.floor(gf).astype(jnp.int32)
    frac = (gf - g0).astype(_F32)
    idx0, sd = _sample_ids(cfg, n_bucket, slot_dist, g0)

    acc = jnp.zeros(p.shape[:-1], _F32)
    valid = sd >= 0
    wz1 = frac[..., 2]
    wz0 = 1 - wz1
    for c in range(4):
        dx, dy = (c >> 1) & 1, c & 1
        off = (dx * _EXT + dy) * _EXT
        pv = ext[idx0 + off]
        v0 = _unpack_lo(pv)
        v1 = _unpack_hi(pv)
        ok = (v0 < 1.5) & (v1 < 1.5)
        wxy = (
            jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
            * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
        )
        acc = acc + wxy * (
            wz0 * jnp.where(v0 < 1.5, v0, 0.0)
            + wz1 * jnp.where(v1 < 1.5, v1, 0.0)
        )
        valid &= ok
    return acc, valid


def _secant(ta, va, tb, vb):
    denom = va - vb
    f = jnp.where(
        jnp.abs(denom) > 1e-12, va / jnp.where(denom == 0, 1.0, denom), 0.5
    )
    return ta + jnp.clip(f, 0.0, 1.0) * (tb - ta)


def _march(cfg, slot_dist, ext, n_bucket, origins, dirs, t_init, t_min,
           t_max, max_iter, iter_stats=False):
    """Unified sphere march.  Returns (found, ta, tb, va, vb): a bracketing
    pair of consecutive nearest-voxel samples around the first + -> -
    crossing.  2 gathers per iteration."""
    n = origins.shape[0]
    vs = cfg.voxel_size
    bs = cfg.block_size
    trunc = cfg.trunc
    inv_dn = 1.0 / jnp.maximum(jnp.linalg.norm(dirs, axis=-1), 1e-9)

    def body(c):
        t, ta, tb, va, vb, prev_t, prev_v, prev_ok, found, active, it = c
        p = origins + dirs * t[:, None]
        g = jnp.round(p / vs).astype(jnp.int32)
        idx, sd = _sample_ids(cfg, n_bucket, slot_dist, g)
        v = _unpack_lo(ext[idx])
        valid = (sd >= 0) & (v < 1.5)

        crossed = active & valid & prev_ok & (prev_v > 0) & (v <= 0)
        ta = jnp.where(crossed, prev_t, ta)
        tb = jnp.where(crossed, t, tb)
        va = jnp.where(crossed, prev_v, va)
        vb = jnp.where(crossed, v, vb)
        found = found | crossed
        active = active & ~crossed

        # In the band: tsdf-proportional; unobserved voxel inside an
        # allocated block: one voxel; empty space: Chebyshev block skip.
        step_band = jnp.maximum(v * trunc * 0.7, vs * 0.75)
        step_empty = jnp.maximum((-sd).astype(_F32) - 1.0, 0.5) * bs
        step = jnp.where(sd >= 0, jnp.where(valid, step_band, vs), step_empty)

        prev_t = jnp.where(active, t, prev_t)
        prev_v = jnp.where(active, v, prev_v)
        prev_ok = jnp.where(active, valid, prev_ok)
        t = t + jnp.where(active, step * inv_dn, 0.0)
        active = active & (t <= t_max)
        return (t, ta, tb, va, vb, prev_t, prev_v, prev_ok, found, active,
                it + 1)

    def cond(c):
        return jnp.any(c[-2]) & (c[-1] < max_iter)

    z = jnp.zeros((n,), _F32)
    t0 = jnp.maximum(t_init, t_min).astype(_F32)
    init = (
        t0, z, z, z, z, t0, z,
        jnp.zeros((n,), bool), jnp.zeros((n,), bool),
        t0 <= t_max, jnp.asarray(0, jnp.int32),
    )
    if iter_stats:
        # Instrumentation: fixed-trip scan recording live-lane counts per
        # iteration (tools/march_stats.py); the production path keeps the
        # early-exiting while_loop.
        def step(c, _):
            c = body(c)
            return c, jnp.sum(c[-2])

        out, live = jax.lax.scan(step, init, None, length=max_iter)
        return out[8], out[1], out[2], out[3], out[4], live
    out = jax.lax.while_loop(cond, body, init)
    t, ta, tb, va, vb = out[:5]
    found = out[8]
    return found, ta, tb, va, vb


_REFINE_SAMPLES = 4  # dense re-bracket samples per found ray
_REFINE_ITERS = 2  # false-position iterations on the re-bracket


def _refine(cfg, slot_dist, ext, n_bucket, origins, dirs, found, ta, tb,
            va, vb, n_samples=_REFINE_SAMPLES, n_iters=_REFINE_ITERS):
    """Bracket -> accurate t_hit on the *trilinear* field (the same field
    marching cubes extracts).  ~(9*(n_samples+n_iters)) gathers per found
    ray.

    The march brackets are nearest-voxel samples with up to half a voxel of
    staircase noise, so the trilinear zero crossing can sit slightly OUTSIDE
    [ta, tb].  Expand the bracket by one voxel both ways, sample the
    trilinear field densely, take the first + -> - transition, then
    false-position iterations + closing secant: ~0.01 mm residual on smooth
    surfaces (the field is near-linear inside a cell)."""
    inv_dn = 1.0 / jnp.maximum(jnp.linalg.norm(dirs, axis=-1), 1e-9)
    vt = cfg.voxel_size * inv_dn  # one voxel, in t units
    lo = jnp.maximum(ta - vt, 0.0)
    hi = tb + vt

    M = n_samples
    w = jnp.linspace(0.0, 1.0, M, dtype=_F32)
    ts = lo[:, None] + (hi - lo)[:, None] * w[None, :]  # (n, M)
    p = origins[:, None, :] + dirs[:, None, :] * ts[..., None]
    v, ok = _trilinear(cfg, n_bucket, slot_dist, ext, p)  # (n, M)

    pair_ok = ok[:, :-1] & ok[:, 1:]
    cross = pair_ok & (v[:, :-1] > 0) & (v[:, 1:] <= 0)
    has = jnp.any(cross, axis=1)
    first = jnp.argmax(cross, axis=1)
    rows = jnp.arange(ts.shape[0])
    ta2 = jnp.where(has, ts[rows, first], ta)
    tb2 = jnp.where(has, ts[rows, first + 1], tb)
    va2 = jnp.where(has, v[rows, first], va)
    vb2 = jnp.where(has, v[rows, first + 1], vb)

    for _ in range(n_iters):
        tm = _secant(ta2, va2, tb2, vb2)
        pm = origins + dirs * tm[:, None]
        vm, ok_m = _trilinear(cfg, n_bucket, slot_dist, ext, pm)
        pos = ok_m & (vm > 0)
        neg = ok_m & (vm <= 0)
        ta2 = jnp.where(pos, tm, ta2)
        va2 = jnp.where(pos, vm, va2)
        tb2 = jnp.where(neg, tm, tb2)
        vb2 = jnp.where(neg, vm, vb2)
    t_hit = _secant(ta2, va2, tb2, vb2)
    return jnp.where(found, t_hit, jnp.inf)


def _min_pool3(x):
    """3x3 min filter with edge replication over the last two axes of a
    (F, h, w) stack."""
    for axis in (1, 2):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
             jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
             jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                  axis=axis)],
            axis=axis,
        )
        x = jnp.minimum(x, jnp.minimum(lo, hi))
    return x


def _max_pool3(x):
    return -_min_pool3(-x)


def _shift_clamped(x, d, axis):
    """Edge-replicated shift by d (+1 = toward higher indices)."""
    n_ax = x.shape[axis]
    if d > 0:
        body = jax.lax.slice_in_dim(x, 0, n_ax - d, axis=axis)
        pad = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        parts = [pad] * d + [body]
    else:
        body = jax.lax.slice_in_dim(x, -d, n_ax, axis=axis)
        pad = jax.lax.slice_in_dim(x, n_ax - 1, n_ax, axis=axis)
        parts = [body] + [pad] * (-d)
    return jnp.concatenate(parts, axis=axis)


def _upsample_bilinear(x, f, axis):
    """Half-pixel-center bilinear upsample by integer factor f along axis,
    matching jax.image.resize(method='linear') for integer factors with
    edge clamping — built from shifts + phase interleave instead of
    resize's gather formulation, whose s32[..., 2] index tensors pad their
    trailing size-2 dim 64x under TPU (8,128) tiling (20 GB at F=64,
    1280x960) and cost real HBM traffic at any batch size."""
    if f == 1:
        return x
    left = _shift_clamped(x, 1, axis)
    right = _shift_clamped(x, -1, axis)
    # Interleave the f phase images via interior padding + add (a
    # stack(axis+1)+reshape materializes an (..., f)-minor copy that the
    # same tiling pads 64x when `axis` is the minormost dim).
    zero = jnp.zeros((), x.dtype)
    cfg0 = [(0, 0, 0)] * x.ndim
    y = None
    for p in range(f):
        c = (p + 0.5) / f - 0.5  # offset of output phase p from input i
        if c < 0:
            ph = (1.0 + c) * x + (-c) * left
        else:
            ph = (1.0 - c) * x + c * right
        cfg = list(cfg0)
        cfg[axis] = (p, f - 1 - p, f - 1)
        spread = jax.lax.pad(ph, zero, cfg)
        y = spread if y is None else y + spread
    return y


def _ray_dirs(K, Rcw, s, h_l, w_l):
    """(F, h_l, w_l, 3) world ray directions for pyramid scale s (z-depth
    parameterization: camera-frame z component is 1)."""
    F = K.shape[0]
    u = (jnp.arange(w_l, dtype=_F32) + 0.5) * s - 0.5
    v = (jnp.arange(h_l, dtype=_F32) + 0.5) * s - 0.5
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    one = jnp.ones((F, h_l, w_l), _F32)
    d_cam = jnp.stack(
        [(u[None, None, :] - cx) / fx * one,
         (v[None, :, None] - cy) / fy * one,
         one],
        axis=-1,
    ).astype(_F32)
    return jnp.einsum("fij,fhwj->fhwi", Rcw, d_cam)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_bucket", "width", "height", "edge_cap", "fine_march_iters",
        "edge_mult_full", "edge_mult_mid", "refine_samples_fine",
        "refine_iters_fine", "base_march_iters", "level_stats",
        "pyramid_scales", "refine_samples_base", "refine_iters_base",
    ),
)
def _render_frames(
    cfg: TSDFConfig,
    slot_dist,
    ext,
    aabb,  # (2, 3) f32 world AABB of active blocks
    n_bucket: int,
    K,  # (F, 3, 3) f32
    Rcw,  # (F, 3, 3) f32 camera-to-world rotations
    origin,  # (F, 3) f32 camera centers
    t_min,
    t_max,
    width: int,
    height: int,
    edge_cap: int,
    edge_eps,
    fine_march_iters: int = 8,
    edge_mult_full: int = 6,
    edge_mult_mid: int = 34,
    refine_samples_fine: int = 2,
    refine_iters_fine: int = 1,
    base_march_iters: int = 24,
    level_stats: bool = False,
    pyramid_scales: tuple | None = None,
    refine_samples_base: int = 3,
    refine_iters_base: int = 1,
):
    """Full coherent pyramid for a batch of frames in ONE launch.

    Returns ((F, height, width) z-depth with inf misses, edge overflow count)
    plus, when level_stats=True, a (n_fine_levels, 3) int32 array of
    (n_edge, cap, n_found) per fine level."""
    F = K.shape[0]
    vs = cfg.voxel_size
    pad = 3.0 * vs

    # edge_eps thresholds |second difference of 1/z|, which scales with the
    # SQUARE of the angular pixel pitch: the same surface curvature responds
    # 4x stronger at half the resolution.  The default (1e-3) is calibrated
    # at a 1280-wide render; normalize so edge densities — and therefore the
    # perimeter-multiple cap model below — are resolution-invariant
    # (unnormalized, a 640x480 render flags ~2x the per-perimeter edges of a
    # 1280x960 one and overflows caps that are clean at full res).
    edge_eps = edge_eps * jnp.float32((1280.0 / width) ** 2)

    def ray_aabb_span(origins, dirs):
        """Slab test against the active-block AABB in t units (dirs are
        unnormalized K^-1 (u,v,1), so t == z-depth like everything else).
        Returns (t_enter, t_exit); t_exit < t_enter means the ray misses
        the volume entirely."""
        safe = jnp.where(
            jnp.abs(dirs) < 1e-12,
            jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
        inv = 1.0 / safe
        t1 = (aabb[0][None] - origins) * inv
        t2 = (aabb[1][None] - origins) * inv
        t_en = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_ex = jnp.min(jnp.maximum(t1, t2), axis=-1)
        return t_en, t_ex

    if pyramid_scales is not None:
        scales = [s for s in pyramid_scales
                  if width % s == 0 and height % s == 0]
        # The coarse-to-fine upsample needs each level to be an integer
        # multiple of the next (f = s_prev // s exact and >= 1), so drop any
        # scale that does not strictly divide its predecessor — e.g. the 4
        # in (6, 4, 1) or an ascending 8 in (4, 8) would otherwise produce
        # f in {0, 1} and crash the reshape at trace time.
        kept = []
        for s in sorted(set(scales), reverse=True):
            if not kept or kept[-1] % s == 0:
                kept.append(s)
        scales = kept
        if not scales or scales[-1] != 1:
            scales = list(scales) + [1]
    else:
        scales = []
        s = 8
        while s > 1 and (width % s or height % s):
            s //= 2
        while s >= 1:
            scales.append(s)
            s //= 2

    def level_shape(s):
        return height // s, width // s

    def march_refine_full(s, t_init_flat, max_iter):
        h_l, w_l = level_shape(s)
        dirs = _ray_dirs(K, Rcw, s, h_l, w_l).reshape(-1, 3)
        origins = jnp.broadcast_to(
            origin[:, None, None, :], (F, h_l, w_l, 3)
        ).reshape(-1, 3)
        # Clip every ray to its AABB span: misses retire after one step
        # (far < start) and hits start marching at the volume boundary.
        t_en, t_ex = ray_aabb_span(origins, dirs)
        t0 = jnp.maximum(t_init_flat, jnp.maximum(t_en - vs, t_min))
        t_hi = jnp.minimum(t_ex + vs, t_max)
        found, ta, tb, va, vb = _march(
            cfg, slot_dist, ext, n_bucket, origins, dirs, t0,
            t_min, t_hi, max_iter,
        )
        t_hit = _refine(
            cfg, slot_dist, ext, n_bucket, origins, dirs, found, ta, tb,
            va, vb, n_samples=refine_samples_base, n_iters=refine_iters_base,
        )
        return t_hit.reshape(F, h_l, w_l)

    # ---- base level: full march + refine --------------------------------------
    # Only the 1/8 level marches in full; every finer level upsamples
    # densely and re-marches edges only.  At 1280x960 an 8-pixel feature at
    # room distance is ~1 voxel — geometry the TSDF cannot represent
    # anyway — so the base sampling does not drop recoverable surface.
    s0 = scales[0]
    h0, w0 = level_shape(s0)
    z = march_refine_full(
        s0, jnp.full((F * h0 * w0,), t_min, _F32), base_march_iters
    )
    fine_scales = scales[1:]

    # ---- fine levels: dense 1/z upsampling + compacted edge re-march ----------
    overflow = jnp.asarray(0, jnp.int32)
    stats = []
    s_prev = s0
    for s in fine_scales:
        h_l, w_l = level_shape(s)
        f = s_prev // s  # parent -> this level upsample factor
        s_prev = s
        # Cap structure (measured on the analytic room, tools/march_stats.py
        # + level_stats): the march/refine cost is the STATIC cap width —
        # dead lanes still gather every iteration — so caps should hug the
        # real edge counts.  Undersized MID caps are the expensive failure:
        # unprocessed overflow keeps interpolated depth, re-flags ~2x wider
        # at the next level, and cascades into a full-res edge set ~10x the
        # geometric one.  Overflowed full-res pixels degrade gracefully to
        # dense-upsampled depth.
        #
        # Edges are CURVES (silhouettes, creases): their pixel count scales
        # with curve length x a constant band width (3x3 dilation), i.e.
        # ~ sqrt(h*w) per frame — NOT with the pixel area.  Area-fraction
        # caps therefore starve small frames (at 640x480 the first fine
        # level's real edge set is ~20% of its 160x120 pixels; at 1280x960
        # the same scene needs ~2% of 320x240) and over-provision large
        # ones.  Caps are per-frame perimeter multiples, measured on the
        # analytic room at both resolutions (tools/march_stats.py):
        # first fine level loosest (its pixels are the cheapest and an
        # overflow cascades through every later level), full res tightest
        # (real density ~0.5% of pixels at 1280x960, no band dilation).
        per = int(math.isqrt(h_l * w_l))
        if s == 1:
            mult = edge_mult_full
        elif s == fine_scales[0]:
            mult = edge_mult_mid + edge_mult_mid // 4
        else:
            mult = edge_mult_mid
        cap_l = min(max(F * mult * per, 4096), F * h_l * w_l, edge_cap)

        # Planarity/validity on the parent: a pixel is an "edge" if any 3x3
        # neighbor is a miss or the inverse depth is locally non-planar
        # (|second difference of 1/z| above edge_eps).  Bilinear on 1/z is
        # exact for planar surfaces, so everything else upsamples densely.
        invz = jnp.where(jnp.isfinite(z), 1.0 / z, 0.0)
        finite = jnp.isfinite(z)

        # Edge-replicated shift (jnp.roll wraps, which made the border
        # rows/columns of every level fire the planarity test against the
        # opposite side of the frame — ~20% of all flagged edges on the
        # analytic room).
        shift = _shift_clamped

        d2u = jnp.abs(
            invz - 0.5 * (shift(invz, 1, 2) + shift(invz, -1, 2))
        )
        d2v = jnp.abs(
            invz - 0.5 * (shift(invz, 1, 1) + shift(invz, -1, 1))
        )
        edge_p = (
            (~finite)
            | (_max_pool3((~finite).astype(_F32)) > 0)
            | (jnp.maximum(d2u, d2v) > edge_eps)
        )
        if s > 1:
            # Dilate once so the next level's detection sees marched
            # values around the band.  At full res there is no next level
            # and the band is already >= 2 px wide from the parent's
            # detection: skipping the dilation halves the gather-bound
            # full-res march/refine width at unchanged accuracy
            # (A/B: 0.16 mm median both ways on the analytic room).
            edge_p = _max_pool3(edge_p.astype(_F32)) > 0

        # Dense upsample of 1/z (half-pixel-center aligned 2x bilinear).
        invz_up = _upsample_bilinear(
            _upsample_bilinear(invz, f, axis=1), f, axis=2)
        z_up = jnp.where(invz_up > 1e-9, 1.0 / invz_up, jnp.inf)

        # ---- compact edge ids at PARENT resolution ----------------------------
        # Edge pixels arrive in f x f blocks (the mask lives on the parent
        # grid), so compact PARENT ids and expand each into its f^2 children
        # arithmetically.  The full-res dense edge mask / start-depth /
        # far-bound fields and the (F*h*w)-long compaction cumsum then never
        # exist: besides the HBM traffic, their up()-broadcast intermediates
        # carried a trailing dim of f whose (8,128) tiling padded 64x —
        # 20 GB at F=64, 1280x960.  The re-marched pixel SET is identical
        # (children are flagged iff their parent is).
        h_p, w_p = z.shape[1], z.shape[2]
        n_pp = F * h_p * w_p
        ff = f * f
        cap_p = max(cap_l // ff, 1)
        flat_edge = edge_p.reshape(-1)
        rank = jnp.cumsum(flat_edge.astype(jnp.int32))
        n_edge = rank[-1] * ff  # in this level's pixels
        slot = jnp.where(flat_edge, rank - 1, cap_p)
        slot = jnp.minimum(slot, cap_p)
        ids_p = (
            jnp.full((cap_p + 1,), n_pp, jnp.int32)
            .at[slot]
            .set(jnp.arange(n_pp, dtype=jnp.int32), mode="drop")
        )[:cap_p]
        overflow = overflow + jnp.maximum(n_edge - cap_p * ff, 0)
        ids_safe_p = jnp.minimum(ids_p, n_pp - 1)
        live_p = ids_p < n_pp

        # Conservative per-parent start depth, and a FAR bound from the
        # parent 3x3 max where it is fully finite (inf propagates through
        # the max-pool otherwise): the surface for an edge pixel lies
        # inside its parent neighborhood's depth range +- pad, so the march
        # retires lanes early instead of walking every ray to the global
        # t_max (the while_loop runs until ALL lanes retire — the far
        # bound is what cuts the iteration count).  Gathered per compacted
        # parent id; constant across the f x f children.
        zmin_p = _min_pool3(z).reshape(-1)[ids_safe_p]
        t0_p = jnp.where(
            jnp.isfinite(zmin_p), jnp.maximum(zmin_p - pad, t_min), t_min)
        zmax_p = _max_pool3(z).reshape(-1)[ids_safe_p]
        t_hi_p = jnp.where(jnp.isfinite(zmax_p), zmax_p + pad, t_max)

        # Expand to f^2 child lanes, phase-major so the wide axis stays
        # minormost: lane l = phase * cap_p + j.  Rays are rebuilt
        # arithmetically (no gathers except the per-parent bounds and the
        # frame index lookups).
        n_lanes = cap_p * ff
        lane = jnp.arange(n_lanes, dtype=jnp.int32)
        phase = lane // cap_p
        j = lane % cap_p
        idp = ids_safe_p[j]
        live = live_p[j]
        fidx = idp // (h_p * w_p)
        pp = idp % (h_p * w_p)
        py = (pp // w_p) * f + phase // f  # this level's pixel row
        px = (pp % w_p) * f + phase % f
        pyf = py.astype(_F32) * s + (0.5 * s - 0.5)  # full-res coords
        pxf = px.astype(_F32) * s + (0.5 * s - 0.5)
        fx = K[fidx, 0, 0]
        fy = K[fidx, 1, 1]
        cx = K[fidx, 0, 2]
        cy = K[fidx, 1, 2]
        d_cam = jnp.stack(
            [(pxf - cx) / fx, (pyf - cy) / fy, jnp.ones((n_lanes,), _F32)],
            axis=-1,
        )
        dirs_e = jnp.einsum("nij,nj->ni", Rcw[fidx], d_cam)
        origins_e = origin[fidx]
        # Dead lanes (beyond the live edge count) get far bound < start so
        # the while_loop retires them on iteration one instead of marching
        # duplicate rays for the full budget.  Live lanes additionally
        # clip to the active-block AABB span: edge pixels bordering a
        # background miss otherwise march to the global t_max.
        t_en_e, t_ex_e = ray_aabb_span(origins_e, dirs_e)
        t0_e = jnp.where(
            live,
            jnp.maximum(t0_p[j], jnp.maximum(t_en_e - vs, t_min)),
            t_min)
        t_hi_e = jnp.where(
            live,
            jnp.minimum(t_hi_p[j], t_ex_e + vs),
            t_min - 1.0)

        # With per-ray [t0, t_hi] windows most lanes retire in a few
        # iterations; the budget only caps stragglers (which keep their
        # interpolated depth).  The while_loop's cost is set by the LAST
        # lane to retire, so the cap is a direct wall-clock lever: the
        # round-4 sweep (tools/rc_lab.py, honest-sync timing) measured 8
        # iters at identical median/p95/coverage to 14 on the production-
        # scale analytic room.
        found, ta, tb, va, vb = _march(
            cfg, slot_dist, ext, n_bucket, origins_e, dirs_e, t0_e,
            t_min, t_hi_e, fine_march_iters,
        )
        # Fine levels re-bracket over a window the march already localized
        # to ~a voxel: 2 dense endpoint samples + 1 false-position
        # iteration + closing secant hold the same residual as wider
        # sample counts (A/B'd on the analytic room at production scale).
        t_hit_e = _refine(
            cfg, slot_dist, ext, n_bucket, origins_e, dirs_e, found, ta, tb,
            va, vb, n_samples=refine_samples_fine, n_iters=refine_iters_fine,
        )
        n_px = F * h_l * w_l
        ids_full = (fidx * h_l + py) * w_l + px
        z = (
            z_up.reshape(-1)
            .at[jnp.where(live, ids_full, n_px)]
            .set(jnp.where(live, t_hit_e, 0.0), mode="drop")
            .reshape(F, h_l, w_l)
        )
        if level_stats:
            stats.append(jnp.stack([
                n_edge, jnp.asarray(cap_l, jnp.int32),
                jnp.sum(found.astype(jnp.int32))]))

    if level_stats:
        return z, overflow, jnp.stack(stats)
    return z, overflow


class _ScenePrep:
    """Cache of prepare_scene outputs keyed on (volume identity, revision).

    The volume is held by weakref so the key cannot alias a new object after
    GC, and TSDFVolume bumps `_state_version` on every state assignment
    (integrate_chunk donates the old arrays, so raw id() keys go stale)."""

    def __init__(self):
        self._vol_ref = None
        self._version = None
        self._value = None

    def get(self, volume: TSDFVolume):
        import weakref

        cached = self._vol_ref() if self._vol_ref is not None else None
        if cached is not volume or self._version != volume._state_version:
            n_bucket = 256
            while n_bucket < volume.n_active:
                n_bucket *= 2
            n_bucket = min(n_bucket, volume.cfg.block_count)
            slot_dist, ext, aabb = prepare_scene(
                volume.cfg, volume.state, n_bucket)
            self._value = (slot_dist, ext, aabb, n_bucket)
            self._vol_ref = weakref.ref(volume)
            self._version = volume._state_version
        return self._value


_prep_cache = _ScenePrep()


def _render_frames_device(
    volume: TSDFVolume,
    intrinsics: np.ndarray,  # (F, 3, 3) with cx already mirror-flipped
    extrinsics_wc: np.ndarray,  # (F, 4, 4)
    width: int,
    height: int,
    t_min: float = 0.05,
    t_max: float | None = None,
    edge_eps: float = 1e-3,
    fine_march_iters: int = 8,
    **knobs,
):
    """Dispatch one fused render launch; returns DEVICE arrays
    ((F, H, W) z-depth, overflow scalar) without blocking.  Callers that
    stream many batches overlap the next launch with the previous batch's
    host readback (the tunneled readback is comparable to the compute).
    Extra static tuning knobs (edge_mult_full, refine_samples_fine, ...)
    forward to _render_frames."""
    cfg = volume.cfg
    t_max = t_max if t_max is not None else cfg.depth_max * 1.5
    slot_dist, ext, aabb, n_bucket = _prep_cache.get(volume)

    T_cw = np.linalg.inv(np.asarray(extrinsics_wc, np.float64)).astype(
        np.float32
    )
    F = intrinsics.shape[0]
    # Edge capacity: silhouettes + curvature are perimeter-ish. 1/16 of the
    # pixels bounds the march width (the gather budget scales with this
    # static cap, not the live count); overflowed pixels keep the dense
    # 1/z-upsampled value, they are not lost.
    edge_cap = max(F * width * height // 16, 4096)
    return _render_frames(
        cfg, slot_dist, ext, aabb, n_bucket,
        jnp.asarray(intrinsics, _F32),
        jnp.asarray(T_cw[:, :3, :3]),
        jnp.asarray(np.ascontiguousarray(T_cw[:, :3, 3])),
        jnp.float32(t_min), jnp.float32(t_max),
        width, height, edge_cap, jnp.float32(edge_eps),
        fine_march_iters=fine_march_iters, **knobs,
    )


def _warn_overflow(overflow) -> None:
    n_over = int(np.asarray(overflow))
    if n_over > 0:
        print(
            f"[Warning] raycast edge budget exceeded by {n_over} px; "
            "they keep interpolated depth"
        )


def raycast_depth_batch(
    volume: TSDFVolume,
    intrinsics: np.ndarray,  # (F, 3, 3) with cx already mirror-flipped
    extrinsics_wc: np.ndarray,  # (F, 4, 4)
    width: int,
    height: int,
    t_min: float = 0.05,
    t_max: float | None = None,
    edge_eps: float = 1e-3,
    **knobs,
) -> np.ndarray:
    """Render (F, H, W) z-depth maps from the TSDF volume in one launch.
    inf = miss.  Static tuning knobs forward to _render_frames."""
    z, overflow = _render_frames_device(
        volume, intrinsics, extrinsics_wc, width, height,
        t_min=t_min, t_max=t_max, edge_eps=edge_eps, **knobs,
    )
    out = np.asarray(z)
    _warn_overflow(overflow)
    return out


def raycast_depth(
    volume: TSDFVolume,
    intrinsic: np.ndarray,  # (3,3) with cx already mirror-flipped
    extrinsic_wc: np.ndarray,  # (4,4)
    width: int,
    height: int,
    t_min: float = 0.05,
    t_max: float | None = None,
) -> np.ndarray:
    """Render one z-depth map from the TSDF volume. inf = miss."""
    return raycast_depth_batch(
        volume,
        np.asarray(intrinsic, np.float32)[None],
        np.asarray(extrinsic_wc, np.float64)[None],
        width,
        height,
        t_min=t_min,
        t_max=t_max,
    )[0]


@partial(jax.jit, static_argnames=())
def _quantize_u16(z, scale):
    """Depth -> uint16 fixed point on device: round(z*scale), miss (inf
    or beyond range) -> 0."""
    q = jnp.round(z * scale)
    ok = jnp.isfinite(z) & (q >= 1.0) & (q <= 65535.0)
    return jnp.where(ok, q, 0.0).astype(jnp.uint16)


def _dequantize_u16_host(q: np.ndarray, scale: float) -> np.ndarray:
    out = q.astype(np.float32) / np.float32(scale)
    out[q == 0] = np.inf
    return out


def raycast_in_color_view(volume: TSDFVolume, dataset, frames_per_batch: int = 8,
                          transfer_u16: bool = False):
    """Generator over per-frame z-depth maps for a camera dataset, matching
    the reference surface (o3d_utils.py:324-341).  Dataset transforms must be
    in the OPEN3D camera frame.  Frames render `frames_per_batch` per device
    launch (one fused program), with the NEXT batch's launch dispatched
    before the previous batch is copied to host — JAX dispatch is async, so
    the device computes batch i+1 while the host drains batch i (readback
    and compute are comparable under a tunneled chip; overlapping them
    roughly halves steady-state cost).  Frames are yielded one by one.

    transfer_u16: quantize depth to uint16 fixed point ON DEVICE and
    dequantize to float32 after readback — halves the bytes on a
    bandwidth-bound transport (this image's relay streams ~14-38 MB/s; a
    1280x960 f32 map is 4.9 MB).  Quantization step is t_max/65534
    (0.061 mm at 4 m), ~2.7x below the renderer's 0.165 mm median error;
    misses (inf) encode as 0.  Yielded maps are float32 either way."""
    K = dataset.get_render_intrinsic_matrices()
    T_wc = dataset.transforms.extrinsics_wc
    n = len(dataset)
    widths = np.asarray(dataset.widths)
    heights = np.asarray(dataset.heights)

    def spans():
        i = 0
        while i < n:
            j = i + 1
            while (
                j < n
                and j - i < frames_per_batch
                and widths[j] == widths[i]
                and heights[j] == heights[i]
            ):
                j += 1
            yield i, j
            i = j

    t_max_q = float(volume.cfg.depth_max) * 1.5
    q_scale = 65534.0 / t_max_q

    def dispatch(i, j):
        z, overflow = _render_frames_device(
            volume,
            np.asarray(K[i:j], np.float32),
            np.asarray(T_wc[i:j], np.float64),
            int(widths[i]),
            int(heights[i]),
        )
        if transfer_u16:
            z = _quantize_u16(z, q_scale)
        # One whole-batch copy: measured against per-frame slice drains and
        # per-frame split program outputs on the tunneled transport, the
        # single copy is as fast or faster once the per-program-switch
        # launch penalties are counted (frame slices interleave 16 extra
        # programs between renders; split outputs are ~8x worse).
        z.copy_to_host_async()
        return z, overflow

    def drain(batch_z, overflow):
        _warn_overflow(overflow)
        batch = np.asarray(batch_z)
        if transfer_u16:
            batch = _dequantize_u16_host(batch, q_scale)
        for k in range(batch.shape[0]):
            yield batch[k]

    pending = None  # (z device array, overflow device array)
    for span in spans():
        prev, pending = pending, dispatch(*span)
        if prev is not None:
            yield from drain(*prev)
    if pending is not None:
        yield from drain(*pending)

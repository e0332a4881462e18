"""Raycast accuracy guards on adversarial content (round-5 VERDICT item 6).

The shipped march budgets (base_march_iters=24, fine_march_iters=8, edge
refine caps — ops/raycast.py defaults) were tuned on the orbit-a-box bench
scene; these tests pin accuracy on content specifically chosen to break
budget cuts:

  * thin slab  — a 2-voxel-thick free-standing plate in front of a wall:
    a straggler ray "retired early" near the plate's silhouette is a real
    miss/ghost here, not a background hit either way;
  * depth_max  — a wall just inside depth_max: the coarse march must cover
    the full ray length within its iteration budget;
  * grazing    — a plane at ~78 deg incidence: sphere-tracing overshoot and
    interpolation error are maximal at shallow angles.

Ground truth is analytic (plane/ray intersection), not a reference render,
so a regression in either the marcher or the integrate path fails these.
Thresholds are set ~1.3x above the values measured at the shipped budgets
on the CPU backend (recorded per-test), so a >=20-30% accuracy or coverage
degradation fails.  Reference behavior being guarded:
/root/reference/scripts/processing/reconstruction/utils/o3d_utils.py:324-341
(color-aligned raycast rendering).
"""

import numpy as np
import pytest

from mq3d_tpu.ops.raycast import raycast_depth
from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume

W, H = 320, 240
FX = FY = 260.0
K = np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1]], np.float32)

CFG = TSDFConfig(
    voxel_size=0.01, block_resolution=16, block_count=16384, grid_dim=64,
    depth_max=4.0, trunc_voxel_multiplier=10.0,
    chunk_active_capacity=8192, integrate_tile=256,
)


def _rays(w=W, h=H):
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    d = np.stack(
        [(u - K[0, 2]) / FX, (v - K[1, 2]) / FY, np.ones_like(u)], -1)
    return d  # (h, w, 3) camera-frame directions, z component == 1


def _lookat_T_wc(eye, target, up=(0, -1, 0)):
    """World-to-camera for a camera at `eye` looking at `target` (z fwd)."""
    eye = np.asarray(eye, np.float64)
    z = np.asarray(target, np.float64) - eye
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    T_cw = np.eye(4)
    T_cw[:3, 0], T_cw[:3, 1], T_cw[:3, 2], T_cw[:3, 3] = x, y, z, eye
    return np.linalg.inv(T_cw)


def _plane_depth(T_wc, p0, n, bounds=None):
    """Analytic z-depth of the plane (p0, n) clipped to world-xyz `bounds`
    ((3,2) min/max or None), from pose T_wc.  inf where no hit."""
    T_cw = np.linalg.inv(T_wc)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    dirs_w = _rays() @ R.T  # (h, w, 3)
    denom = dirs_w @ np.asarray(n, np.float64)
    num = np.asarray(n, np.float64) @ (np.asarray(p0, np.float64) - t)
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = num / denom
    hit = (denom != 0) & (tt > 0)
    pw = t + tt[..., None] * dirs_w
    if bounds is not None:
        b = np.asarray(bounds, np.float64)
        inside = np.all((pw >= b[:, 0] - 1e-9) & (pw <= b[:, 1] + 1e-9), -1)
        hit &= inside
    return np.where(hit, tt, np.inf)  # z-depth == ray t since dir_z==1 (cam)


def _scene_depth(T_wc, planes):
    """Min over per-plane analytic depths."""
    zs = [_plane_depth(T_wc, *p) for p in planes]
    return np.min(np.stack(zs), axis=0)


def _integrate(planes, poses):
    depth = np.stack(
        [_scene_depth(T, planes) for T in poses]).astype(np.float32)
    depth[~np.isfinite(depth)] = 0.0
    vol = TSDFVolume(CFG)
    Ks = np.tile(K[None], (len(poses), 1, 1))
    Ts = np.stack(poses).astype(np.float32)
    vol.integrate(depth, Ks, Ts, np.ones(len(poses), bool))
    return vol


class TestThinSlab:
    """0.02 m (2-voxel) plate at z=1.5 in front of a wall at z=2.5."""

    def _build(self):
        slab_front = ([0, 0, 1.5], [0, 0, -1.0],
                      [[-0.15, 0.15], [-0.20, 0.20], [1.49, 1.51]])
        wall = ([0, 0, 2.5], [0, 0, -1.0], None)
        planes = [slab_front, wall]
        poses = [
            _lookat_T_wc((x, y, 0.0), (0, 0, 1.5))
            for x in (-0.15, 0.0, 0.15) for y in (-0.1, 0.1)
        ]
        return planes, _integrate(planes, poses)

    def test_front_view(self):
        from scipy.ndimage import binary_erosion

        planes, vol = self._build()
        T = _lookat_T_wc((0.02, 0.01, 0.0), (0, 0, 1.5))
        gt = _scene_depth(T, planes)
        z = raycast_depth(vol, K, T, W, H)
        on_slab = gt < 2.0
        behind = (gt > 2.0) & np.isfinite(gt)
        # Coverage on both the plate and the background seen past its edge
        # (measured 0.992 / 0.989 at shipped budgets).
        assert (np.isfinite(z) & on_slab).sum() / on_slab.sum() > 0.97
        assert (np.isfinite(z) & behind).sum() / behind.sum() > 0.97
        # No ghost plate: rays past the silhouette must reach the wall,
        # not retire on the plate (measured ghost rate 0.0009).
        ghost = behind & np.isfinite(z) & (z < 2.0)
        assert ghost.sum() / behind.sum() < 0.005
        # Interior (3 px eroded from the silhouette): measured 0.045 mm
        # median / 0.11 mm p95.  The un-eroded band mixes slab and wall
        # TSDF at the silhouette — its median is still sub-voxel
        # (measured 0.95 mm) but its p95 is a silhouette artifact shared
        # with any trilinear TSDF renderer, so it is pinned by median only.
        interior = binary_erosion(on_slab, iterations=3)
        mi = interior & np.isfinite(z)
        ei = np.abs(z[mi] - gt[mi])
        assert np.median(ei) < 1.5e-4
        assert np.quantile(ei, 0.95) < 4e-4
        band = on_slab & ~interior & np.isfinite(z)
        assert np.median(np.abs(z[band] - gt[band])) < 0.003


class TestDepthMaxWall:
    """Wall at z=3.9 with depth_max=4.0: the march must cover ~3.9 m of
    empty space inside the shipped iteration budgets."""

    def test_far_wall(self):
        wall = ([0, 0, 3.9], [0, 0, -1.0], None)
        poses = [
            _lookat_T_wc((x, y, 0.0), (0, 0, 3.9))
            for x in (-0.2, 0.0, 0.2) for y in (-0.15, 0.15)
        ]
        vol = _integrate([wall], poses)
        T = _lookat_T_wc((0.03, -0.02, 0.0), (0, 0, 3.9))
        gt = _plane_depth(T, *wall)
        z = raycast_depth(vol, K, T, W, H)
        # Central region (away from the integrated frustum boundary).
        c = np.zeros((H, W), bool)
        c[H // 6: -H // 6, W // 6: -W // 6] = True
        m = c & np.isfinite(gt)
        assert (np.isfinite(z) & m).sum() / m.sum() > 0.97
        err = np.abs(z[m & np.isfinite(z)] - gt[m & np.isfinite(z)])
        # Measured at shipped budgets: 0.046 mm median / 0.13 mm p95,
        # coverage 1.0 — the march reaches 3.9 m inside its budget.
        assert np.median(err) < 2e-4
        assert np.quantile(err, 0.95) < 5e-4


class TestGrazingIncidence:
    """Plane tilted ~78 deg from the view axis: worst case for
    sphere-trace overshoot and trilinear TSDF interpolation."""

    def test_tilted_plane(self):
        n = np.array([np.sin(np.deg2rad(78.0)), 0, -np.cos(np.deg2rad(78.0))])
        plane = ([0, 0, 2.0], n, [[-2.0, 2.0], [-2.0, 2.0], [0.6, 3.4]])
        poses = [
            _lookat_T_wc((x, y, 0.0), (0, 0, 2.0))
            for x in (-0.1, 0.0, 0.1) for y in (-0.1, 0.1)
        ]
        vol = _integrate([plane], poses)
        T = _lookat_T_wc((0.02, 0.03, 0.0), (0, 0, 2.0))
        gt = _plane_depth(T, *plane)
        z = raycast_depth(vol, K, T, W, H)
        c = np.zeros((H, W), bool)
        c[H // 6: -H // 6, W // 6: -W // 6] = True
        m = c & np.isfinite(gt) & (gt < 3.4)
        # Measured at shipped budgets: coverage 0.889, 0.43 mm median,
        # 83 mm p95 — the tail is the far clipped end of the plane where
        # incidence approaches 90 deg and along-ray sample spacing is
        # voxel/cos(incidence); pinned at 1.4x measured so budget cuts
        # that widen the tail fail.
        assert (np.isfinite(z) & m).sum() / m.sum() > 0.85
        err = np.abs(z[m & np.isfinite(z)] - gt[m & np.isfinite(z)])
        assert np.median(err) < 1.5e-3
        assert np.quantile(err, 0.95) < 0.12


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestU16Stream:
    """uint16 fixed-point readback (ops/raycast.py raycast_in_color_view
    transfer_u16): halves bytes on the bandwidth-bound tunnel; maps must
    dequantize to f32 within the 0.061 mm quantization step and preserve
    the miss mask exactly."""

    def test_generator_u16_matches_f32(self):
        from mq3d_tpu.geometry import quaternion as quat
        from mq3d_tpu.geometry.coordinates import CoordinateSystem
        from mq3d_tpu.models.datasets import CameraDataset
        from mq3d_tpu.models.transforms import Transforms
        from mq3d_tpu.ops.raycast import raycast_in_color_view

        wall = ([0, 0, 3.0], [0, 0, -1.0], None)
        poses = [
            _lookat_T_wc((x, y, 0.0), (0, 0, 3.0))
            for x in (-0.2, 0.0, 0.2) for y in (-0.15, 0.15)
        ]
        vol = _integrate([wall], poses)

        views = [
            _lookat_T_wc((x, 0.01, 0.0), (0, 0, 3.0))
            for x in (-0.05, 0.0, 0.05)
        ]
        T_cw = np.linalg.inv(np.stack(views))
        n = len(views)
        ones = np.ones(n)
        ds = CameraDataset(
            directory_relative_path="t",
            image_file_names=np.array([f"{i}.png" for i in range(n)]),
            timestamps=np.arange(n, dtype=np.int64),
            fx=FX * ones, fy=FY * ones,
            cx=K[0, 2] * ones, cy=K[1, 2] * ones,
            transforms=Transforms(
                coordinate_system=CoordinateSystem.OPEN3D,
                positions=T_cw[:, :3, 3].astype(np.float32),
                rotations=quat.from_matrix(T_cw[:, :3, :3]),
            ),
            widths=np.full(n, W, np.int64),
            heights=np.full(n, H, np.int64),
        )
        f32 = list(raycast_in_color_view(vol, ds, frames_per_batch=2))
        u16 = list(raycast_in_color_view(
            vol, ds, frames_per_batch=2, transfer_u16=True))
        assert len(f32) == len(u16) == n
        step = vol.cfg.depth_max * 1.5 / 65534.0
        for a, b in zip(f32, u16):
            assert b.dtype == np.float32
            np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
            m = np.isfinite(a)
            assert np.abs(a[m] - b[m]).max() <= step * 0.5 + 1e-6

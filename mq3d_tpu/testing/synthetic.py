"""Synthetic QRC capture generator: an analytic box room with known geometry.

Builds a complete fake project directory in the reference's on-disk layout
(raw NDC depth + descriptor CSVs, YUV frames + format/characteristics JSONs,
HMD pose CSV), rendered analytically from inside an axis-aligned box.  Every
pipeline stage can then be validated against closed-form ground truth:
depth linearization, confidence maps, TSDF integration (the walls are
planes), mesh extraction, raycasting, and the full end-to-end run.

The reference has no such fixture (its only test is a mock-based CSV check);
this module is the foundation of our test strategy (SURVEY.md §4).

Conventions: ground-truth camera poses are authored in the OPEN3D frame
(X-right Y-up Z-backward world; X-right Y-down Z-forward camera) and
converted *backward* to the UNITY logging frame, exactly inverting what the
pipeline does on load.  Intrinsics are written as FOV tangents with a mildly
asymmetric horizontal FOV so the cx-mirror-flip path is exercised.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple

import numpy as np

from mq3d_tpu.geometry import quaternion as quat
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem, Transforms

# Box interior (OPEN3D world frame, meters).
DEFAULT_BOX_MIN = np.array([-2.0, -1.2, -2.0])
DEFAULT_BOX_MAX = np.array([2.0, 1.2, 2.0])


@dataclass
class SyntheticSceneConfig:
    n_frames: int = 24
    depth_width: int = 80
    depth_height: int = 64
    color_width: int = 96
    color_height: int = 72
    near: float = 0.1
    far: float = 5.0
    # Asymmetric horizontal FOV exercises the cx != w/2 path.
    fov_left: float = 1.1
    fov_right: float = 0.9
    fov_top: float = 0.8
    fov_bottom: float = 0.8
    sweep: float = 2.0 * np.pi  # yaw range of the orbit (radians)
    box_min: np.ndarray = field(default_factory=lambda: DEFAULT_BOX_MIN.copy())
    box_max: np.ndarray = field(default_factory=lambda: DEFAULT_BOX_MAX.copy())
    t0_ms: int = 1_000_000


def look_rotation_o3d(forward: np.ndarray) -> np.ndarray:
    """Camera-to-world rotation for an OPEN3D camera (X-right, Y-down,
    Z-forward) looking along `forward` in an OPEN3D Y-up world."""
    z = forward / np.linalg.norm(forward)
    down = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(z, down)) > 0.99:
        down = np.array([0.0, 0.0, -1.0])
    x = np.cross(down, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=-1)


def orbit_poses_o3d(cfg: SyntheticSceneConfig) -> Transforms:
    """Ground-truth OPEN3D camera-to-world poses: yaw sweep from near the
    room center with a small positional orbit, covering all four walls."""
    n = cfg.n_frames
    angles = np.linspace(0.0, cfg.sweep, n, endpoint=False)
    radius = 0.3
    center = (cfg.box_min + cfg.box_max) / 2.0
    positions = np.stack(
        [
            center[0] + radius * np.cos(angles),
            center[1] + 0.1 * np.sin(2 * angles),
            center[2] + radius * np.sin(angles),
        ],
        axis=-1,
    )
    rots = []
    for a in angles:
        fwd = np.array([np.cos(a), 0.15 * np.sin(a), np.sin(a)])
        rots.append(np.asarray(quat.from_matrix(look_rotation_o3d(fwd))))
    return Transforms(CoordinateSystem.OPEN3D, positions, np.stack(rots))


def intrinsics_from_cfg(cfg: SyntheticSceneConfig, w: int, h: int):
    fx = w / (cfg.fov_right + cfg.fov_left)
    fy = h / (cfg.fov_top + cfg.fov_bottom)
    cx = w * cfg.fov_right / (cfg.fov_right + cfg.fov_left)
    cy = h * cfg.fov_top / (cfg.fov_top + cfg.fov_bottom)
    return fx, fy, cx, cy


def render_box_depth(
    pose_cw_o3d: np.ndarray,  # (4,4) camera-to-world, OPEN3D frame
    fx: float, fy: float, cx_flipped: float, cy: float,
    w: int, h: int,
    box_min: np.ndarray, box_max: np.ndarray,
) -> np.ndarray:
    """Analytic z-depth of the box interior seen from inside.

    Pixel (u, v) maps to the camera ray ((u - cx')/fx, (v - cy)/fy, 1) —
    cx' is the mirror-flipped principal point the pipeline uses
    (reference o3d_utils.py:14-19).
    """
    u = np.arange(w)[None, :].repeat(h, 0).astype(np.float64)
    v = np.arange(h)[:, None].repeat(w, 1).astype(np.float64)
    d_cam = np.stack([(u - cx_flipped) / fx, (v - cy) / fy, np.ones_like(u)], -1)
    R = pose_cw_o3d[:3, :3]
    c = pose_cw_o3d[:3, 3]
    d_world = d_cam @ R.T  # (h, w, 3)

    t_exit = np.full((h, w), np.inf)
    for axis in range(3):
        for bound in (box_min[axis], box_max[axis]):
            denom = d_world[..., axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (bound - c[axis]) / denom
            # First positive intersection (camera is inside, so every ray
            # exits; take min positive t, verifying the hit is on the face).
            t = np.where(np.isfinite(t) & (t > 1e-9), t, np.inf)
            # Mask inf before the multiply (inf * 0 -> NaN RuntimeWarning);
            # rays with masked t stay inf through the on_face where below.
            t_safe = np.where(np.isfinite(t), t, 0.0)
            p = c + t_safe[..., None] * d_world
            others = [a for a in range(3) if a != axis]
            on_face = np.ones((h, w), dtype=bool)
            for a in others:
                on_face &= (p[..., a] >= box_min[a] - 1e-9) & (
                    p[..., a] <= box_max[a] + 1e-9
                )
            t = np.where(on_face, t, np.inf)
            t_exit = np.minimum(t_exit, t)

    # z-depth equals ray parameter because d_cam.z == 1.
    return t_exit


def wall_color(points_world: np.ndarray, box_min, box_max) -> np.ndarray:
    """Deterministic RGB from hit position: a smooth position gradient."""
    extent = box_max - box_min
    t = np.clip((points_world - box_min) / extent, 0.0, 1.0)
    return t  # rgb in [0,1]


def encode_ndc(z: np.ndarray, near: float, far: float) -> np.ndarray:
    """Invert the reference NDC->linear map z = x / (2 d - 1 + y)."""
    from mq3d_tpu.ops.depth import ndc_to_linear_params

    x, y = ndc_to_linear_params(near, far)
    x, y = float(np.asarray(x)), float(np.asarray(y))
    with np.errstate(divide="ignore"):
        d = ((x / z) - y + 1.0) / 2.0
    return np.where(np.isfinite(d), d, 0.0).astype(np.float32)


X180 = np.array([1.0, 0.0, 0.0, 0.0])  # 180 deg about x, xyzw


def write_synthetic_project(
    project_dir: Path, cfg: SyntheticSceneConfig | None = None
) -> Tuple[Path, "SyntheticSceneConfig", Transforms]:
    """Create the full fake project dir.  Returns (dir, cfg, gt OPEN3D poses)."""
    cfg = cfg or SyntheticSceneConfig()
    project_dir = Path(project_dir)
    project_dir.mkdir(parents=True, exist_ok=True)

    gt_o3d = orbit_poses_o3d(cfg)
    # Inverse of the pipeline's on-load conversion (UNITY -> OPEN3D camera).
    gt_unity = gt_o3d.convert_coordinate_system(CoordinateSystem.UNITY, is_camera=True)

    timestamps = cfg.t0_ms + np.arange(cfg.n_frames) * 33

    dfx, dfy, dcx, dcy = intrinsics_from_cfg(cfg, cfg.depth_width, cfg.depth_height)
    dcx_flipped = cfg.depth_width - dcx
    cfx, cfy, ccx, ccy = intrinsics_from_cfg(cfg, cfg.color_width, cfg.color_height)
    ccx_flipped = cfg.color_width - ccx

    poses_cw = gt_o3d.extrinsics_cw.astype(np.float64)

    # ---- depth: raw NDC files + descriptor CSVs (same for both sides) ------
    for side in Side:
        depth_dir = project_dir / f"{side.value}_depth"
        depth_dir.mkdir(exist_ok=True)
        rows = []
        for i, ts in enumerate(timestamps):
            z = render_box_depth(
                poses_cw[i], dfx, dfy, dcx_flipped, dcy,
                cfg.depth_width, cfg.depth_height, cfg.box_min, cfg.box_max,
            )
            ndc = encode_ndc(z, cfg.near, cfg.far)
            ndc.astype("<f4").tofile(depth_dir / f"{ts}.raw")
            rows.append(
                {
                    "timestamp_ms": ts,
                    "width": cfg.depth_width,
                    "height": cfg.depth_height,
                    "near_z": cfg.near,
                    "far_z": cfg.far,
                    "fov_left_angle_tangent": cfg.fov_left,
                    "fov_right_angle_tangent": cfg.fov_right,
                    "fov_top_angle_tangent": cfg.fov_top,
                    "fov_down_angle_tangent": cfg.fov_bottom,
                    "create_pose_location_x": gt_unity.positions[i, 0],
                    "create_pose_location_y": gt_unity.positions[i, 1],
                    "create_pose_location_z": gt_unity.positions[i, 2],
                    "create_pose_rotation_x": gt_unity.rotations[i, 0],
                    "create_pose_rotation_y": gt_unity.rotations[i, 1],
                    "create_pose_rotation_z": gt_unity.rotations[i, 2],
                    "create_pose_rotation_w": gt_unity.rotations[i, 3],
                }
            )
        import pandas as pd

        pd.DataFrame(rows).to_csv(
            project_dir / f"{side.value}_depth_descriptors.csv", index=False
        )

    # ---- HMD pose track ------------------------------------------------------
    # The pipeline mounts the color camera on interpolated HMD poses via
    # camera = hmd o local, where `local` comes from the characteristics JSON
    # after the Android->HMD fixups.  With identity JSON pose the fixups
    # produce local = x180, so we log hmd = cam_unity o x180^{-1}.
    hmd_rot = np.asarray(quat.multiply(gt_unity.rotations, quat.conjugate(X180)[None]))
    pose_rows = []
    # Dense pose track at 2x frame rate for interpolation coverage.
    for i, ts in enumerate(timestamps):
        pose_rows.append((ts, gt_unity.positions[i], hmd_rot[i]))
        if i + 1 < len(timestamps):
            mid_t = (timestamps[i] + timestamps[i + 1]) // 2
            mid_p = (gt_unity.positions[i] + gt_unity.positions[i + 1]) / 2
            mid_q = np.asarray(quat.slerp(hmd_rot[i], hmd_rot[i + 1], 0.5))
            pose_rows.append((mid_t, mid_p, mid_q))
    with open(project_dir / "hmd_poses.csv", "w") as f:
        f.write("unix_time,pos_x,pos_y,pos_z,rot_x,rot_y,rot_z,rot_w\n")
        for ts, p, q in pose_rows:
            f.write(f"{ts},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}\n")

    # ---- color: YUV frames + format/characteristics JSONs ---------------------
    for side in Side:
        yuv_dir = project_dir / f"{side.value}_camera_raw"
        yuv_dir.mkdir(exist_ok=True)
        w, h = cfg.color_width, cfg.color_height
        for i, ts in enumerate(timestamps):
            z = render_box_depth(
                poses_cw[i], cfx, cfy, ccx_flipped, ccy,
                w, h, cfg.box_min, cfg.box_max,
            )
            u = np.arange(w)[None, :].astype(np.float64)
            v = np.arange(h)[:, None].astype(np.float64)
            d_cam = np.stack(
                [
                    np.broadcast_to((u - ccx_flipped) / cfx, (h, w)),
                    np.broadcast_to((v - ccy) / cfy, (h, w)),
                    np.ones((h, w)),
                ],
                -1,
            )
            R = poses_cw[i][:3, :3]
            c = poses_cw[i][:3, 3]
            pts = c + z[..., None] * (d_cam @ R.T)
            rgb = (wall_color(pts, cfg.box_min, cfg.box_max) * 255).astype(np.uint8)
            _write_yuv_frame(yuv_dir / f"{ts}.yuv", rgb)

        fmt = {
            "width": w,
            "height": h,
            "format": "YUV_420_888",
            "planes": [
                {"bufferSize": w * h, "rowStride": w, "pixelStride": 1},
                {"bufferSize": (w // 2) * (h // 2), "rowStride": w // 2, "pixelStride": 1},
                {"bufferSize": (w // 2) * (h // 2), "rowStride": w // 2, "pixelStride": 1},
            ],
            "baseTime": {"baseMonoTimeNs": 0, "baseUnixTimeMs": 0},
        }
        with open(project_dir / f"{side.value}_camera_image_format.json", "w") as f:
            json.dump(fmt, f)

        chars = {
            "sensor": {
                "activeArraySize": {"left": 0, "top": 0, "right": w, "bottom": h}
            },
            "intrinsics": {"fx": cfx, "fy": cfy, "cx": ccx, "cy": ccy},
            "pose": {"translation": [0.0, 0.0, 0.0], "rotation": [0.0, 0.0, 0.0, 1.0]},
        }
        with open(project_dir / f"{side.value}_camera_characteristics.json", "w") as f:
            json.dump(chars, f)

    return project_dir, cfg, gt_o3d


def _write_yuv_frame(path: Path, rgb: np.ndarray):
    """RGB -> planar I420 bytes (BT.601 full-swing studio range like cv2)."""
    import cv2

    bgr = rgb[..., ::-1].copy()
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)  # (h*3/2, w) uint8
    i420.tofile(path)

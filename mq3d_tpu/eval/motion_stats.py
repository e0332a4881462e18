"""HMD / controller motion statistics.

Re-design of the reference's study-analysis tools (reference:
analysis/computation/compute_hmd_motion_stats.py:56-619 and
compute_controller_motion_stats.py:56-610): translation/rotation dynamics,
workspace volume, jitter, and viewing-sphere coverage with the headset FOV.
Everything is vectorized numpy over the full pose track.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from mq3d_tpu.geometry import quaternion as quat

HMD_FOV_DEG = 73.1  # reference compute_hmd_motion_stats.py:168-211


@dataclass
class MotionStats:
    duration_s: float
    total_distance_m: float
    mean_speed_mps: float
    max_speed_mps: float
    total_rotation_deg: float
    mean_angular_speed_dps: float
    yaw_range_deg: float
    pitch_range_deg: float
    roll_range_deg: float
    workspace_volume_m3: float
    position_jitter_m: float
    viewing_sphere_coverage: float
    viewing_sphere_coverage_fov: float


def _euler_zyx(quats: np.ndarray) -> np.ndarray:
    """xyzw quats -> (N, 3) yaw/pitch/roll (z-y-x intrinsic), degrees."""
    x, y, z, w = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return np.degrees(np.stack([yaw, pitch, roll], -1))


def _sphere_coverage(directions: np.ndarray, fov_deg: Optional[float], n_samples: int = 2000) -> float:
    """Fraction of the unit sphere covered by view directions, optionally
    dilated by half the FOV cone (reference :168-211)."""
    if len(directions) == 0:
        return 0.0
    # Fibonacci sphere sample points.
    i = np.arange(n_samples) + 0.5
    phi = np.arccos(1 - 2 * i / n_samples)
    theta = np.pi * (1 + 5 ** 0.5) * i
    samples = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )
    d = directions / np.maximum(np.linalg.norm(directions, axis=-1, keepdims=True), 1e-12)
    cos_thresh = np.cos(np.radians(fov_deg / 2.0)) if fov_deg else np.cos(np.radians(1.0))
    covered = (samples @ d.T).max(axis=1) >= cos_thresh
    return float(covered.mean())


def compute_motion_stats(
    timestamps: np.ndarray,  # seconds or ms (auto-detected)
    positions: np.ndarray,  # (N, 3)
    rotations: np.ndarray,  # (N, 4) xyzw
    forward_axis: np.ndarray = np.array([0.0, 0.0, 1.0]),
) -> MotionStats:
    t = np.asarray(timestamps, np.float64)
    if len(t) > 1 and np.median(np.diff(t)) > 1.0:
        t = t / 1000.0  # ms -> s
    dt = np.diff(t)
    dt = np.where(dt > 0, dt, np.nan)

    pos = np.asarray(positions, np.float64)
    step = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
    speed = step / dt
    total_distance = float(np.nansum(step))
    duration = float(t[-1] - t[0]) if len(t) > 1 else 0.0

    q = np.asarray(rotations, np.float64)
    # Relative rotation angles between consecutive frames.
    rel = np.asarray(quat.multiply(quat.conjugate(q[:-1]), q[1:]))
    ang = 2 * np.arccos(np.clip(np.abs(rel[:, 3]), -1, 1))
    total_rotation = float(np.degrees(np.nansum(ang)))
    ang_speed = np.degrees(ang) / dt

    euler = _euler_zyx(q)
    ranges = euler.max(0) - euler.min(0)

    extent = pos.max(0) - pos.min(0) if len(pos) else np.zeros(3)
    workspace = float(np.prod(np.maximum(extent, 0)))

    # Jitter: residual after a 5-sample moving average.
    if len(pos) >= 5:
        kernel = np.ones(5) / 5
        smooth = np.stack(
            [np.convolve(pos[:, k], kernel, mode="same") for k in range(3)], -1
        )
        jitter = float(np.linalg.norm(pos[2:-2] - smooth[2:-2], axis=-1).mean())
    else:
        jitter = 0.0

    fwd = np.asarray(quat.rotate(q, forward_axis))
    coverage = _sphere_coverage(fwd, fov_deg=None)
    coverage_fov = _sphere_coverage(fwd, fov_deg=HMD_FOV_DEG)

    return MotionStats(
        duration_s=duration,
        total_distance_m=total_distance,
        mean_speed_mps=float(np.nanmean(speed)) if len(speed) else 0.0,
        max_speed_mps=float(np.nanmax(speed)) if len(speed) else 0.0,
        total_rotation_deg=total_rotation,
        mean_angular_speed_dps=float(np.nanmean(ang_speed)) if len(ang_speed) else 0.0,
        yaw_range_deg=float(ranges[0]),
        pitch_range_deg=float(ranges[1]),
        roll_range_deg=float(ranges[2]),
        workspace_volume_m3=workspace,
        position_jitter_m=jitter,
        viewing_sphere_coverage=coverage,
        viewing_sphere_coverage_fov=coverage_fov,
    )


def stats_from_pose_csv(csv_path) -> MotionStats:
    import pandas as pd

    df = pd.read_csv(csv_path, on_bad_lines="skip").dropna()
    df = df.sort_values("unix_time")
    return compute_motion_stats(
        df["unix_time"].to_numpy() / 1000.0,
        df[["pos_x", "pos_y", "pos_z"]].to_numpy(),
        df[["rot_x", "rot_y", "rot_z", "rot_w"]].to_numpy(),
    )

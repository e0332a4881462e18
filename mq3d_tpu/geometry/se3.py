"""SE(3) / se(3) math for pose-graph optimization and ICP.

The reference leans on Open3D's C++ GlobalOptimization/ICP internals for all
Lie-group work (reference: scripts/processing/reconstruction/depth_optimization/
make_fragments.py:259-269, refine_fragment_poses.py:298-308).  We need
exp/log maps and pose composition as batched primitives so the Gauss-Newton /
Levenberg-Marquardt solvers in ops/posegraph.py and ops/icp.py run fully
on-device; the same functions run eagerly on host numpy (geometry/_dispatch).

Twist convention: xi = (omega, upsilon) with rotation first — matching the
standard Open3D/Sophus ordering used in pose-graph Jacobians.
Poses are (..., 4, 4) homogeneous matrices.
"""

from __future__ import annotations

from mq3d_tpu.geometry._dispatch import get_namespace

_EPS = 1e-10


def hat(omega):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    xp = get_namespace(omega)
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = xp.zeros_like(ox)
    return xp.stack(
        [
            xp.stack([zeros, -oz, oy], axis=-1),
            xp.stack([oz, zeros, -ox], axis=-1),
            xp.stack([-oy, ox, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """(..., 3, 3) skew matrix -> (..., 3) vector."""
    xp = get_namespace(m)
    return xp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _theta(omega):
    xp = get_namespace(omega)
    return xp.linalg.norm(omega, axis=-1, keepdims=True)[..., None]


def so3_exp(omega):
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    xp = get_namespace(omega)
    theta = _theta(omega)
    K = hat(omega)
    K2 = K @ K
    eye = xp.broadcast_to(xp.eye(3, dtype=omega.dtype), K.shape)
    t2 = theta * theta
    small = theta < 1e-5
    safe = xp.where(small, 1.0, theta)
    a = xp.where(small, 1.0 - t2 / 6.0, xp.sin(theta) / safe)
    b = xp.where(small, 0.5 - t2 / 24.0, (1.0 - xp.cos(theta)) / xp.where(small, 1.0, t2))
    return eye + a * K + b * K2


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) axis-angle (theta in [0, pi])."""
    xp = get_namespace(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = xp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = xp.arccos(cos_theta)
    w = vee(R - xp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis

    sin_theta = xp.sin(theta)
    small = theta < 1e-5
    near_pi = theta > 3.14159265 - 1e-4

    scale = xp.where(
        small,
        1.0 + theta * theta / 6.0,
        theta / xp.where(small | (sin_theta == 0), 1.0, sin_theta),
    )
    omega_generic = w * scale[..., None]

    # Near pi the generic formula loses the axis (sin(theta) -> 0).  Recover
    # the axis from (R + I), whose columns are all parallel to the axis there:
    # pick the column with the largest diagonal entry for stability.
    RI = R + xp.broadcast_to(xp.eye(3, dtype=R.dtype), R.shape)
    diag = xp.stack([RI[..., 0, 0], RI[..., 1, 1], RI[..., 2, 2]], axis=-1)
    k = xp.argmax(diag, axis=-1)
    col = xp.take_along_axis(RI, k[..., None, None], axis=-1)[..., 0]  # (..., 3)
    col_norm = xp.linalg.norm(col, axis=-1, keepdims=True)
    axis_pi = col / xp.where(col_norm < _EPS, 1.0, col_norm)
    # Resolve the overall sign with the (tiny but directional) skew part.
    dot_w = xp.sum(axis_pi * w, axis=-1, keepdims=True)
    axis_pi = xp.where(dot_w < 0, -axis_pi, axis_pi)
    omega_pi = axis_pi * theta[..., None]

    return xp.where(near_pi[..., None], omega_pi, omega_generic)


def _jacobian_coeffs(omega):
    xp = get_namespace(omega)
    theta = _theta(omega)
    t2 = theta * theta
    small = theta < 1e-5
    b = xp.where(small, 0.5 - t2 / 24.0, (1.0 - xp.cos(theta)) / xp.where(small, 1.0, t2))
    c = xp.where(
        small,
        1.0 / 6.0 - t2 / 120.0,
        (theta - xp.sin(theta)) / xp.where(small, 1.0, t2 * theta),
    )
    return b, c


def _left_jacobian(omega):
    """SO(3) left Jacobian J_l(omega): translation coupling of se3_exp."""
    xp = get_namespace(omega)
    K = hat(omega)
    K2 = K @ K
    eye = xp.broadcast_to(xp.eye(3, dtype=omega.dtype), K.shape)
    b, c = _jacobian_coeffs(omega)
    return eye + b * K + c * K2


def _left_jacobian_inv(omega):
    xp = get_namespace(omega)
    theta = _theta(omega)
    K = hat(omega)
    K2 = K @ K
    eye = xp.broadcast_to(xp.eye(3, dtype=omega.dtype), K.shape)
    t2 = theta * theta
    small = theta < 1e-5
    half = theta * 0.5
    sin_half = xp.sin(half)
    cot_term = xp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * xp.cos(half) / xp.where(small | (sin_half == 0), 1.0, sin_half))
        / xp.where(small, 1.0, t2),
    )
    return eye - 0.5 * K + cot_term * K2


def se3_exp(xi):
    """(..., 6) twist (omega, upsilon) -> (..., 4, 4) pose."""
    xp = get_namespace(xi)
    omega = xi[..., :3]
    upsilon = xi[..., 3:]
    R = so3_exp(omega)
    t = (_left_jacobian(omega) @ upsilon[..., None])[..., 0]
    top = xp.concatenate([R, t[..., None]], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return xp.concatenate([top, bottom], axis=-2)


def se3_log(T):
    """(..., 4, 4) pose -> (..., 6) twist (omega, upsilon).

    Inverse of se3_exp for rotation angles < pi.
    """
    xp = get_namespace(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    upsilon = (_left_jacobian_inv(omega) @ t[..., None])[..., 0]
    return xp.concatenate([omega, upsilon], axis=-1)


def se3_inverse(T):
    """Batched rigid-pose inverse without linalg.inv."""
    xp = get_namespace(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = xp.swapaxes(R, -1, -2)
    t_inv = -(Rt @ t[..., None])[..., 0]
    top = xp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return xp.concatenate([top, bottom], axis=-2)


def transform_points(T, points):
    """Apply (..., 4, 4) pose to (..., N, 3) points."""
    xp = get_namespace(T, points)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ xp.swapaxes(R, -1, -2) + t[..., None, :]

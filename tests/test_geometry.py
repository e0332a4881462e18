"""Geometry unit tests: quaternion/SE(3) math validated against scipy."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mq3d_tpu.geometry import quaternion as quat
from mq3d_tpu.geometry import se3
from mq3d_tpu.geometry.coordinates import (
    CoordinateSystem,
    camera_basis,
    coordinate_transform_matrix,
    world_basis,
)
from mq3d_tpu.geometry.intrinsics import depth_camera_params, intrinsic_matrices, mirror_cx


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_as_matrix_matches_scipy(self, rng):
        q = random_quats(rng)
        ours = np.asarray(quat.as_matrix(q))
        scipys = R.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, scipys, atol=1e-12)

    def test_from_matrix_matches_scipy(self, rng):
        q = random_quats(rng)
        m = R.from_quat(q).as_matrix()
        ours = np.asarray(quat.from_matrix(m))
        scipys = R.from_matrix(m).as_quat()
        # Quaternion double cover: compare up to sign.
        sign = np.sign(np.sum(ours * scipys, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, scipys, atol=1e-9)

    def test_multiply_matches_scipy(self, rng):
        q1, q2 = random_quats(rng), random_quats(rng)
        ours = np.asarray(quat.multiply(q1, q2))
        scipys = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
        sign = np.sign(np.sum(ours * scipys, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, scipys, atol=1e-12)

    def test_rotate_matches_scipy(self, rng):
        q = random_quats(rng)
        v = rng.normal(size=(64, 3))
        ours = np.asarray(quat.rotate(q, v))
        scipys = R.from_quat(q).apply(v)
        np.testing.assert_allclose(ours, scipys, atol=1e-12)

    def test_conjugate_is_inverse(self, rng):
        q = random_quats(rng)
        v = rng.normal(size=(64, 3))
        v2 = np.asarray(quat.rotate(quat.conjugate(q), quat.rotate(q, v)))
        np.testing.assert_allclose(v2, v, atol=1e-12)

    def test_slerp_matches_scipy(self, rng):
        from scipy.spatial.transform import Slerp

        q = random_quats(rng, 2)
        rots = R.from_quat(q)
        s = Slerp([0.0, 1.0], rots)
        for alpha in [0.0, 0.25, 0.5, 0.99, 1.0]:
            ours = np.asarray(quat.slerp(q[0], q[1], alpha))
            scipys = s(alpha).as_quat()
            sign = np.sign(np.sum(ours * scipys))
            np.testing.assert_allclose(ours * sign, scipys, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(128, 6))
        # log(exp(omega)) == omega only holds for |omega| < pi.
        norms = np.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
        xi[:, :3] *= 0.9 * np.pi / np.maximum(norms, 0.9 * np.pi)
        T = np.asarray(se3.se3_exp(xi))
        xi2 = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-8)

    def test_exp_matches_scipy_rotation(self, rng):
        omega = rng.normal(size=(64, 3))
        Rm = np.asarray(se3.so3_exp(omega))
        scipys = R.from_rotvec(omega).as_matrix()
        np.testing.assert_allclose(Rm, scipys, atol=1e-10)

    def test_log_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0.6, 0.8, 0.0])]:
            omega = axis * (np.pi - 1e-6)
            Rm = R.from_rotvec(omega[None]).as_matrix()
            back = np.asarray(se3.so3_log(Rm))[0]
            np.testing.assert_allclose(back, omega, atol=1e-4)

    def test_inverse(self, rng):
        xi = rng.normal(size=(16, 6))
        T = np.asarray(se3.se3_exp(xi))
        I = np.asarray(se3.se3_inverse(T)) @ T
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-10)

    def test_transform_points(self, rng):
        xi = rng.normal(size=(6,))
        T = np.asarray(se3.se3_exp(xi))
        pts = rng.normal(size=(32, 3))
        ours = np.asarray(se3.transform_points(T, pts))
        ref = (T[:3, :3] @ pts.T).T + T[:3, 3]
        np.testing.assert_allclose(ours, ref, atol=1e-12)


class TestCoordinates:
    def test_bases_match_reference_constants(self):
        # reference scripts/models/transforms.py:132-161
        np.testing.assert_array_equal(world_basis(CoordinateSystem.UNITY), np.eye(3))
        np.testing.assert_array_equal(
            world_basis(CoordinateSystem.OPEN3D), np.diag((1, 1, -1))
        )
        np.testing.assert_array_equal(
            world_basis(CoordinateSystem.NERFSTUDIO),
            np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]]),
        )
        np.testing.assert_array_equal(
            world_basis(CoordinateSystem.COLMAP), np.diag((1, -1, 1))
        )
        np.testing.assert_array_equal(camera_basis(CoordinateSystem.UNITY), np.eye(3))
        np.testing.assert_array_equal(
            camera_basis(CoordinateSystem.OPEN3D), np.diag((1, -1, -1))
        )
        np.testing.assert_array_equal(
            camera_basis(CoordinateSystem.NERFSTUDIO),
            np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]]),
        )
        np.testing.assert_array_equal(camera_basis(CoordinateSystem.COLMAP), np.eye(3))

    def test_transform_matrix_composition(self):
        m = coordinate_transform_matrix(CoordinateSystem.UNITY, CoordinateSystem.OPEN3D)
        np.testing.assert_array_equal(m, np.diag((1, 1, -1)))
        # round trip
        back = coordinate_transform_matrix(CoordinateSystem.OPEN3D, CoordinateSystem.UNITY)
        np.testing.assert_array_equal(back @ m, np.eye(3))


class TestIntrinsics:
    def test_depth_camera_params(self):
        # closed form from reference scripts/utils/depth_utils.py:4-18
        fx, fy, cx, cy = depth_camera_params(1.0, 1.0, 1.0, 1.0, 320, 240)
        assert fx == 160.0 and fy == 120.0 and cx == 160.0 and cy == 120.0

    def test_mirror_cx(self):
        K = intrinsic_matrices([100.0], [100.0], [30.0], [120.0])
        K2 = mirror_cx(K, [320])
        assert K2[0, 0, 2] == 320 - 30
        assert K[0, 0, 2] == 30.0  # original untouched

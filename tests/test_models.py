"""Transforms / dataset model tests, including parity with scipy-based math
identical to the reference implementation."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mq3d_tpu.models.datasets import CameraDataset, DepthDataset
from mq3d_tpu.models.transforms import CoordinateSystem, Transforms


def make_transforms(rng, n=16, cs=CoordinateSystem.UNITY):
    pos = rng.normal(size=(n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Transforms(cs, pos, q)


class TestTransforms:
    def test_extrinsics_roundtrip(self, rng):
        t = make_transforms(rng)
        cw = t.extrinsics_cw
        wc = t.extrinsics_wc
        prod = cw.astype(np.float64) @ wc.astype(np.float64)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)

    def test_positions_cw_reference_formula(self, rng):
        # reference transforms.py:94-119: p_cw = -R^{-1} p
        t = make_transforms(rng)
        expected = -R.from_quat(t.rotations).inv().apply(t.positions)
        np.testing.assert_allclose(t.positions_cw, expected, atol=1e-12)

    def test_convert_coordinate_system_reference_parity(self, rng):
        """Replicates the reference algorithm with scipy step by step and
        compares (reference transforms.py:164-202)."""
        t = make_transforms(rng, cs=CoordinateSystem.UNITY)
        for target, is_camera in [
            (CoordinateSystem.OPEN3D, True),
            (CoordinateSystem.OPEN3D, False),
            (CoordinateSystem.COLMAP, True),
            (CoordinateSystem.NERFSTUDIO, True),
        ]:
            ours = t.convert_coordinate_system(target, is_camera=is_camera)

            def basis(cs):
                return {
                    CoordinateSystem.UNITY: np.eye(3),
                    CoordinateSystem.OPEN3D: np.diag((1.0, 1.0, -1.0)),
                    CoordinateSystem.NERFSTUDIO: np.array(
                        [[1.0, 0, 0], [0, 0, 1.0], [0, 1.0, 0]]
                    ),
                    CoordinateSystem.COLMAP: np.diag((1.0, -1.0, 1.0)),
                }[cs]

            def cam_basis(cs):
                return {
                    CoordinateSystem.UNITY: np.eye(3),
                    CoordinateSystem.OPEN3D: np.diag((1.0, -1.0, -1.0)),
                    CoordinateSystem.NERFSTUDIO: np.array(
                        [[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]]
                    ),
                    CoordinateSystem.COLMAP: np.eye(3),
                }[cs]

            R_conv = basis(target) @ basis(CoordinateSystem.UNITY).T
            exp_pos = (R_conv @ t.positions.T).T
            rot = R.from_quat(t.rotations).as_matrix()
            if is_camera:
                rot = rot @ cam_basis(CoordinateSystem.UNITY).T
            rot = R_conv @ rot @ R_conv.T
            if is_camera:
                rot = rot @ cam_basis(target)
            exp_rot = R.from_matrix(rot).as_quat()

            np.testing.assert_allclose(ours.positions, exp_pos, atol=1e-12)
            sign = np.sign(np.sum(ours.rotations * exp_rot, axis=-1, keepdims=True))
            np.testing.assert_allclose(ours.rotations * sign, exp_rot, atol=1e-9)

    def test_same_system_is_identity(self, rng):
        t = make_transforms(rng)
        assert t.convert_coordinate_system(CoordinateSystem.UNITY) is t

    def test_apply_local_transform_reference_parity(self, rng):
        t = make_transforms(rng)
        lp = rng.normal(size=3)
        lq = rng.normal(size=4)
        lq /= np.linalg.norm(lq)
        ours = t.apply_local_transform(lp, lq)
        parent = R.from_quat(t.rotations)
        exp_pos = t.positions + parent.apply(lp)
        exp_rot = (parent * R.from_quat(lq)).as_quat()
        np.testing.assert_allclose(ours.positions, exp_pos, atol=1e-12)
        sign = np.sign(np.sum(ours.rotations * exp_rot, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours.rotations * sign, exp_rot, atol=1e-12)

    def test_apply_world_transform_reference_parity(self, rng):
        t = make_transforms(rng)
        dp = rng.normal(size=3)
        dq = rng.normal(size=4)
        dq /= np.linalg.norm(dq)
        ours = t.apply_world_transform(dp, dq)
        delta = R.from_quat(dq)
        exp_pos = delta.apply(t.positions) + dp
        exp_rot = (delta * R.from_quat(t.rotations)).as_quat()
        np.testing.assert_allclose(ours.positions, exp_pos, atol=1e-12)
        sign = np.sign(np.sum(ours.rotations * exp_rot, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours.rotations * sign, exp_rot, atol=1e-12)


def make_depth_dataset(rng, n=10):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return DepthDataset(
        directory_relative_path="left_depth",
        image_file_names=np.array([f"{i}.raw" for i in range(n)]),
        timestamps=np.arange(n) * 100,
        fx=np.full(n, 100.0),
        fy=np.full(n, 100.0),
        cx=np.full(n, 80.0),
        cy=np.full(n, 60.0),
        transforms=Transforms(CoordinateSystem.UNITY, rng.normal(size=(n, 3)), q),
        widths=np.full(n, 160),
        heights=np.full(n, 120),
        nears=np.full(n, 0.1),
        fars=np.full(n, 5.0),
    )


class TestDatasets:
    def test_npz_roundtrip(self, rng, tmp_path):
        ds = make_depth_dataset(rng)
        p = tmp_path / "ds.npz"
        ds.save(p)
        loaded = DepthDataset.load(p)
        assert len(loaded) == len(ds)
        np.testing.assert_array_equal(loaded.timestamps, ds.timestamps)
        np.testing.assert_allclose(loaded.transforms.positions, ds.transforms.positions)
        assert loaded.transforms.coordinate_system == CoordinateSystem.UNITY
        np.testing.assert_array_equal(loaded.nears, ds.nears)

    def test_npz_keys_match_reference_layout(self, rng, tmp_path):
        ds = make_depth_dataset(rng)
        p = tmp_path / "ds.npz"
        ds.save(p)
        keys = set(np.load(p).keys())
        assert keys == {
            "directory_relative_path", "image_file_names", "timestamps",
            "fx", "fy", "cx", "cy", "coordinate_system", "positions",
            "rotations", "widths", "heights", "nears", "fars",
        }

    def test_split_merge_roundtrip(self, rng):
        ds = make_depth_dataset(rng, n=10)
        frags = ds.split(3)
        assert [len(f) for f in frags] == [3, 3, 3, 1]
        merged = DepthDataset.merge(frags)
        np.testing.assert_array_equal(merged.timestamps, ds.timestamps)
        np.testing.assert_allclose(merged.transforms.rotations, ds.transforms.rotations)

    def test_find_nearest_index(self, rng):
        ds = make_depth_dataset(rng)
        assert ds.find_nearest_index(-5) == 0
        assert ds.find_nearest_index(149) == 1
        assert ds.find_nearest_index(151) == 2
        assert ds.find_nearest_index(10_000) == len(ds) - 1

    def test_fancy_indexing(self, rng):
        ds = make_depth_dataset(rng)
        sub = ds[[0, 2, 4]]
        assert isinstance(sub, DepthDataset)
        np.testing.assert_array_equal(sub.timestamps, [0, 200, 400])
        row = ds[3]
        assert isinstance(row, dict)
        assert row["timestamps"] == 300

    def test_render_intrinsics_mirror(self, rng):
        ds = make_depth_dataset(rng)
        K = ds.get_render_intrinsic_matrices()
        assert K[0, 0, 2] == 160 - 80.0

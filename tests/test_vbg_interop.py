"""Open3D VoxelBlockGrid npz interop + mesh orientation tests.

A fixture mimicking Open3D's VoxelBlockGrid.save schema (reference cache
format, scripts/dataio/reconstruction_data_io.py:42-55; schema per open3d
t/geometry/VoxelBlockGrid.cpp) is imported and must extract the same
surface as the natively-built volume; our exporter round-trips through the
importer bit-exactly; extracted triangle normals follow Open3D's outward
(toward positive TSDF) orientation."""

import numpy as np
import pytest

from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume


def build_sphere_volume(cfg=None, radius=0.5):
    """Analytic TSDF sphere (positive outside) on a small dense volume."""
    cfg = cfg or TSDFConfig(
        voxel_size=0.05, block_resolution=8, block_count=512, grid_dim=16,
        depth_max=4.0, trunc_voxel_multiplier=4.0,
        chunk_active_capacity=512, integrate_tile=128)
    import jax.numpy as jnp
    from mq3d_tpu.ops.tsdf import TSDFState, create_state

    R = cfg.block_resolution
    G = cfg.grid_dim
    trunc = cfg.trunc
    # Allocate the 4^3 blocks around the origin.
    coords = np.stack(np.meshgrid(*([np.arange(-2, 2)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    coords = coords.astype(np.int32)
    n = len(coords)
    lx, ly, lz = np.meshgrid(*([np.arange(R)] * 3), indexing="ij")
    local = np.stack([lx, ly, lz], -1).reshape(-1, 3)  # (R^3, 3) x-slowest
    centers = ((coords[:, None, :] * R + local[None]) + 0.5) * cfg.voxel_size
    dist = np.linalg.norm(centers, axis=-1) - radius
    tsdf = np.clip(dist / trunc, -1.0, 1.0).astype(np.float32)
    # above the extraction weight_threshold (3.0, Open3D default)
    weight = np.full_like(tsdf, 5.0)

    h = G // 2
    keys = (((coords[:, 0] + h) * G + coords[:, 1] + h) * G
            + coords[:, 2] + h)
    slot_table = np.full((G ** 3,), -1, np.int32)
    slot_table[keys] = np.arange(n, dtype=np.int32)
    vol = TSDFVolume(cfg)
    vol.state = TSDFState(
        slot_table=jnp.asarray(slot_table),
        block_coords=jnp.asarray(
            np.concatenate([coords, np.zeros((1, 3), np.int32)])),
        tsdf=jnp.asarray(np.concatenate(
            [tsdf, np.zeros((1, cfg.r3), np.float32)])),
        weight=jnp.asarray(np.concatenate(
            [weight, np.zeros((1, cfg.r3), np.float32)])),
        n_active=jnp.asarray(n, jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        dropped_active=jnp.zeros((), jnp.int32),
    )
    return vol, tsdf, weight, coords


def write_open3d_fixture(path, coords, tsdf, weight, voxel, R):
    """Simulate a reference/Open3D-written colorless_vbg.npz: per-block
    tensors shaped (N, R, R, R, C) indexed [z][y][x]."""
    n = len(coords)
    t = tsdf.reshape(n, R, R, R).transpose(0, 3, 2, 1)[..., None]
    w = weight.reshape(n, R, R, R).transpose(0, 3, 2, 1)[..., None]
    np.savez_compressed(
        path, key=coords.astype(np.int32),
        attr_tsdf=t.astype(np.float32), attr_weight=w.astype(np.float32),
        voxel_size=np.asarray([voxel], np.float64),
        block_resolution=np.asarray([R], np.int64))


class TestOpen3DInterop:
    def test_import_open3d_schema(self, tmp_path):
        vol, tsdf, weight, coords = build_sphere_volume()
        cfg = vol.cfg
        fix = tmp_path / "colorless_vbg.npz"
        write_open3d_fixture(fix, coords, tsdf, weight, cfg.voxel_size,
                             cfg.block_resolution)

        loaded = TSDFVolume.load_open3d_npz(
            fix, grid_dim=cfg.grid_dim, depth_max=cfg.depth_max,
            trunc_voxel_multiplier=cfg.trunc_voxel_multiplier)
        assert loaded.n_active == vol.n_active
        np.testing.assert_allclose(
            np.asarray(loaded.state.tsdf[:vol.n_active]), tsdf, atol=0)
        # Same surface out of both volumes.
        mesh_native = vol.extract_triangle_mesh()
        mesh_loaded = loaded.extract_triangle_mesh()
        assert len(mesh_loaded.vertices) == len(mesh_native.vertices)
        np.testing.assert_allclose(
            np.sort(np.linalg.norm(mesh_loaded.vertices, axis=-1)),
            np.sort(np.linalg.norm(mesh_native.vertices, axis=-1)),
            atol=1e-6)

    def test_load_autodetects_schema(self, tmp_path):
        vol, tsdf, weight, coords = build_sphere_volume()
        fix = tmp_path / "colorless_vbg.npz"
        write_open3d_fixture(fix, coords, tsdf, weight, vol.cfg.voxel_size,
                             vol.cfg.block_resolution)
        loaded = TSDFVolume.load(fix)  # generic loader must detect schema
        assert loaded.n_active == vol.n_active

    def test_export_roundtrip_bitexact(self, tmp_path):
        vol, tsdf, weight, coords = build_sphere_volume()
        out = tmp_path / "ours_as_o3d.npz"
        vol.save_open3d_npz(out)
        back = TSDFVolume.load_open3d_npz(
            out, grid_dim=vol.cfg.grid_dim, depth_max=vol.cfg.depth_max,
            trunc_voxel_multiplier=vol.cfg.trunc_voxel_multiplier)
        n = vol.n_active
        np.testing.assert_array_equal(
            np.asarray(back.state.block_coords[:n]),
            np.asarray(vol.state.block_coords[:n]))
        np.testing.assert_array_equal(
            np.asarray(back.state.tsdf[:n]), np.asarray(vol.state.tsdf[:n]))
        np.testing.assert_array_equal(
            np.asarray(back.state.weight[:n]),
            np.asarray(vol.state.weight[:n]))

    def test_uint16_weights_accepted(self, tmp_path):
        vol, tsdf, weight, coords = build_sphere_volume()
        cfg = vol.cfg
        n = len(coords)
        R = cfg.block_resolution
        fix = tmp_path / "w16.npz"
        t = tsdf.reshape(n, R, R, R).transpose(0, 3, 2, 1)[..., None]
        w = weight.reshape(n, R, R, R).transpose(0, 3, 2, 1)[..., None]
        np.savez_compressed(
            fix, key=coords.astype(np.int32),
            attr_tsdf=t.astype(np.float32),
            attr_weight=(w * 3).astype(np.uint16),  # max 15
            voxel_size=np.asarray([cfg.voxel_size], np.float64),
            block_resolution=np.asarray([R], np.int64))
        loaded = TSDFVolume.load_open3d_npz(fix, grid_dim=cfg.grid_dim)
        assert loaded.state.weight.dtype == np.float32
        assert float(np.asarray(
            loaded.state.weight[:n]).max()) == pytest.approx(15.0)


class TestMeshOrientation:
    def test_normals_point_outward(self):
        """Open3D MC convention: triangle normals point toward positive
        TSDF (outside).  For a sphere with positive-outside TSDF the
        cross-product normals must point away from the center."""
        vol, *_ = build_sphere_volume()
        mesh = vol.extract_triangle_mesh()
        v = np.asarray(mesh.vertices)
        t = np.asarray(mesh.triangles)
        assert len(t) > 100
        fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
        centroid = v[t].mean(axis=1)
        outward = centroid / np.maximum(
            np.linalg.norm(centroid, axis=-1, keepdims=True), 1e-12)
        cosang = np.einsum("ij,ij->i", fn, outward)
        # all faces wind outward (tolerate tiny numeric slivers)
        assert (cosang > 0).mean() > 0.999

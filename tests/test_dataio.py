"""Data IO tests on a synthetic project: datasets build correctly, poses
round-trip through the logging conventions, and PLY/PCD codecs round-trip."""

import numpy as np
import pytest

from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.dataio.ply import (
    PointCloud,
    TriangleMesh,
    read_pcd,
    read_ply,
    write_pcd,
    write_ply_mesh,
    write_ply_pointcloud,
)
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem
from mq3d_tpu.testing.synthetic import (
    SyntheticSceneConfig,
    render_box_depth,
    write_synthetic_project,
)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    d = tmp_path_factory.mktemp("proj")
    return write_synthetic_project(d, SyntheticSceneConfig(n_frames=6))


class TestDepthIO:
    def test_build_depth_dataset(self, project):
        proj_dir, cfg, gt = project
        io = DataIO(proj_dir)
        ds = io.depth.load_depth_dataset(Side.LEFT, use_cache=False)
        assert len(ds) == cfg.n_frames
        assert ds.transforms.coordinate_system == CoordinateSystem.UNITY
        # Converting to OPEN3D camera frame must recover ground truth poses.
        conv = ds.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        np.testing.assert_allclose(conv.positions, gt.positions, atol=1e-9)
        dot = np.abs(np.sum(conv.rotations * gt.rotations, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_depth_roundtrip_analytic(self, project):
        proj_dir, cfg, gt = project
        io = DataIO(proj_dir)
        ds = io.depth.load_depth_dataset(Side.LEFT, use_cache=True)
        d = io.depth.load_depth_map_by_index(Side.LEFT, ds, 0)
        assert d is not None
        # Re-render analytic depth and compare where within far plane.
        from mq3d_tpu.geometry.intrinsics import mirror_cx

        K = mirror_cx(ds.get_intrinsic_matrices(), ds.widths)[0]
        z = render_box_depth(
            gt.extrinsics_cw[0].astype(np.float64),
            K[0, 0], K[1, 1], K[0, 2], K[1, 2],
            cfg.depth_width, cfg.depth_height, cfg.box_min, cfg.box_max,
        )
        mask = z < cfg.far * 0.99
        np.testing.assert_allclose(d[mask], z[mask], rtol=1e-3)

    def test_depth_stack(self, project):
        proj_dir, cfg, _ = project
        io = DataIO(proj_dir)
        ds = io.depth.load_depth_dataset(Side.LEFT)
        stack, valid = io.depth.load_depth_stack(Side.LEFT, ds)
        assert stack.shape == (cfg.n_frames, cfg.depth_height, cfg.depth_width)
        assert valid.all()

    def test_confidence_map_roundtrip(self, project, rng):
        proj_dir, _, _ = project
        from mq3d_tpu.models.camera import ConfidenceMap

        io = DataIO(proj_dir)
        cm = ConfidenceMap(
            confidence_map=rng.random((8, 10)).astype(np.float32),
            valid_count=rng.integers(0, 5, (8, 10)).astype(np.int32),
        )
        io.depth.save_confidence_map(Side.LEFT, 42, cm)
        loaded = io.depth.load_confidence_map(Side.LEFT, 42)
        np.testing.assert_array_equal(loaded.confidence_map, cm.confidence_map)
        np.testing.assert_array_equal(loaded.valid_count, cm.valid_count)

    def test_confidence_pack_matches_per_frame(self, project, rng):
        """The packed stack must return exactly the per-frame npz contents,
        rebuild itself when a map changes, and flag missing timestamps."""
        proj_dir, _, _ = project
        from mq3d_tpu.models.camera import ConfidenceMap

        io = DataIO(proj_dir)
        # The shared project fixture may hold maps from earlier tests at a
        # different resolution; start from a clean per-frame set.
        cdir = io.depth.depth_path_config.get_depth_confidence_map_dir_path(Side.LEFT)
        if cdir.exists():
            for p in cdir.glob("*.npz"):
                p.unlink()
        io.depth.invalidate_confidence_pack(Side.LEFT)
        ts_all = [100, 250, 400]
        maps = {}
        for t in ts_all:
            cm = ConfidenceMap(
                confidence_map=rng.random((6, 7)).astype(np.float32),
                valid_count=rng.integers(0, 5, (6, 7)).astype(np.int32),
            )
            io.depth.save_confidence_map(Side.LEFT, t, cm)
            maps[t] = cm

        # Without a pack, the batched read serves per-frame npzs.
        req = np.array([250, 999, 100], np.int64)  # unordered + one missing
        conf, cnt, have = io.depth.load_confidence_stack(Side.LEFT, req)
        np.testing.assert_array_equal(have, [True, False, True])
        np.testing.assert_array_equal(conf[0], maps[250].confidence_map)
        np.testing.assert_array_equal(cnt[0], maps[250].valid_count)
        np.testing.assert_array_equal(conf[2], maps[100].confidence_map)
        assert (conf[1] == 0).all()
        pack_path = io.depth.depth_path_config.get_confidence_pack_path(
            Side.LEFT, "confidence"
        )
        assert not pack_path.exists()  # reads never build packs

        # Explicit from-disk build; the mmap path serves identical rows.
        assert io.depth.build_confidence_pack(Side.LEFT)
        assert pack_path.exists()
        conf, cnt, have = io.depth.load_confidence_stack(Side.LEFT, req)
        np.testing.assert_array_equal(have, [True, False, True])
        np.testing.assert_array_equal(conf[0], maps[250].confidence_map)
        np.testing.assert_array_equal(cnt[2], maps[100].valid_count)

        # Overwriting a frame invalidates the pack; the read falls back to
        # the fresh per-frame npz.
        cm2 = ConfidenceMap(
            confidence_map=np.full((6, 7), 0.5, np.float32),
            valid_count=np.full((6, 7), 9, np.int32),
        )
        io.depth.save_confidence_map(Side.LEFT, 250, cm2)
        assert not pack_path.exists()
        conf, cnt, have = io.depth.load_confidence_stack(
            Side.LEFT, np.array([250], np.int64)
        )
        assert have.all()
        np.testing.assert_array_equal(conf[0], cm2.confidence_map)

        # A fresh timestamp written by another process (this handle still
        # holds the old pack mmap) fills from its per-frame npz.
        io.depth.build_confidence_pack(Side.LEFT)
        io2 = DataIO(proj_dir)
        _ = io2.depth.load_confidence_stack(Side.LEFT, np.array([100], np.int64))
        io.depth.save_confidence_map(Side.LEFT, 777, cm2)
        conf, cnt, have = io2.depth.load_confidence_stack(
            Side.LEFT, np.array([777], np.int64)
        )
        assert have.all()
        np.testing.assert_array_equal(conf[0], cm2.confidence_map)

        # Streamed writer (the estimation path): rows written from memory,
        # atomically published, served by the mmap path.
        ts_new = np.array([50, 60], np.int64)
        w = io.depth.start_confidence_pack(
            Side.LEFT, ts_new, (6, 7), np.float32, (6, 7), np.int32)
        rows = [rng.random((6, 7)).astype(np.float32) for _ in ts_new]
        w.write(1, rows[1], np.ones((6, 7), np.int32))
        w.write(0, rows[0], np.ones((6, 7), np.int32))
        w.finalize()
        conf, cnt, have = io.depth.load_confidence_stack(Side.LEFT, ts_new)
        assert have.all()
        np.testing.assert_array_equal(conf[0], rows[0])
        np.testing.assert_array_equal(conf[1], rows[1])

    def test_filtered_depth_stack_matches_per_frame_reference(self, project, rng):
        """Vectorized confidence filtering == the reference's per-frame
        masked writes (o3d_utils.py:109-150)."""
        proj_dir, cfg, _ = project
        from mq3d_tpu.models.camera import ConfidenceMap
        from mq3d_tpu.recon.integrate import load_filtered_depth_stack

        io = DataIO(proj_dir)
        cdir = io.depth.depth_path_config.get_depth_confidence_map_dir_path(Side.LEFT)
        if cdir.exists():
            for p in cdir.glob("*.npz"):
                p.unlink()
        io.depth.invalidate_confidence_pack(Side.LEFT)
        ds = io.depth.load_depth_dataset(Side.LEFT)
        h, w = cfg.depth_height, cfg.depth_width
        for t in np.asarray(ds.timestamps):
            io.depth.save_confidence_map(
                Side.LEFT,
                int(t),
                ConfidenceMap(
                    confidence_map=rng.random((h, w)).astype(np.float32),
                    valid_count=rng.integers(0, 6, (h, w)).astype(np.int32),
                ),
            )
        idx = np.arange(len(ds))
        got, valid = load_filtered_depth_stack(
            io.depth, Side.LEFT, ds, idx,
            use_confidence_filtered_depth=True,
            confidence_threshold=0.4,
            valid_count_threshold=3,
        )
        want, _ = io.depth.load_depth_stack(Side.LEFT, ds, idx)
        for i in idx:
            cm = io.depth.load_confidence_map(Side.LEFT, int(ds.timestamps[i]))
            frame = want[i]
            frame[cm.confidence_map < 0.4] = 0.0
            frame[cm.valid_count < 3] = 0.0
        np.testing.assert_array_equal(got, want)


class TestColorIO:
    def test_build_color_dataset_poses_match_gt(self, project):
        """YUV->RGB conversion then color dataset build: camera poses must
        match the ground-truth OPEN3D poses after frame conversion."""
        proj_dir, cfg, gt = project
        io = DataIO(proj_dir)

        # Convert a couple of YUV frames to RGB so the dataset can build.
        from mq3d_tpu.ops.yuv import convert_yuv420_888_to_bgr

        fmt = io.color.load_image_format_info(Side.LEFT)
        for ts in io.color.get_yuv_timestamps(Side.LEFT):
            raw = io.color.load_yuv(Side.LEFT, ts)
            bgr = convert_yuv420_888_to_bgr(raw, fmt)
            io.color.save_bgr(bgr, Side.LEFT, ts)

        ds = io.color.load_color_dataset(Side.LEFT, use_cache=False)
        assert len(ds) == cfg.n_frames
        conv = ds.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        np.testing.assert_allclose(conv.positions, gt.positions, atol=1e-6)
        dot = np.abs(np.sum(conv.rotations * gt.rotations, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-6)


class TestPlyPcd:
    def test_ply_mesh_roundtrip(self, rng, tmp_path):
        mesh = TriangleMesh(
            vertices=rng.normal(size=(10, 3)).astype(np.float32),
            triangles=rng.integers(0, 10, (7, 3)),
            vertex_colors=rng.random((10, 3)),
        )
        p = tmp_path / "m.ply"
        write_ply_mesh(p, mesh)
        loaded = read_ply(p)
        np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(loaded.triangles, mesh.triangles)
        np.testing.assert_allclose(
            loaded.vertex_colors, np.round(mesh.vertex_colors * 255) / 255, atol=1e-6
        )

    def test_ply_pointcloud_roundtrip(self, rng, tmp_path):
        pcd = PointCloud(
            points=rng.normal(size=(20, 3)),
            normals=rng.normal(size=(20, 3)),
        )
        p = tmp_path / "p.ply"
        write_ply_pointcloud(p, pcd)
        loaded = read_ply(p)
        np.testing.assert_allclose(loaded.points, pcd.points, atol=1e-6)
        np.testing.assert_allclose(loaded.normals, pcd.normals, atol=1e-6)

    def test_pcd_roundtrip(self, rng, tmp_path):
        pcd = PointCloud(points=rng.normal(size=(15, 3)), normals=rng.normal(size=(15, 3)))
        p = tmp_path / "f.pcd"
        write_pcd(p, pcd)
        loaded = read_pcd(p)
        np.testing.assert_allclose(loaded.points, pcd.points, atol=1e-6)
        np.testing.assert_allclose(loaded.normals, pcd.normals, atol=1e-6)

    def test_ply_open3d_compat(self, rng, tmp_path):
        """If open3d happens to be importable, cross-check the codec."""
        o3d = pytest.importorskip("open3d")
        mesh = TriangleMesh(
            vertices=rng.normal(size=(10, 3)), triangles=rng.integers(0, 10, (5, 3))
        )
        p = tmp_path / "m.ply"
        write_ply_mesh(p, mesh)
        m2 = o3d.io.read_triangle_mesh(str(p))
        np.testing.assert_allclose(np.asarray(m2.vertices), mesh.vertices, atol=1e-6)


class TestPoseInterpolator:
    def test_batch_matches_single_and_window(self, project):
        proj_dir, cfg, _ = project
        from mq3d_tpu.dataio.pose_interpolator import PoseInterpolator

        pi = PoseInterpolator(proj_dir / "hmd_poses.csv")
        ts = np.asarray([cfg.t0_ms, cfg.t0_ms + 10, cfg.t0_ms + 33 * cfg.n_frames + 31_000])
        pos, rot, valid = pi.interpolate_poses(ts)
        assert valid[0] and valid[1]
        # Last query is >30ms past the final pose: invalid.
        assert not valid[2]
        single = pi.interpolate_pose(int(ts[1]))
        np.testing.assert_allclose(single[0], pos[1])

    def test_pcd_binary_compressed(self, rng, tmp_path):
        """Read PCL/Open3D LZF binary_compressed PCD (SoA layout)."""
        import struct

        pts = rng.normal(size=(50, 3)).astype("<f4")
        soa = np.concatenate([pts[:, 0], pts[:, 1], pts[:, 2]]).tobytes()

        # Reference LZF compressor (simple literal-only encoding is valid
        # LZF: runs of up to 32 literals).
        def lzf_compress_literals(data):
            out = bytearray()
            i = 0
            while i < len(data):
                run = min(32, len(data) - i)
                out.append(run - 1)
                out += data[i : i + run]
                i += run
            return bytes(out)

        comp = lzf_compress_literals(soa)
        header = (
            "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
            "TYPE F F F\nCOUNT 1 1 1\nWIDTH 50\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 50\nDATA binary_compressed\n"
        ).encode()
        p = tmp_path / "c.pcd"
        p.write_bytes(header + struct.pack("<II", len(comp), len(soa)) + comp)
        loaded = read_pcd(p)
        np.testing.assert_allclose(loaded.points, pts.astype(np.float64), atol=1e-6)

    def test_lzf_backreference_decode(self):
        """LZF back-references (overlapping copy) decode correctly."""
        from mq3d_tpu.dataio.ply import _lzf_decompress

        # 'abc' literals then a back-ref repeating 'abcabc' (overlap run).
        # ctrl literal: 2 -> 3 bytes 'abc'; backref: length 6 -> ctrl
        # (len-2)=4 -> ctrl = (4<<5) | high(offset), offset = 2 (ref = o-3)
        data = bytes([2]) + b"abc" + bytes([(4 << 5) | 0, 2])
        out = _lzf_decompress(data, 9)
        assert out == b"abcabcabc"

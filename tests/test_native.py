"""Native IO runtime tests: build, batched raw reads, PNG encode."""

import numpy as np
import pytest

from mq3d_tpu.utils import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("native mqio not buildable in this environment")
    return True


class TestNative:
    def test_read_raw_batch(self, lib_ok, rng, tmp_path):
        frames = rng.random((5, 8, 6)).astype("<f4")
        paths = []
        for i, fr in enumerate(frames):
            p = tmp_path / f"{i}.raw"
            fr.tofile(p)
            paths.append(p)
        paths.append(tmp_path / "missing.raw")
        buf, ok = native.read_raw_batch(paths, 8 * 6 * 4)
        assert ok.tolist() == [True] * 5 + [False]
        got = buf[:5].view("<f4").reshape(5, 8, 6)
        np.testing.assert_array_equal(got, frames)
        assert (buf[5] == 0).all()

    def test_png_roundtrip_gray(self, lib_ok, rng, tmp_path):
        img = rng.integers(0, 256, (33, 47), np.uint8)
        p = tmp_path / "g.png"
        assert native.write_png(p, img)
        cv2 = pytest.importorskip("cv2")
        back = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(back, img)

    def test_png_roundtrip_bgr(self, lib_ok, rng, tmp_path):
        img = rng.integers(0, 256, (20, 31, 3), np.uint8)  # BGR convention
        p = tmp_path / "c.png"
        assert native.write_png(p, img)
        cv2 = pytest.importorskip("cv2")
        back = cv2.imread(str(p))  # BGR
        np.testing.assert_array_equal(back, img)

    def test_imwrite_uses_native(self, lib_ok, rng, tmp_path):
        from mq3d_tpu.utils.png import imread_gray, imwrite

        img = rng.integers(0, 256, (16, 16), np.uint8)
        p = tmp_path / "x.png"
        imwrite(p, img)
        np.testing.assert_array_equal(imread_gray(p), img)

    def test_depth_stack_via_native(self, lib_ok, tmp_path):
        """load_depth_stack (batched native read) == per-frame loads."""
        from mq3d_tpu.dataio.data_io import DataIO
        from mq3d_tpu.models.side import Side
        from mq3d_tpu.testing.synthetic import (
            SyntheticSceneConfig,
            write_synthetic_project,
        )

        proj, cfg, _ = write_synthetic_project(
            tmp_path / "p", SyntheticSceneConfig(n_frames=4)
        )
        io = DataIO(proj)
        ds = io.depth.load_depth_dataset(Side.LEFT, use_cache=False)
        stack, valid = io.depth.load_depth_stack(Side.LEFT, ds)
        assert valid.all()
        for i in range(len(ds)):
            single = io.depth.load_depth_map_by_index(Side.LEFT, ds, i)
            np.testing.assert_allclose(stack[i], single, rtol=1e-6, atol=1e-6)


class TestThreadedBatchIO:
    def test_read_raw_batch_mt(self, tmp_path, rng):
        from mq3d_tpu.utils.native import native_available, read_raw_batch

        if not native_available():
            pytest.skip("native runtime unavailable")
        frames = [rng.integers(0, 255, 1024, dtype=np.uint8)
                  for _ in range(17)]
        paths = []
        for i, f in enumerate(frames):
            p = tmp_path / f"f{i}.raw"
            f.tofile(p)
            paths.append(p)
        paths.append(tmp_path / "missing.raw")
        out, ok = read_raw_batch(paths, 1024)
        assert ok[:17].all() and not ok[17]
        for i, f in enumerate(frames):
            np.testing.assert_array_equal(out[i], f)
        assert (out[17] == 0).all()

    def test_write_png_batch_roundtrip(self, tmp_path, rng):
        from mq3d_tpu.utils.native import native_available, write_png_batch
        from mq3d_tpu.utils.png import imread_bgr

        if not native_available():
            pytest.skip("native runtime unavailable")
        imgs = rng.integers(0, 255, (9, 24, 32, 3), dtype=np.uint8)
        paths = [tmp_path / f"i{k}.png" for k in range(9)]
        ok = write_png_batch(paths, imgs)
        assert ok.all()
        for k, p in enumerate(paths):
            back = imread_bgr(p)
            np.testing.assert_array_equal(back, imgs[k])

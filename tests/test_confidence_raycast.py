"""Confidence-map and raycast tests against analytic ground truth."""

import numpy as np
import pytest

from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem
from mq3d_tpu.ops.raycast import raycast_depth
from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume
from mq3d_tpu.recon.confidence import confidence_for_refs, estimate_depth_confidences
from mq3d_tpu.testing.synthetic import (
    SyntheticSceneConfig,
    render_box_depth,
    write_synthetic_project,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("crproj")
    # Dense sweep (~7 deg/frame) so neighbor frames overlap strongly, as in
    # a real capture at 30 fps.
    return write_synthetic_project(
        d, SyntheticSceneConfig(n_frames=8, sweep=1.0)
    )


@pytest.fixture(scope="module")
def loaded(scene):
    proj_dir, cfg, gt = scene
    io = DataIO(proj_dir)
    ds = io.depth.load_depth_dataset(Side.LEFT, use_cache=False)
    ds.transforms = ds.transforms.convert_coordinate_system(
        CoordinateSystem.OPEN3D, is_camera=True
    )
    depth, valid = io.depth.load_depth_stack(Side.LEFT, ds)
    K = ds.get_render_intrinsic_matrices().astype(np.float32)
    T_cw = ds.transforms.extrinsics_cw.astype(np.float32)
    T_wc = np.linalg.inv(T_cw)
    return io, ds, depth, valid, K, T_cw, T_wc, cfg


class TestConfidence:
    def test_consistent_scene_high_confidence(self, loaded):
        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        conf, cnt = confidence_for_refs(
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(T_cw),
            jnp.asarray(T_wc), jnp.asarray(valid),
            jnp.asarray([0, 3], np.int32),
            depth_max=4.0, error_threshold=0.05, window=3,
        )
        conf = np.asarray(conf)
        cnt = np.asarray(cnt)
        # Depth maps are all views of the same rigid scene: wherever enough
        # neighbors observe a pixel, confidence must be ~1.
        seen = cnt >= 2
        assert seen.mean() > 0.3
        assert conf[seen].mean() > 0.95

    def test_inconsistent_frame_low_confidence(self, loaded):
        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        corrupted = depth.copy()
        corrupted[1] *= 0.7  # shrink one neighbor's depth by 30%
        conf, cnt = confidence_for_refs(
            jnp.asarray(corrupted), jnp.asarray(K), jnp.asarray(T_cw),
            jnp.asarray(T_wc), jnp.asarray(valid),
            jnp.asarray([1, 1], np.int32),
            depth_max=4.0, error_threshold=0.05, window=2,
        )
        conf = np.asarray(conf)[0]
        cnt = np.asarray(cnt)[0]
        seen = cnt >= 2
        # The corrupted frame disagrees with all its neighbors.
        assert conf[seen].mean() < 0.3

    def test_parity_with_reference_algorithm(self, loaded):
        """Dense-masked JAX path vs a direct numpy transcription of the
        reference's compact-and-reproject algorithm
        (compute_pixel_error_map.py:95-219)."""
        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        ref_i, tgt_i = 2, 4
        depth_max, thr = 4.0, 0.05

        # Reference-style numpy computation of the pixel error map.
        h, w = depth[ref_i].shape
        fx, fy = K[ref_i][0, 0], K[ref_i][1, 1]
        cx, cy = K[ref_i][0, 2], K[ref_i][1, 2]
        vm = (depth[ref_i] > 0) & (depth[ref_i] <= depth_max)
        vs, us = np.where(vm)
        z = depth[ref_i][vs, us]
        pts = np.stack([(us - cx) * z / fx, (vs - cy) * z / fy, z], 1)
        pw = pts @ T_cw[ref_i][:3, :3].T + T_cw[ref_i][:3, 3]
        pt = pw @ T_wc[tgt_i][:3, :3].T + T_wc[tgt_i][:3, 3]
        fxt, fyt = K[tgt_i][0, 0], K[tgt_i][1, 1]
        cxt, cyt = K[tgt_i][0, 2], K[tgt_i][1, 2]
        ok = (pt[:, 2] > 0) & (pt[:, 2] <= depth_max)
        ut = pt[:, 0] * fxt / pt[:, 2] + cxt
        vt = pt[:, 1] * fyt / pt[:, 2] + cyt
        u0 = np.floor(ut).astype(int)
        v0 = np.floor(vt).astype(int)
        inb = (u0 >= 0) & (u0 + 1 < w) & (v0 >= 0) & (v0 + 1 < h)
        ok &= inb
        u0c, v0c = np.clip(u0, 0, w - 2), np.clip(v0, 0, h - 2)
        tgt = depth[tgt_i]
        Ia, Ib = tgt[v0c, u0c], tgt[v0c, u0c + 1]
        Ic, Id = tgt[v0c + 1, u0c], tgt[v0c + 1, u0c + 1]
        taps = (
            (Ia > 0) & (Ia <= depth_max) & (Ib > 0) & (Ib <= depth_max)
            & (Ic > 0) & (Ic <= depth_max) & (Id > 0) & (Id <= depth_max)
        )
        wa = (u0c + 1 - ut) * (v0c + 1 - vt)
        wb = (ut - u0c) * (v0c + 1 - vt)
        wc = (u0c + 1 - ut) * (vt - v0c)
        wd = (ut - u0c) * (vt - v0c)
        zt = wa * Ia + wb * Ib + wc * Ic + wd * Id
        ok &= taps & (zt > 0)
        qt = np.stack([(ut - cxt) * zt / fxt, (vt - cyt) * zt / fyt, zt], 1)
        qw = qt @ T_cw[tgt_i][:3, :3].T + T_cw[tgt_i][:3, 3]
        err_ref = np.full((h, w), np.nan, np.float32)
        err_ref[vs[ok], us[ok]] = np.linalg.norm(pw[ok] - qw[ok], axis=1)

        # Our dense path, single neighbor.
        from mq3d_tpu.recon.confidence import _pair_error

        err, okm = _pair_error(
            jnp.asarray(depth[ref_i]), jnp.asarray(depth[tgt_i]),
            jnp.asarray(K[ref_i]), jnp.asarray(K[tgt_i]),
            jnp.asarray(T_cw[ref_i]), jnp.asarray(T_wc[tgt_i]),
            jnp.asarray(T_cw[tgt_i]), depth_max,
        )
        err = np.asarray(err)
        okm = np.asarray(okm)

        ref_valid = ~np.isnan(err_ref)
        # f32 (device) vs f64 (numpy transcription) flips a handful of pixels
        # right at image-boundary tap tests; demand 99.8% agreement.
        assert (okm == ref_valid).mean() > 0.998
        both = okm & ref_valid
        np.testing.assert_allclose(err[both], err_ref[both], atol=1e-4)

    def test_full_stage_writes_npz(self, scene):
        proj_dir, cfg, gt = scene
        io = DataIO(proj_dir)
        from mq3d_tpu.config.configs import DepthConfidenceEstimationConfig

        c = DepthConfidenceEstimationConfig(
            target_frame_range=2, depth_max=4.0, error_threshold=0.05,
            skip_if_output_dir_exists=False, frames_per_batch=4,
        )
        estimate_depth_confidences(io.depth, c)
        ds = io.depth.load_depth_dataset(Side.LEFT)
        cm = io.depth.load_confidence_map(Side.LEFT, int(ds.timestamps[0]))
        assert cm is not None
        assert cm.confidence_map.shape == (cfg.depth_height, cfg.depth_width)


class TestRaycast:
    def test_depth_matches_analytic(self, loaded):
        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        vol = TSDFVolume(
            TSDFConfig(
                voxel_size=0.04, block_resolution=16, block_count=2048,
                grid_dim=16, depth_max=4.0, trunc_voxel_multiplier=4.0,
                chunk_active_capacity=2048, integrate_tile=256,
            )
        )
        vol.integrate(depth, K, T_wc, valid)

        i = 0
        rendered = raycast_depth(
            vol, K[i], T_wc[i], int(ds.widths[i]), int(ds.heights[i]),
        )
        analytic = depth[i]
        hit = np.isfinite(rendered) & (analytic > 0) & (analytic < 3.9)
        assert hit.mean() > 0.7
        err = np.abs(rendered[hit] - analytic[hit])
        assert np.median(err) < 0.04  # within one voxel
        assert np.quantile(err, 0.9) < 0.1


class TestPyramidScales:
    """pyramid_scales trades serial march depth against static width; every
    scale set must hold the same accuracy (ops/raycast.py)."""

    @pytest.mark.slow
    @pytest.mark.parametrize("scales", [(8, 2, 1), (8, 1)])
    def test_scale_sets_match_default(self, loaded, scales):
        from mq3d_tpu.ops.raycast import raycast_depth_batch

        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        vol = TSDFVolume(
            TSDFConfig(
                voxel_size=0.04, block_resolution=16, block_count=2048,
                grid_dim=16, depth_max=4.0, trunc_voxel_multiplier=4.0,
                chunk_active_capacity=2048, integrate_tile=256,
            )
        )
        vol.integrate(depth, K, T_wc, valid)
        w, h = int(ds.widths[0]), int(ds.heights[0])
        base = raycast_depth_batch(vol, K[:1], T_wc[:1], w, h)
        alt = raycast_depth_batch(
            vol, K[:1], T_wc[:1], w, h, pyramid_scales=scales)
        m = np.isfinite(base) & np.isfinite(alt)
        assert m.mean() > 0.7
        # Same surface at sub-voxel agreement between pyramid variants.
        assert np.median(np.abs(base[m] - alt[m])) < 0.005


class TestUpsampleBilinear:
    """_upsample_bilinear must match jax.image.resize(method='linear') for
    integer factors: the renderer replaced resize because its gather
    formulation materializes an s32[..., 2] index tensor whose trailing
    dim pads 64x under TPU (8,128) tiling (ops/raycast.py)."""

    @pytest.mark.parametrize("f", [2, 4, 8])
    def test_matches_jax_image_resize(self, f):
        import jax

        from mq3d_tpu.ops.raycast import _upsample_bilinear

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 24, 16)), jnp.float32)
        got = _upsample_bilinear(_upsample_bilinear(x, f, axis=1), f, axis=2)
        want = jax.image.resize(x, (3, 24 * f, 16 * f), method="linear")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6)


class TestPyramidScaleSanitization:
    """Scale sets whose consecutive levels do not divide (f = s_prev // s
    would be 0 or a non-exact 1) must be repaired, not crash at trace time
    (ops/raycast.py)."""

    @pytest.mark.parametrize("scales", [(6, 4, 1), (4, 8), (3, 2)])
    def test_non_dividing_scales_render(self, loaded, scales):
        from mq3d_tpu.ops.raycast import raycast_depth_batch

        io, ds, depth, valid, K, T_cw, T_wc, cfg = loaded
        vol = TSDFVolume(
            TSDFConfig(
                voxel_size=0.04, block_resolution=16, block_count=2048,
                grid_dim=16, depth_max=4.0, trunc_voxel_multiplier=4.0,
                chunk_active_capacity=2048, integrate_tile=256,
            )
        )
        vol.integrate(depth, K, T_wc, valid)
        # 24 is divisible by 6, 4, 3, 2, 8 — every candidate passes the
        # frame-size filter and only the divisibility repair can save it.
        w = h = 24
        z = raycast_depth_batch(
            vol, K[:1], T_wc[:1], w, h, pyramid_scales=scales)
        assert z.shape == (1, h, w)
        assert np.isfinite(z).mean() > 0.3

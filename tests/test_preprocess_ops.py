"""YUV->RGB and depth-linearization parity tests against OpenCV / closed forms."""

import numpy as np
import pytest

from mq3d_tpu.models.camera import BaseTime, ImageFormatInfo, ImagePlaneInfo
from mq3d_tpu.ops import depth as depth_ops
from mq3d_tpu.ops import yuv as yuv_ops

cv2 = pytest.importorskip("cv2")


def make_format_info(w, h, pixel_stride_uv=1, row_pad=0):
    y_rs = w + row_pad
    if pixel_stride_uv == 1:
        uv_rs = w // 2 + row_pad
        planes = [
            ImagePlaneInfo(buffer_size=y_rs * h, row_stride=y_rs, pixel_stride=1),
            ImagePlaneInfo(buffer_size=uv_rs * (h // 2), row_stride=uv_rs, pixel_stride=1),
            ImagePlaneInfo(buffer_size=uv_rs * (h // 2), row_stride=uv_rs, pixel_stride=1),
        ]
    else:
        uv_rs = w + row_pad
        planes = [
            ImagePlaneInfo(buffer_size=y_rs * h, row_stride=y_rs, pixel_stride=1),
            ImagePlaneInfo(buffer_size=uv_rs * (h // 2), row_stride=uv_rs, pixel_stride=2),
            ImagePlaneInfo(buffer_size=uv_rs * (h // 2), row_stride=uv_rs, pixel_stride=2),
        ]
    return ImageFormatInfo(
        width=w, height=h, format="YUV_420_888", planes=planes,
        base_time=BaseTime(0, 0),
    )


def make_raw_buffer(rng, fmt: ImageFormatInfo, pixel_stride_uv=1, uv_order="NV12"):
    """Synthesize a strided YUV420_888 buffer + the ground-truth planes."""
    w, h = fmt.width, fmt.height
    cw, ch = w // 2, h // 2
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (ch, cw), dtype=np.uint8)

    y_rs = fmt.planes[0].row_stride
    buf = [np.zeros((h, y_rs), np.uint8)]
    buf[0][:, :w] = y
    if pixel_stride_uv == 1:
        uv_rs = fmt.planes[1].row_stride
        bu = np.zeros((ch, uv_rs), np.uint8)
        bu[:, :cw] = u
        bv = np.zeros((ch, uv_rs), np.uint8)
        bv[:, :cw] = v
        buf += [bu, bv]
    else:
        uv_rs = fmt.planes[1].row_stride
        inter = np.zeros((ch, uv_rs), np.uint8)
        if uv_order == "NV12":
            inter[:, 0 : 2 * cw : 2] = u
            inter[:, 1 : 2 * cw : 2] = v
        else:
            inter[:, 0 : 2 * cw : 2] = v
            inter[:, 1 : 2 * cw : 2] = u
        buf += [inter]
    raw = np.concatenate([b.ravel() for b in buf])
    return raw.tobytes(), (y, u, v)


class TestYuv:
    @pytest.mark.parametrize("pixel_stride_uv,row_pad", [(1, 0), (1, 16), (2, 0), (2, 8)])
    def test_destride_matches_truth(self, rng, pixel_stride_uv, row_pad):
        fmt = make_format_info(64, 48, pixel_stride_uv, row_pad)
        raw, (y, u, v) = make_raw_buffer(rng, fmt, pixel_stride_uv)
        y2, u2, v2 = yuv_ops.split_yuv420_planes(raw, fmt)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(u2, u)
        np.testing.assert_array_equal(v2, v)

    def test_color_conversion_bit_exact_with_cv2(self, rng):
        fmt = make_format_info(64, 48)
        raw, (y, u, v) = make_raw_buffer(rng, fmt)
        ours = yuv_ops.convert_yuv420_888_to_bgr(raw, fmt)
        i420 = yuv_ops.assemble_i420(y, u, v)
        ref = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)
        np.testing.assert_array_equal(ours, ref)

    def test_batched_conversion(self, rng):
        fmt = make_format_info(32, 32)
        raws, refs = [], []
        for _ in range(4):
            raw, (y, u, v) = make_raw_buffer(rng, fmt)
            raws.append(raw)
            refs.append(cv2.cvtColor(yuv_ops.assemble_i420(y, u, v), cv2.COLOR_YUV2BGR_I420))
        out = yuv_ops.convert_yuv_batch(raws, fmt)
        np.testing.assert_array_equal(out, np.stack(refs))

    def test_gray_matches_cv2(self, rng):
        # cv2 5.x's SIMD gray path rounds ties inconsistently with every
        # documented formula; gray only feeds thresholded filters, so +-1 is
        # inconsequential. Assert max deviation of 1 gray level.
        bgr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        ours = np.asarray(yuv_ops.bgr_to_gray(bgr)).astype(int)
        ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(int)
        assert np.abs(ours - ref).max() <= 1

    def test_laplacian_variance_matches_cv2(self, rng):
        gray = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        ours = float(np.asarray(yuv_ops.laplacian_variance(gray)))
        ref = cv2.Laplacian(gray, cv2.CV_64F).var()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_exposure_filter_matches_reference_formula(self, rng):
        gray = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).ravel()
        hist = hist / hist.sum()
        cum = np.cumsum(hist)
        expected = cum[5] > 0.02 or cum[250] < 0.02
        ours = bool(yuv_ops.is_over_or_under_exposed(gray))
        assert ours == expected


class TestDepth:
    def test_linear_params_finite_far(self):
        x, y = depth_ops.ndc_to_linear_params(0.1, 5.0)
        np.testing.assert_allclose(float(x), -2 * 5.0 * 0.1 / 4.9)
        np.testing.assert_allclose(float(y), -(5.1) / 4.9)

    def test_linear_params_infinite_far(self):
        x, y = depth_ops.ndc_to_linear_params(0.1, np.inf)
        assert float(x) == -0.2 and float(y) == -1.0

    def test_roundtrip_projection(self):
        """Project true metric depths into NDC, convert back, expect identity."""
        near, far = 0.1, 5.0
        z = np.linspace(near, far, 100)
        # Forward: reversed-NDC mapping used by the Quest depth sensor:
        # d = (x / z - y + 1) / 2 by inverting the reference's backward map.
        x, y = depth_ops.ndc_to_linear_params(near, far)
        d = ((np.asarray(x) / -z) - np.asarray(y) + 1.0) / 2.0
        # Note: the backward map is z = x / (2d - 1 + y); invert accordingly:
        d = ((np.asarray(x) / z) - np.asarray(y) + 1.0) / 2.0
        back = depth_ops.convert_depth_to_linear(d, near, far)
        np.testing.assert_allclose(back, z, rtol=1e-5)

    def test_zero_denominator_maps_to_zero(self):
        # far = inf gives y = -1 exactly, so d = 1.0 makes the denominator
        # 2d - 1 + y exactly zero in float; the guard must map it to 0.
        out = depth_ops.convert_depth_to_linear(np.array([1.0]), 0.1, np.inf)
        assert out[0] == 0.0

    def test_validity_check(self):
        assert not depth_ops.is_depth_map_valid(np.zeros((4, 4), np.float32))
        assert not depth_ops.is_depth_map_valid(np.ones((4, 4), np.float32))
        bad = np.full((4, 4), 0.5, np.float32)
        bad[0, 0] = np.nan
        assert not depth_ops.is_depth_map_valid(bad)
        ok = np.full((4, 4), 0.5, np.float32)
        ok[0, 0] = 0.7
        assert depth_ops.is_depth_map_valid(ok)

    def test_png_values(self):
        d = np.array([0.0, 0.1, 2.55, 5.0, 99.0])
        out = np.asarray(depth_ops.linear_depth_to_png_values(d, 0.1, 5.0))
        assert out[0] == 0.0 and out[1] == 0.0 and out[3] == 255.0 and out[4] == 255.0


class TestPallasYuv:
    def test_pallas_kernel_matches_xla(self, rng):
        """Pallas I420 kernel (interpret mode on CPU) is bit-exact with the
        XLA path, including pad/crop handling of non-tile-aligned frames."""
        from mq3d_tpu.ops.yuv_pallas import yuv420_to_bgr_pallas
        from mq3d_tpu.ops.yuv import yuv420_to_8uc3

        for h, w in [(64, 256), (48, 96)]:
            y = rng.integers(0, 256, (h, w), np.uint8)
            u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
            v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
            got = yuv420_to_bgr_pallas(y, u, v, interpret=True)
            ref = np.asarray(yuv420_to_8uc3(y[None], u[None], v[None]))[0]
            np.testing.assert_array_equal(got, ref)


class TestNdcDepthFuzz:
    """Edge-case fuzz for the NDC -> linear conversion (reference
    depth_utils.py:21-47): infinite far plane, inverted planes,
    zero-denominator bands, full [0,1] sweep — conversion must never emit
    nan/inf and must invert the forward projection on valid rows."""

    def _forward_ndc(self, z, near, far):
        """Metric z -> reversed NDC via the same projection model."""
        if np.isinf(far):
            x, y = -2.0 * near, -1.0
        else:
            x, y = -2.0 * far * near / (far - near), -(far + near) / (far - near)
        return ((x / z) - y + 1.0) / 2.0

    def test_roundtrip_finite_far(self, rng):
        from mq3d_tpu.ops.depth import convert_depth_to_linear

        near, far = 0.1, 50.0
        z = rng.uniform(near, far * 0.99, (64, 64)).astype(np.float64)
        d = self._forward_ndc(z, near, far)
        z_back = convert_depth_to_linear(d, near, far)
        np.testing.assert_allclose(z_back, z, rtol=2e-4)

    def test_roundtrip_infinite_far(self, rng):
        from mq3d_tpu.ops.depth import convert_depth_to_linear

        near = 0.1
        z = rng.uniform(near, 100.0, (64, 64))
        d = self._forward_ndc(z, near, np.inf)
        z_back = convert_depth_to_linear(d, near, np.inf)
        np.testing.assert_allclose(z_back, z, rtol=2e-3)

    def test_no_nan_inf_on_full_sweep(self):
        from mq3d_tpu.ops.depth import convert_depth_to_linear

        d = np.linspace(-0.5, 1.5, 4001)  # includes out-of-range buffers
        for near, far in ((0.1, 50.0), (0.1, np.inf), (0.5, 0.2),
                          (0.1, 0.1)):
            out = convert_depth_to_linear(d, near, far)
            assert np.isfinite(out).all(), (near, far)

    def test_zero_denominator_band_is_zeroed(self):
        from mq3d_tpu.ops.depth import to_linear_depth

        # Exact-zero denominator (binary-exact values): 2*0.75 - 1 - 0.5
        # == 0 -> the reference zeroes the output rather than dividing.
        out = to_linear_depth(np.asarray([0.75]), -2.0, -0.5)
        assert out[0] == 0.0

    def test_degenerate_planes_use_infinite_model(self):
        from mq3d_tpu.ops.depth import ndc_to_linear_params

        # far < near AND far == near (which divides by zero in the
        # reference) fall back to the infinite-far model.
        for far in (0.2, 0.5):
            x1, y1 = ndc_to_linear_params(0.5, far)
            x2, y2 = ndc_to_linear_params(0.5, np.inf)
            assert x1 == x2 and y1 == y2

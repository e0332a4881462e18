"""Preprocessing stages: YUV->RGB and depth->linear directory conversion.

Re-design of the reference's per-frame process pools (reference:
scripts/processing/yuv_conversion/convert_yuv_dir.py:15-105,
scripts/processing/depth_conversion/convert_depth_to_linear.py:9-47):
frames stack into batches and convert in one device launch; blur/exposure
filters evaluate on the batch.
"""

from __future__ import annotations

import shutil

import numpy as np
from tqdm import tqdm

from mq3d_tpu.config.configs import Depth2LinearConfig, Yuv2RgbConfig
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.dataio.image_io import ImageDataIO
from mq3d_tpu.models.side import Side
from mq3d_tpu.ops.depth import linear_depth_to_png_values
from mq3d_tpu.ops.yuv import (
    bgr_to_gray,
    convert_yuv_batch,
    is_blur_image,
    is_over_or_under_exposed,
)

YUV_BATCH = 16


def convert_yuv_directory(image_io: ImageDataIO, config: Yuv2RgbConfig):
    """Both sides: batched YUV420_888 -> BGR -> PNG, with optional blur /
    exposure filtering; removes the raw YUV dir on clean success."""
    for side in Side:
        timestamps = image_io.get_yuv_timestamps(side)
        if not timestamps:
            continue
        fmt = image_io.load_image_format_info(side)

        processed = excluded = failed = 0
        for s in tqdm(
            range(0, len(timestamps), YUV_BATCH),
            desc=f"Converting YUV to PNG ({side})",
        ):
            batch_ts = timestamps[s : s + YUV_BATCH]
            raws = []
            ok_ts = []
            for ts in batch_ts:
                try:
                    raws.append(image_io.load_yuv(side, ts))
                    ok_ts.append(ts)
                except Exception as e:
                    print(f"[Exception] Failed to read {side}/{ts}: {e}")
                    failed += 1
            if not raws:
                continue
            try:
                bgrs = convert_yuv_batch(raws, fmt)
            except Exception as e:
                print(f"[Exception] Batch conversion failed: {e}")
                failed += len(raws)
                continue

            keep = np.ones(len(ok_ts), bool)
            if config.blur_filter:
                keep &= ~np.asarray(is_blur_image(bgrs, config.blur_threshold))
            if config.exposure_filter:
                gray = bgr_to_gray(bgrs)
                keep &= ~np.asarray(
                    is_over_or_under_exposed(
                        np.asarray(gray),
                        config.exposure_threshold_low,
                        config.exposure_threshold_high,
                    )
                )
            kept_idx = np.flatnonzero(keep)
            excluded += int(len(ok_ts) - len(kept_idx))
            if len(kept_idx):
                processed += image_io.save_bgr_batch(
                    np.asarray(bgrs)[kept_idx], side,
                    [ok_ts[i] for i in kept_idx])

        print(f"[Info] {processed} images written to "
              f"{image_io.image_path_config.get_rgb_dir(side)}")
        if excluded:
            print(f"[Info] {excluded} images were excluded by filtering.")
        if failed:
            print(f"[Error] {failed} files failed due to exceptions.")

        yuv_dir = image_io.image_path_config.get_yuv_dir(side)
        if failed == 0 and yuv_dir.exists():
            try:
                shutil.rmtree(yuv_dir)
                print(f"[Info] Cleaned up raw YUV directory: {yuv_dir}")
            except Exception as e:
                print(f"[Warning] Failed to remove YUV directory {yuv_dir}: {e}")
        elif failed > 0:
            print(f"[Warning] Keeping raw YUV directory for debugging: {yuv_dir}")


def convert_depth_directory(
    depth_data_io: DepthDataIO, depth_to_linear_config: Depth2LinearConfig
):
    """Both sides: NDC depth -> metric -> 8-bit grayscale PNGs."""
    for side in Side:
        dataset = depth_data_io.load_depth_dataset(
            side=side, use_cache=depth_to_linear_config.use_cache
        )
        for i in tqdm(range(len(dataset)), desc=f"Converting depth images ({side})"):
            depth_map = depth_data_io.load_depth_map_by_index(side, dataset, i)
            if depth_map is None:
                continue
            png_vals = np.asarray(
                linear_depth_to_png_values(
                    depth_map,
                    depth_to_linear_config.clip_near_m,
                    depth_to_linear_config.clip_far_m,
                )
            )
            depth_data_io.save_linear_depth_map(
                depth_map=png_vals, side=side, timestamp=int(dataset.timestamps[i])
            )
        print(f"[Info] Converted depth images for {side} camera to linear format.")

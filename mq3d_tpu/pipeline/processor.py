"""Pipeline orchestration with idempotent stage skipping.

Re-design of the reference's PipelineProcessor (reference:
scripts/pipeline/pipeline_processor.py:10-144): same cache/skip semantics —
YUV->RGB always fills only missing frames; depth-linear skips when all PNGs
exist unless force_recompute; reconstruction caches disabled under
force_recompute.
"""

from __future__ import annotations

from pathlib import Path

from mq3d_tpu.config.configs import PipelineConfigs
from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.models.side import Side
from mq3d_tpu.pipeline.stages import convert_depth_directory, convert_yuv_directory
from mq3d_tpu.recon.reconstruct import reconstruct_scene


class PipelineProcessor:
    def __init__(
        self,
        project_dir: Path,
        config_yml_path: Path,
        force_recompute: bool = False,
    ):
        self.data_io = DataIO(project_dir=project_dir)
        self.pipeline_configs = PipelineConfigs.parse_config_yml(config_yml_path)
        self.project_dir = project_dir
        self.force_recompute = force_recompute

    def convert_yuv_to_rgb(self):
        all_rgb_exist = True
        missing = 0
        total_yuv = 0
        for side in Side:
            yuv_ts = set(self.data_io.color.get_yuv_timestamps(side))
            total_yuv += len(yuv_ts)
            rgb_dir = self.data_io.color.image_path_config.get_rgb_dir(side)
            if not rgb_dir.exists():
                all_rgb_exist = False
                missing += len(yuv_ts)
                continue
            rgb_ts = set(self.data_io.color.get_rgb_timestamps(side))
            m = yuv_ts - rgb_ts
            if m:
                all_rgb_exist = False
                missing += len(m)

        if all_rgb_exist and total_yuv > 0:
            print("[Info] All RGB images already exist. Skipping YUV to RGB conversion.")
            return
        if total_yuv == 0:
            print("[Info] No YUV images found. Skipping conversion.")
            return
        if missing:
            print(f"[Info] Found {missing} missing RGB images. Converting YUV to RGB...")
        convert_yuv_directory(
            image_io=self.data_io.color, config=self.pipeline_configs.yuv_to_rgb
        )

    def convert_depth_to_linear(self):
        if not self.force_recompute:
            all_exist = True
            missing = 0
            total = 0
            for side in Side:
                ds = self.data_io.depth.load_depth_dataset(side=side, use_cache=True)
                depth_ts = set(int(t) for t in ds.timestamps.tolist())
                total += len(depth_ts)
                linear_ts = set(self.data_io.depth.get_linear_depth_timestamps(side))
                m = depth_ts - linear_ts
                if m:
                    all_exist = False
                    missing += len(m)
            if all_exist and total > 0:
                print("[Info] All linear depth images exist. Skipping conversion.")
                return
            if total == 0:
                print("[Info] No depth frames found. Skipping conversion.")
                return
            if missing:
                print(f"[Info] Found {missing} missing linear depth images.")
        else:
            self.pipeline_configs.depth_to_linear.use_cache = False

        convert_depth_directory(
            depth_data_io=self.data_io.depth,
            depth_to_linear_config=self.pipeline_configs.depth_to_linear,
        )

    def reconstruct_scene(self):
        if self.force_recompute:
            rc = self.pipeline_configs.reconstruction
            rc.use_dataset_cache = False
            rc.use_fragment_dataset_cache = False
            rc.use_optimized_dataset_cache = False
            rc.use_colorless_vbg_cache = False
        reconstruct_scene(
            data_io=self.data_io, config=self.pipeline_configs.reconstruction
        )

    def run_full_pipeline(self):
        print("\n" + "=" * 80)
        print("Running Full Pipeline")
        print("=" * 80)
        print("\n[Step 1/3] Converting YUV to RGB...")
        self.convert_yuv_to_rgb()
        print("\n[Step 2/3] Converting depth to linear...")
        self.convert_depth_to_linear()
        print("\n[Step 3/3] Reconstructing scene...")
        self.reconstruct_scene()
        print("\n" + "=" * 80)
        print("Pipeline Complete!")
        print("=" * 80)

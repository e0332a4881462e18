"""Cache-or-compute driver for the two-level depth pose optimization
(reference: scripts/processing/reconstruction/depth_optimization/
depth_pose_optimizer.py:14-101)."""

from __future__ import annotations

from typing import Dict, List

from mq3d_tpu.config.configs import ReconstructionConfig
from mq3d_tpu.dataio.depth_io import DepthDataIO
from mq3d_tpu.dataio.recon_io import ReconstructionDataIO
from mq3d_tpu.models.datasets import DepthDataset
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem
from mq3d_tpu.recon.fragments import make_fragment_datasets
from mq3d_tpu.recon.refine import refine_fragment_poses
from mq3d_tpu.utils.log import log_step, substep


def merge_fragment_datasets(
    frag_dataset_map: Dict[Side, List[DepthDataset]]
) -> Dict[Side, DepthDataset]:
    return {
        side: DepthDataset.merge(frags) for side, frags in frag_dataset_map.items()
    }


class DepthPoseOptimizer:
    def __init__(
        self,
        depth_data_io: DepthDataIO,
        recon_data_io: ReconstructionDataIO,
        config: ReconstructionConfig,
    ):
        self.depth_data_io = depth_data_io
        self.recon_data_io = recon_data_io
        self.config = config

    def __call__(self) -> Dict[Side, DepthDataset]:
        return self.load_or_optimize_dataset()

    def load_or_make_fragment_datasets(self) -> Dict[Side, List[DepthDataset]]:
        if self.config.use_fragment_dataset_cache:
            frag_map = self.recon_data_io.load_fragment_datasets()
            if frag_map and any(len(v) > 0 for v in frag_map.values()):
                print("[Info] Fragment datasets loaded from cache.")
                for side, datasets in frag_map.items():
                    for ds in datasets:
                        if ds.transforms.coordinate_system != CoordinateSystem.OPEN3D:
                            ds.transforms = ds.transforms.convert_coordinate_system(
                                CoordinateSystem.OPEN3D
                            )
                return frag_map

        log_step("Make Fragments")
        frag_map = make_fragment_datasets(
            depth_data_io=self.depth_data_io, config=self.config.fragment_generation
        )
        print("[Info] Saving fragment datasets to cache...")
        for side, frags in frag_map.items():
            for i, frag in enumerate(frags):
                self.recon_data_io.save_fragment_dataset(frag, side, i)
        return frag_map

    def load_or_optimize_dataset(self) -> Dict[Side, DepthDataset]:
        if self.config.use_optimized_dataset_cache:
            cached: Dict[Side, DepthDataset] = {}
            for side in Side:
                ds = self.depth_data_io.load_optimized_depth_dataset(side)
                if ds is not None:
                    cached[side] = ds
            if cached:
                print("[Info] Optimized depth datasets loaded.")
                return cached

        frag_map = self.load_or_make_fragment_datasets()

        log_step("Refine Fragment poses")
        refine_fragment_poses(
            depth_data_io=self.depth_data_io,
            recon_data_io=self.recon_data_io,
            fragment_dataset_map=frag_map,
            config=self.config.fragment_pose_refinement,
        )

        with substep("save_optimized_depth_datasets"):
            optimized = merge_fragment_datasets(frag_map)
            for side, ds in optimized.items():
                self.depth_data_io.save_optimized_depth_dataset(
                    side=side, dataset=ds)
        print("[Info] Optimized depth datasets saved.")
        return optimized

#!/usr/bin/env python
"""CLI: raw NDC depth -> linear depth PNGs
(reference: scripts/convert_depth_to_linear_map.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.pipeline.processor import PipelineProcessor


def main():
    parser = argparse.ArgumentParser(description="Convert raw depth to linear PNGs")
    parser.add_argument("--project_dir", type=Path, required=True)
    parser.add_argument("--config", type=Path,
                        default=Path(__file__).resolve().parent.parent / "config/pipeline_config.yml")
    args = parser.parse_args()

    processor = PipelineProcessor(project_dir=args.project_dir, config_yml_path=args.config)
    processor.convert_depth_to_linear()


if __name__ == "__main__":
    main()

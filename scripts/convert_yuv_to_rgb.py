#!/usr/bin/env python
"""CLI: YUV -> RGB conversion (reference: scripts/convert_yuv_to_rgb.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.pipeline.processor import PipelineProcessor


def main():
    parser = argparse.ArgumentParser(description="Convert raw YUV frames to RGB PNGs")
    parser.add_argument("--project_dir", type=Path, required=True,
                        help="Capture project directory")
    parser.add_argument("--config", type=Path,
                        default=Path(__file__).resolve().parent.parent / "config/pipeline_config.yml")
    args = parser.parse_args()

    processor = PipelineProcessor(project_dir=args.project_dir, config_yml_path=args.config)
    processor.convert_yuv_to_rgb()


if __name__ == "__main__":
    main()

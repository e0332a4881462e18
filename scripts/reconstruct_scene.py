#!/usr/bin/env python
"""CLI: scene reconstruction (reference: scripts/reconstruct_scene.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.pipeline.processor import PipelineProcessor


def main():
    parser = argparse.ArgumentParser(description="Reconstruct a 3D scene from a capture")
    parser.add_argument("--project_dir", type=Path, required=True)
    parser.add_argument("--config", type=Path,
                        default=Path(__file__).resolve().parent.parent / "config/pipeline_config.yml")
    args = parser.parse_args()

    processor = PipelineProcessor(project_dir=args.project_dir, config_yml_path=args.config)
    processor.reconstruct_scene()


if __name__ == "__main__":
    main()

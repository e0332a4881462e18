#!/usr/bin/env python
"""CLI: scan for the time offset maximizing cross-modality frame overlap
(reference: analysis/processing/find_optimal_timestamp_offset.py)."""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.analysis.sessions import find_optimal_timestamp_offset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--project_dir", type=Path, required=True)
    parser.add_argument("--source", default="left_depth")
    parser.add_argument("--target", default="left_camera_rgb")
    parser.add_argument("--range_ms", type=int, default=500)
    parser.add_argument("--step_ms", type=int, default=5)
    parser.add_argument("--tolerance_ms", type=int, default=17)
    args = parser.parse_args()

    result = find_optimal_timestamp_offset(
        args.project_dir, args.source, args.target,
        offsets_ms=np.arange(-args.range_ms, args.range_ms + 1, args.step_ms),
        tolerance_ms=args.tolerance_ms,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()

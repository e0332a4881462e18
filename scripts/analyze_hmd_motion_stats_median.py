#!/usr/bin/env python
"""Median-emphasis variant of the HMD motion analysis (reference:
analysis/analysis/analyze_hmd_motion_stats_median.py — identical pipeline
to the mean-based script with median-headline reporting).  Thin alias for
`analyze_hmd_motion_stats.py --median`."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.analyze_hmd_motion_stats import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:] + ["--median"])

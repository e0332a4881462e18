#!/usr/bin/env python
"""CLI: per-modality frame counts / durations + discrepancy report
(reference: analysis/processing/analyze_recording_lengths.py and
analyze_duration_discrepancy.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.analysis.sessions import (
    analyze_duration_discrepancy,
    analyze_recording_lengths,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sessions", type=Path, nargs="+")
    args = parser.parse_args()

    for session in args.sessions:
        print(f"\n=== {session} ===")
        for m in analyze_recording_lengths(session):
            dur = f"{m.duration_ms} ms" if m.duration_ms is not None else "-"
            print(f"  {m.name:28s} frames={m.n_frames:6d} duration={dur}")
        disc = analyze_duration_discrepancy(session)
        print(f"  max duration discrepancy: {disc['max_discrepancy_ms']:.0f} ms")


if __name__ == "__main__":
    main()

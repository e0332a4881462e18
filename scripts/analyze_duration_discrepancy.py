#!/usr/bin/env python
"""CLI: per-session modality duration discrepancy report
(reference: analysis/processing/analyze_duration_discrepancy.py — there a
hardcoded-session debugging aid reading recording_length_report.csv; here
the durations compute directly from the session directories).

Usage: python scripts/analyze_duration_discrepancy.py SESSION [SESSION...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.analysis.sessions import (  # noqa: E402
    analyze_duration_discrepancy,
    analyze_recording_lengths,
)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Analyze duration discrepancies between modalities")
    ap.add_argument("sessions", type=Path, nargs="+")
    args = ap.parse_args(argv)

    for session in args.sessions:
        print("\n" + "=" * 80)
        print(f"Analysis for: {session}")
        print("=" * 80)
        lengths = analyze_recording_lengths(session)
        print("\nIndividual Modality Durations:")
        for m in lengths:
            dur = (f"{m.duration_ms / 1000.0:.2f}s"
                   if m.duration_ms is not None else "N/A")
            print(f"  {m.name:28s} {dur}")
        disc = analyze_duration_discrepancy(session)
        print(f"\nMax duration discrepancy: "
              f"{disc['max_discrepancy_ms'] / 1000.0:.2f}s")
        if disc["max_discrepancy_ms"] > 2000:
            print("  [Warning] modalities differ by more than 2 s — check "
                  "recording synchronization (trim_recordings.py can align "
                  "them)")


if __name__ == "__main__":
    main()

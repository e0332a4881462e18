#!/usr/bin/env python
"""CLI: trim capture sessions consistently across modalities
(reference: analysis/processing/trim_recordings.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.analysis.sessions import trim_recording


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sessions", type=Path, nargs="+")
    parser.add_argument("--max-duration-ms", type=int, default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    for session in args.sessions:
        removed = trim_recording(
            session, max_duration_ms=args.max_duration_ms,
            max_frames=args.max_frames, dry_run=args.dry_run,
        )
        tag = "[dry-run] " if args.dry_run else ""
        total = sum(removed.values())
        print(f"{tag}{session}: removed {total} frames "
              + ", ".join(f"{k}:{v}" for k, v in removed.items()))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CLI: apply a millisecond offset to frame filenames
(reference: analysis/processing/rename_timestamps.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.analysis.sessions import rename_timestamps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--project_dir", type=Path, required=True)
    parser.add_argument("--offset_ms", type=int, required=True)
    parser.add_argument("--modalities", nargs="*", default=None,
                        help="directory names; default: all frame modalities")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    n = rename_timestamps(
        args.project_dir, args.offset_ms, args.modalities, dry_run=args.dry_run
    )
    print(f"{'[dry-run] ' if args.dry_run else ''}renamed {n} files by "
          f"{args.offset_ms:+d} ms")


if __name__ == "__main__":
    main()

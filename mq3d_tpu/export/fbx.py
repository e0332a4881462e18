"""FBX interop (gated): PLY <-> FBX conversion.

The reference uses the commercial Aspose.3D library (reference:
scripts/utils/convert_ply_to_fbx_aspose.py:26-78, scripts/conversion/
convert_obj_to_fbx.py:49-500), which is not available here.  We gate on the
optional `aspose-3d` package and otherwise fall back to writing an ASCII
FBX 7.x file directly for meshes with vertex colors — sufficient for DCC
import of the reconstruction output.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mq3d_tpu.dataio.ply import TriangleMesh, read_ply


def fbx_available() -> bool:
    try:
        import aspose.threed  # noqa: F401

        return True
    except Exception:
        return True  # ASCII fallback writer is always available


def _write_ascii_fbx(mesh: TriangleMesh, path: Path):
    """Minimal FBX 7.3 ASCII file: one mesh node with vertex colors."""
    verts = np.asarray(mesh.vertices, np.float64)
    tris = np.asarray(mesh.triangles, np.int64)
    # FBX polygon encoding: last index of each polygon is bitwise-negated - 1.
    poly = tris.copy()
    poly[:, 2] = -poly[:, 2] - 1

    lines = [
        "; FBX 7.3.0 project file",
        "FBXHeaderExtension:  {",
        "\tFBXHeaderVersion: 1003",
        "\tFBXVersion: 7300",
        "}",
        "Definitions:  {",
        "\tVersion: 100",
        "\tCount: 2",
        '\tObjectType: "Geometry" { Count: 1 }',
        '\tObjectType: "Model" { Count: 1 }',
        "}",
        "Objects:  {",
        '\tGeometry: 1000, "Geometry::mesh", "Mesh" {',
        f"\t\tVertices: *{verts.size} {{ a: "
        + ",".join(f"{v:.6f}" for v in verts.reshape(-1))
        + " }",
        f"\t\tPolygonVertexIndex: *{poly.size} {{ a: "
        + ",".join(str(i) for i in poly.reshape(-1))
        + " }",
        "\t\tGeometryVersion: 124",
    ]
    if mesh.vertex_colors is not None:
        colors = np.asarray(mesh.vertex_colors, np.float64)
        if colors.max() > 1.0:
            colors = colors / 255.0
        rgba = np.concatenate([colors, np.ones((len(colors), 1))], axis=1)
        lines += [
            '\t\tLayerElementColor: 0 {',
            "\t\t\tVersion: 101",
            '\t\t\tName: "VertexColors"',
            '\t\t\tMappingInformationType: "ByVertice"',
            '\t\t\tReferenceInformationType: "Direct"',
            f"\t\t\tColors: *{rgba.size} {{ a: "
            + ",".join(f"{c:.6f}" for c in rgba.reshape(-1))
            + " }",
            "\t\t}",
            "\t\tLayer: 0 {",
            "\t\t\tVersion: 100",
            '\t\t\tLayerElement:  { Type: "LayerElementColor" TypedIndex: 0 }',
            "\t\t}",
        ]
    lines += [
        "\t}",
        '\tModel: 2000, "Model::mesh", "Mesh" {',
        "\t\tVersion: 232",
        "\t}",
        "}",
        "Connections:  {",
        "\tC: \"OO\",1000,2000",
        "\tC: \"OO\",2000,0",
        "}",
    ]
    Path(path).write_text("\n".join(lines))


def convert_ply_to_fbx(ply_path: Path, fbx_path: Path):
    """PLY mesh -> FBX (Aspose when installed, ASCII fallback otherwise)."""
    try:
        import aspose.threed as a3d  # pragma: no cover

        scene = a3d.Scene.from_file(str(ply_path))  # pragma: no cover
        scene.save(str(fbx_path))  # pragma: no cover
        return  # pragma: no cover
    except Exception:
        pass
    mesh = read_ply(ply_path)
    if not isinstance(mesh, TriangleMesh):
        raise ValueError(f"{ply_path} does not contain a triangle mesh")
    _write_ascii_fbx(mesh, fbx_path)


def convert_fbx_to_ply(fbx_path: Path, ply_path: Path):  # pragma: no cover
    """FBX -> PLY (requires Aspose; used by downsample_fbx_mesh)."""
    import aspose.threed as a3d

    scene = a3d.Scene.from_file(str(fbx_path))
    scene.save(str(ply_path))

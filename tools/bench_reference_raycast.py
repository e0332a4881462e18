#!/usr/bin/env python
"""Measure the CPU reference baseline for color-aligned depth raycasting.

The reference renders depth by Embree CPU rays over the extracted mesh
(reference o3d_utils.py:324-341).  Embree is not installable in this image,
so native/ref_raycast_cpu.cpp provides a well-optimized binned-SAH BVH ray
tracer (Moeller-Trumbore, ordered traversal, row-block threading) measured
on the same workload: the bench volume's extracted mesh rendered at
1280x960.  bench.py's BASELINE_RAYCAST_MS derives from this number.

Usage: JAX_PLATFORMS=cpu python tools/bench_reference_raycast.py [n_frames]
"""

import ctypes
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from tools.bench_raycast import build_volume, W_C, H_C  # noqa: E402


def load_lib():
    src = Path("native/ref_raycast_cpu.cpp")
    so = Path("/tmp/libref_raycast_cpu.so")
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-pthread", "-shared", "-fPIC",
             str(src), "-o", str(so)],
            check=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.rc_build.restype = ctypes.c_void_p
    lib.rc_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.rc_free.argtypes = [ctypes.c_void_p]
    lib.rc_render.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    vol, gt, cfg_s = build_volume()

    from mq3d_tpu.testing.synthetic import intrinsics_from_cfg, render_box_depth

    print("extracting mesh (host path) ...", flush=True)
    mesh = vol.extract_triangle_mesh(3.0, device=False)
    verts = np.ascontiguousarray(mesh.vertices, np.float32)
    tris = np.ascontiguousarray(mesh.triangles, np.int32)
    print(f"mesh: {len(verts)} verts, {len(tris)} tris", flush=True)

    lib = load_lib()
    t0 = time.perf_counter()
    scene = lib.rc_build(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris),
    )
    print(f"BVH build: {time.perf_counter() - t0:.2f}s", flush=True)

    fx, fy, cx, cy = intrinsics_from_cfg(cfg_s, W_C, H_C)
    cxf = W_C - cx
    K = np.array([[fx, 0, cxf], [0, fy, cy], [0, 0, 1]], np.float32)

    out = np.empty((H_C, W_C), np.float32)
    times = []
    d = None
    for i in range(n_frames):
        T_cw = np.ascontiguousarray(
            gt.extrinsics_cw[i % len(gt.extrinsics_cw)], dtype=np.float32)
        t0 = time.perf_counter()
        lib.rc_render(
            scene, np.ascontiguousarray(K).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            T_cw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            W_C, H_C, 100.0, 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        times.append(time.perf_counter() - t0)
        d = out.copy()
    ms = np.asarray(times) * 1e3
    print(f"per-frame: median {np.median(ms):.0f} ms  min {ms.min():.0f} ms  "
          f"max {ms.max():.0f} ms  ({W_C}x{H_C}, "
          f"{len(tris)} tris)")

    ref = render_box_depth(
        gt.extrinsics_cw[(n_frames - 1) % len(gt.extrinsics_cw)],
        fx, fy, cxf, cy, W_C, H_C,
        np.asarray(cfg_s.box_min), np.asarray(cfg_s.box_max))
    m = np.isfinite(d) & np.isfinite(ref)
    err = np.abs(d[m] - ref[m])
    print(f"accuracy vs analytic: median {np.median(err) * 1000:.2f} mm  "
          f"p95 {np.percentile(err, 95) * 1000:.2f} mm  "
          f"coverage {m.mean() * 100:.1f}%")
    lib.rc_free(scene)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the CPU reference baseline bound for bench.py.

Open3D is not installable in this image, so the baseline is measured from
native/ref_tsdf_cpu.cpp — a well-optimized C++ transcription of the exact
allocate-then-integrate loop the reference runs through Open3D's CPU
VoxelBlockGrid (o3d_utils.py:153-238) — on the SAME synthetic workload as
bench.py's TSDF metric (320x288 depth, voxel 1 cm, trunc 10x, 50k blocks).

Prints measured single-core frames/s plus the derived multi-core bound
(documented scaling assumption), and cross-checks the C++ volume against
ops/tsdf.py for semantic parity (same touched-voxel update rule).

Usage: python tools/bench_reference_cpu.py [n_frames]
"""

import ctypes
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

# The reference user machine is a desktop/workstation CPU; this bench host
# exposes ONE vCPU.  Derive the multi-core bound as measured single-core
# throughput x 16 cores x 0.8 parallel efficiency (generous to the
# reference: Open3D's TBB block-parallel integrate scales near-linearly
# until memory bound).
ASSUMED_CORES = 16
ASSUMED_PAR_EFF = 0.8


def build_lib() -> ctypes.CDLL:
    src = Path(__file__).resolve().parent.parent / "native/ref_tsdf_cpu.cpp"
    out = Path("/tmp/libref_tsdf_cpu.so")
    if (not out.exists()
            or out.stat().st_mtime < src.stat().st_mtime):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", str(src), "-o", str(out)]
        subprocess.run(cmd, check=True)
    return ctypes.CDLL(str(out))


def run(lib, depth, K, T_wc, voxel=0.01, trunc_mult=10.0, depth_max=4.0,
        block_res=16, max_blocks=50_000, alloc_stride=2):
    n, H, W = depth.shape
    r3 = block_res ** 3
    tsdf = np.zeros((max_blocks, r3), np.float32)
    weight = np.zeros((max_blocks, r3), np.float32)
    n_blocks = ctypes.c_int(0)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.ref_tsdf_integrate.restype = ctypes.c_int
    t0 = time.perf_counter()
    lib.ref_tsdf_integrate(
        depth.ctypes.data_as(f32p), n, H, W,
        np.ascontiguousarray(K, np.float32).ctypes.data_as(f32p),
        np.ascontiguousarray(T_wc, np.float32).ctypes.data_as(f32p),
        ctypes.c_float(voxel), ctypes.c_float(voxel * trunc_mult),
        ctypes.c_float(depth_max), block_res, max_blocks, alloc_stride,
        tsdf.ctypes.data_as(f32p), weight.ctypes.data_as(f32p),
        ctypes.byref(n_blocks),
    )
    dt = time.perf_counter() - t0
    return dt, int(n_blocks.value), tsdf, weight


def parity_check(depth, K, T_wc, tsdf_cpp, weight_cpp, n_blocks):
    """Total observation counts must match the TPU kernel on the same
    frames (update rules are identical; block sets may order differently)."""
    from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume

    cfg = TSDFConfig()
    vol = TSDFVolume(cfg)
    vol.integrate(depth, K, T_wc)
    w_tpu = float(np.asarray(vol.state.weight.sum()))
    w_cpp = float(weight_cpp.sum())
    rel = abs(w_tpu - w_cpp) / max(w_tpu, 1.0)
    print(f"[parity] total obs: cpp {w_cpp:.0f} vs tpu {w_tpu:.0f} "
          f"(rel diff {rel:.2%})")
    return rel


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    lib = build_lib()
    print(f"[info] OpenMP threads: {lib.ref_tsdf_num_threads()}")

    import bench

    depth, K, T_wc, valid, gt, cfg = bench.make_capture()
    depth, K, T_wc = depth[:n_frames], K[:n_frames], T_wc[:n_frames]

    # Warm run (page in) then timed run.
    run(lib, depth[:10], K[:10], T_wc[:10])
    dt, n_blocks, tsdf, weight = run(lib, depth, K, T_wc)
    fps = n_frames / dt
    bound = fps * ASSUMED_CORES * ASSUMED_PAR_EFF
    print(f"[measured] C++ single-core: {fps:.2f} frames/s "
          f"({dt / n_frames * 1e3:.1f} ms/frame, {n_blocks} blocks)")
    print(f"[derived]  {ASSUMED_CORES}-core x {ASSUMED_PAR_EFF} eff bound: "
          f"{bound:.1f} frames/s")
    print(f"[provenance] measured single-core C++ on this host x documented "
          f"scaling assumption (tools/bench_reference_cpu.py)")

    if "--parity" in sys.argv:
        k = 20
        _, _, t20, w20 = run(lib, depth[:k], K[:k], T_wc[:k])
        rel = parity_check(depth[:k], K[:k], T_wc[:k], t20, w20, n_blocks)
        assert rel < 0.02, "C++ baseline diverges from the TPU kernel"


if __name__ == "__main__":
    main()

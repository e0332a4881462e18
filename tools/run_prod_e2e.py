#!/usr/bin/env python
"""Production-scale end-to-end run with honest substep accounting.

Reproduces the round-3 north-star measurement (BASELINE.md "Round-3
production-scale end-to-end run") under round-5 conventions: fresh
process, full default pipeline (`config/pipeline_config.yml` — the
reference's default stage set, reconstruct_scene.py:24-46), synthetic
500-frames-per-side capture at Quest scale (320x288 depth, 640x480
color), MQ3D_SUBSTEP_TIMING=1 so every [Substep] line lands in the log.

All stage timings are wall-clock (time.perf_counter around the stage
calls in the pipeline), which is honest by construction; intra-stage
device probes force data-dependent scalar fetches since round 4
(utils/host.py fetch_int — block_until_ready does not block through this
image's tunneled runtime).

Usage: python tools/run_prod_e2e.py [--project /tmp/prod_e2e] [--keep]
The capture generation time is reported separately and excluded from the
pipeline number (the reference starts from an on-disk capture too).
"""

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MQ3D_SUBSTEP_TIMING", "1")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", default="/tmp/prod_e2e")
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing generated capture")
    args = ap.parse_args(argv)

    from mq3d_tpu.testing.synthetic import (
        SyntheticSceneConfig, write_synthetic_project)

    proj = Path(args.project)
    cfg = SyntheticSceneConfig(
        n_frames=args.frames,
        depth_width=320, depth_height=288,
        color_width=640, color_height=480,
        sweep=2 * 3.141592653589793,
    )
    if not (args.keep and proj.exists()):
        shutil.rmtree(proj, ignore_errors=True)
        t0 = time.perf_counter()
        write_synthetic_project(proj, cfg)
        print(f"[prod-e2e] capture generated in {time.perf_counter()-t0:.1f} s "
              f"({args.frames} frames/side)", flush=True)

    import scripts.run_full_pipeline as rfp

    t0 = time.perf_counter()
    rfp.main(["--session_dir", str(proj),
              "--config", "config/pipeline_config.yml"])
    wall = time.perf_counter() - t0
    print(f"[prod-e2e] pipeline wall-clock: {wall:.1f} s", flush=True)
    rt = proj / "pipeline_runtime.txt"
    if rt.exists():
        print(rt.read_text())


if __name__ == "__main__":
    main()

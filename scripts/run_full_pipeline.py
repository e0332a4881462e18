#!/usr/bin/env python
"""CLI: full pipeline for one capture session with runtime accounting
(reference: scripts/run_full_pipeline.py:23-345).

Steps: session auto-selection by timestamped directory name, YUV->RGB,
depth->linear, scene reconstruction (in-process — no subprocess isolation
needed; everything is one JAX process), optional PLY->FBX conversion, and a
pipeline_runtime.txt summary with seconds-per-capture.
"""

import argparse
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.models.side import Side
from mq3d_tpu.pipeline.processor import PipelineProcessor

SESSION_RE = re.compile(r"^\d{8}_\d{6}$")


def find_latest_session(base_dir: Path) -> Path:
    """Newest session dir named YYYYMMDD_HHMMSS (reference :23-29)."""
    candidates = [
        d for d in base_dir.iterdir() if d.is_dir() and SESSION_RE.match(d.name)
    ]
    if not candidates:
        raise FileNotFoundError(f"No session directories under {base_dir}")
    return max(candidates, key=lambda d: d.stat().st_mtime)


def convert_reconstruction_mesh_to_fbx(project_dir: Path) -> bool:
    from mq3d_tpu.export.fbx import convert_ply_to_fbx, fbx_available

    mesh_path = project_dir / "reconstruction/color_mesh.ply"
    if not mesh_path.exists():
        print("[Warning] No colored mesh to convert to FBX.")
        return False
    if not fbx_available():
        print("[Info] FBX backend unavailable; skipping PLY->FBX conversion.")
        return False
    out = mesh_path.with_suffix(".fbx")
    convert_ply_to_fbx(mesh_path, out)
    print(f"[Info] FBX written to {out}")
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run the full reconstruction pipeline")
    parser.add_argument("--session_dir", type=Path, default=None,
                        help="capture session directory")
    parser.add_argument("--base_dir", type=Path, default=None,
                        help="auto-select the newest session under this directory")
    parser.add_argument("--config", type=Path,
                        default=Path(__file__).resolve().parent.parent / "config/pipeline_config.yml")
    parser.add_argument("--no-cache", action="store_true",
                        help="force recomputation of all cached artifacts")
    parser.add_argument("--export-fbx", action="store_true")
    parser.add_argument("--profile", type=Path, default=None,
                        help="capture a jax.profiler trace into this directory")
    args = parser.parse_args(argv)

    if args.session_dir is not None:
        session = args.session_dir
    elif args.base_dir is not None:
        session = find_latest_session(args.base_dir)
        print(f"[Info] Auto-selected session: {session}")
    else:
        parser.error("Provide --session_dir or --base_dir")

    from mq3d_tpu.utils.log import StageTimer

    profiler_active = False
    if args.profile is not None:
        import jax

        args.profile.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(args.profile))
        profiler_active = True

    t0 = time.time()
    timer = StageTimer()
    processor = PipelineProcessor(
        project_dir=session, config_yml_path=args.config,
        force_recompute=args.no_cache,
    )
    with timer.stage("convert_yuv_to_rgb"):
        processor.convert_yuv_to_rgb()
    with timer.stage("convert_depth_to_linear"):
        processor.convert_depth_to_linear()
    with timer.stage("reconstruct_scene"):
        processor.reconstruct_scene()

    if args.export_fbx:
        with timer.stage("export_fbx"):
            convert_reconstruction_mesh_to_fbx(session)

    if profiler_active:
        import jax

        jax.profiler.stop_trace()
        print(f"[Info] Profiler trace written to {args.profile}")

    elapsed = time.time() - t0
    # Subtract viewer time like the reference's "[VIS] *_VIEW_SECONDS:"
    # stdout parsing (reference run_full_pipeline.py:96,278,314); our step 3
    # runs in-process, so the emitted total is read back directly.
    from mq3d_tpu.recon import reconstruct as _recon_mod

    view_seconds = float(getattr(_recon_mod, "LAST_VIEW_SECONDS", 0.0))
    adjusted = max(0.0, elapsed - view_seconds)
    frame_counts = [
        len(processor.data_io.color.get_rgb_timestamps(side)) for side in Side
    ]
    captures = max(max(frame_counts), 1)
    summary = (
        f"total_runtime_seconds: {elapsed:.1f}\n"
        f"adjusted_runtime_seconds: {adjusted:.1f}\n"
        f"captures: {captures}\n"
        f"seconds_per_capture: {adjusted / captures:.3f}\n"
        "per_stage_seconds:\n"
        + "".join(f"  {name}: {dt:.1f}\n" for name, dt in timer.records)
    )
    (session / "pipeline_runtime.txt").write_text(summary)
    print("\n" + summary)


if __name__ == "__main__":
    main()

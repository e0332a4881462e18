#!/usr/bin/env python
"""CLI: run the full pipeline over many capture sessions
(reference: scripts/batch_run_full_pipeline.py:28-230).

Discovers session directories under one or more base dirs, runs each through
run_full_pipeline.py as a subprocess (per-session failure isolation), and
prints a failure roll-up.
"""

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SESSION_RE = re.compile(r"^\d{8}_\d{6}$")


def discover_project_dirs(base_dirs):
    sessions = []
    for base in base_dirs:
        base = Path(base)
        if not base.is_dir():
            print(f"[Warning] Base dir does not exist: {base}")
            continue
        for d in sorted(base.iterdir()):
            if d.is_dir() and SESSION_RE.match(d.name):
                sessions.append(d)
    return sessions


def run_single_project(session: Path, config: Path, reuse_cache: bool) -> bool:
    cmd = [
        sys.executable, "-u",
        str(Path(__file__).resolve().parent / "run_full_pipeline.py"),
        "--session_dir", str(session),
        "--config", str(config),
    ]
    if not reuse_cache:
        cmd.append("--no-cache")
    t0 = time.time()
    result = subprocess.run(cmd)
    print(f"[Info] Session {session.name} finished in {time.time() - t0:.1f}s "
          f"(exit {result.returncode})")
    return result.returncode == 0


def main():
    parser = argparse.ArgumentParser(description="Batch-run the full pipeline")
    parser.add_argument("--base-dirs", type=Path, nargs="+", required=True)
    parser.add_argument("--config", type=Path,
                        default=Path(__file__).resolve().parent.parent / "config/pipeline_config.yml")
    parser.add_argument("--reuse-cache", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--n-hosts", type=int, default=None,
                        help="Shard the session batch over this many hosts "
                             "(DCN axis); default: jax.distributed topology "
                             "or single-host")
    parser.add_argument("--host-id", type=int, default=None,
                        help="This host's index in [0, n_hosts)")
    args = parser.parse_args()

    sessions = discover_project_dirs(args.base_dirs)
    print(f"[Info] Discovered {len(sessions)} session(s).")
    if args.dry_run:
        for s in sessions:
            print(f"  would run: {s}")
        return

    if args.n_hosts is not None or args.host_id is not None:
        # Multi-host mode: sessions round-robin over hosts, per-session
        # subprocess isolation kept, status roll-up over DCN when live
        # (mq3d_tpu/parallel/multihost.py).
        from mq3d_tpu.parallel.multihost import batch_sessions_multihost

        status = batch_sessions_multihost(
            sessions, config=args.config,
            host_id=args.host_id, n_hosts=args.n_hosts,
            reuse_cache=args.reuse_cache,
        )
        if (status == 0).any():
            sys.exit(1)
        return

    failures = []
    for session in sessions:
        print("\n" + "=" * 70)
        print(f"= Session: {session}")
        print("=" * 70)
        try:
            ok = run_single_project(session, args.config, args.reuse_cache)
        except Exception as e:
            print(f"[Error] Session {session.name} raised: {e}")
            ok = False
        if not ok:
            failures.append(session)

    print("\n" + "=" * 70)
    print(f"Batch complete: {len(sessions) - len(failures)}/{len(sessions)} succeeded")
    for f in failures:
        print(f"  FAILED: {f}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()

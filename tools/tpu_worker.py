#!/usr/bin/env python
"""Persistent TPU job worker for interactive perf work on the tunneled chip.

The axon tunnel imposes a ~10-15 min cooldown on every fresh process's
first device contact, so iterative kernel experiments are driven through
ONE long-lived process: drop a python file into /tmp/tpu_jobs/NN.py and the
worker execs it in a shared namespace (state like built volumes persists
between jobs), writing stdout+stderr+traceback to NN.out.  Edited repo
modules can be importlib.reload-ed inside a job.

Usage: nohup python -u tools/tpu_worker.py > /tmp/tpu_worker.log 2>&1 &
"""

import contextlib
import io
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, ".")

JOBS = Path("/tmp/tpu_jobs")
JOBS.mkdir(exist_ok=True)


def main():
    ns: dict = {}
    # The tunnel refuses fresh clients for up to ~15 min after an unclean
    # disconnect, and backend init can HANG indefinitely while the terminal
    # is wedged — probe in a killable subprocess and only init in-process
    # once a probe succeeds.
    import subprocess

    print("[worker] probing device ...", flush=True)
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=600, check=True, capture_output=True,
            )
            break
        except Exception as e:
            print(f"[worker] probe {attempt} failed ({type(e).__name__}); "
                  "retrying in 120 s", flush=True)
            time.sleep(120)
    print("[worker] probe ok; connecting ...", flush=True)
    import jax

    print(f"[worker] ready: {jax.devices()}", flush=True)
    while True:
        for f in sorted(JOBS.glob("*.py")):
            out = f.with_suffix(".out")
            code = f.read_text()
            f.unlink()
            print(f"[worker] running {f.name}", flush=True)

            class _Tee(io.TextIOBase):
                """Buffer + live-stream to NN.live so long jobs are
                observable while they run."""

                def __init__(self, live_path):
                    self.buf = io.StringIO()
                    self.live = open(live_path, "w")

                def write(self, s):
                    self.buf.write(s)
                    self.live.write(s)
                    self.live.flush()
                    return len(s)

            tee = _Tee(f.with_suffix(".live"))
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(tee), \
                    contextlib.redirect_stderr(tee):
                try:
                    exec(compile(code, f.name, "exec"), ns)
                except BaseException:
                    traceback.print_exc()
            tee.live.close()
            out.write_text(
                tee.buf.getvalue()
                + f"\n[job done in {time.perf_counter() - t0:.1f}s]\n"
            )
            print(f"[worker] {f.name} done", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Tiny TPU tunnel health check that NEVER needs an external kill.

Exits 0 with "HEALTHY <ms>" if a trivial jitted program round-trips a
data-dependent scalar within the deadline; otherwise faulthandler dumps
and the process exits (releasing the tunnel cleanly by process exit, not
a signal — see TODO.md "Known environment issue").
"""

import faulthandler
import sys
import time

sys.path.insert(0, ".")

DEADLINE = int(sys.argv[1]) if len(sys.argv) > 1 else 120
faulthandler.dump_traceback_later(DEADLINE, exit=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.float32)
    y = (x @ x).sum()
    val = float(jax.device_get(y))
    dt = (time.perf_counter() - t0) * 1e3
    assert val == 256.0 * 256 * 256, val
    print(f"HEALTHY {dt:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

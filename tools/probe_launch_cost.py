#!/usr/bin/env python
"""Isolate the tunneled runtime's per-launch penalty on large programs.

Run one VARIANT per fresh process (the penalty's trigger is
process-history-dependent):

  trivial-big        jnp.zeros init (exec #1) + donated x+1 on 1.6 GB x8
  trivial-big-only   device_put init (no exec) + donated x+1 on 1.6 GB x8
  trivial-big-nodonate  same as trivial-big but without donation
  trivial-small      jnp.zeros init + donated x+1 on 16 MB x8
  two-exec           tiny jitted g first, then trivial-big x8

Each timing fetches a data-dependent scalar (block_until_ready does not
block through this tunnel).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

GB = 1 << 30


def main():
    variant = sys.argv[1]
    import jax
    import jax.numpy as jnp

    from mq3d_tpu.utils.host import fetch_float

    n_words = (4 * GB) // 16 if False else (int(1.6 * GB)) // 4
    small_words = (16 << 20) // 4

    def run(f, x, n=8, tag=""):
        x = f(x)
        fetch_float(x.ravel()[-1])
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        fetch_float(x.ravel()[-1])
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.3f}s total, {dt/n:.3f}s/launch", flush=True)
        return x

    donate = dict(donate_argnums=(0,))

    if variant == "trivial-big":
        x = jnp.zeros((n_words,), jnp.float32)  # exec 1
        f = jax.jit(lambda x: x + 1.0, **donate)
        run(f, x, tag="big donated x+1 after zeros-exec")
    elif variant == "trivial-big-only":
        x = jax.device_put(np.zeros((n_words,), np.float32))
        print("device_put done", flush=True)
        f = jax.jit(lambda x: x + 1.0, **donate)
        run(f, x, tag="big donated x+1, only executable")
    elif variant == "trivial-big-nodonate":
        x = jnp.zeros((n_words,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        run(f, x, tag="big UNdonated x+1 after zeros-exec")
    elif variant == "trivial-small":
        x = jnp.zeros((small_words,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0, **donate)
        run(f, x, tag="small donated x+1 after zeros-exec")
    elif variant == "two-exec":
        g = jax.jit(lambda a: a * 2.0)
        fetch_float(g(jnp.float32(3.0)))
        x = jnp.zeros((n_words,), jnp.float32)
        f = jax.jit(lambda x: x + 1.0, **donate)
        run(f, x, tag="big donated x+1 after tiny exec + zeros")
    else:
        raise SystemExit(f"unknown variant {variant}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe the specific access patterns of the current raycaster."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(f, *args, n=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
N = 1 << 19  # rays per chunk in the current kernel
CAP, R3 = 50_001, 4096

tab2d = jnp.asarray(rng.random((CAP, R3), dtype=np.float32))
slots = jnp.asarray(rng.integers(0, CAP, N).astype(np.int32))
lis = jnp.asarray(rng.integers(0, R3, N).astype(np.int32))


@jax.jit
def g2d(tab, s, l):
    return tab[s, l]


@jax.jit
def g1d(tab, s, l):
    return tab.reshape(-1)[s * R3 + l]


dt = timeit(g2d, tab2d, slots, lis)
print(f"2-D advanced indexing tab[s, l]: {dt * 1e3:8.2f} ms")
dt = timeit(g1d, tab2d, slots, lis)
print(f"flat tab.reshape(-1)[s*R3+l]:  {dt * 1e3:8.2f} ms")

# 8-corner trilinear like _sample_packed (2-D indexing x8 + slot_table)
G3 = 160 ** 3
slot_table = jnp.asarray(rng.integers(-1, CAP, G3).astype(jnp.int32))
keys = jnp.asarray(rng.integers(0, G3, N).astype(np.int32))


@jax.jit
def trilinear_like(tab, st, keys, lis):
    acc = jnp.zeros(N, jnp.float32)
    for c in range(8):
        k = jnp.minimum(keys + c, G3 - 1)
        s = st[k]
        t = tab[jnp.where(s >= 0, s, CAP - 1), lis]
        acc += t
    return acc


dt = timeit(trilinear_like, tab2d, slot_table, keys, lis)
print(f"8x (slot_table + 2-D gather):  {dt * 1e3:8.2f} ms")

# while_loop with 60 iterations of 1 flat gather + arithmetic (march-like)
flat = tab2d.reshape(-1)


@jax.jit
def march_like(flat, st, keys0):
    def cond(c):
        k, acc, it = c
        return (it < 60) & jnp.any(acc < 1e9)

    def body(c):
        k, acc, it = c
        s = st[k]
        v = flat[jnp.where(s >= 0, s, CAP - 1) * R3 + (k % R3)]
        acc = acc + v
        k = jnp.minimum(k + jnp.int32(7), G3 - 1)
        return (k, acc, it + 1)

    k, acc, it = jax.lax.while_loop(cond, body, (keys0, jnp.zeros(N), jnp.int32(0)))
    return acc


dt = timeit(march_like, flat, slot_table, keys)
print(f"while_loop 60x (slot+flat gather): {dt * 1e3:8.2f} ms  "
      f"({dt / 60 * 1e3:.3f} ms/iter)")

# fori_loop variant (no dynamic cond)
@jax.jit
def march_fori(flat, st, keys0):
    def body(i, c):
        k, acc = c
        s = st[k]
        v = flat[jnp.where(s >= 0, s, CAP - 1) * R3 + (k % R3)]
        return (jnp.minimum(k + 7, G3 - 1), acc + v)

    k, acc = jax.lax.fori_loop(0, 60, body, (keys0, jnp.zeros(N)))
    return acc


dt = timeit(march_fori, flat, slot_table, keys)
print(f"fori_loop 60x (slot+flat gather):  {dt * 1e3:8.2f} ms  "
      f"({dt / 60 * 1e3:.3f} ms/iter)")

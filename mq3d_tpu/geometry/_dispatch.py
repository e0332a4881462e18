"""Array-namespace dispatch: numpy on host arrays, jax.numpy under jit.

Geometry primitives are needed both inside TPU kernels (traced by jax) and
on tiny host-side pose tables where eager-JAX dispatch overhead dominates.
Every function in geometry/ picks its namespace from its inputs, so a single
implementation serves both worlds.
"""

from __future__ import annotations

import numpy as np


def get_namespace(*arrays):
    for a in arrays:
        if type(a).__module__.split(".")[0] in ("jax", "jaxlib"):
            import jax.numpy as jnp

            return jnp
    return np

"""Device -> host value fetches.

The installed TPU plugin's single-element literal path (what `int(x)` /
`float(x)` / `np.asarray(x)` hit for device scalars) stalls in a retry loop
(~2 s per retry, up to minutes per fetch); `jax.device_get` transfers
instantly.  Route every scalar readback through here.
"""

from __future__ import annotations


def fetch(x):
    """Bring a device value to host (fast path for scalars and pytrees).

    block_until_ready first: the plugin's wait-inside-transfer path for
    not-yet-ready scalars polls with ~2 s backoff."""
    import jax

    jax.block_until_ready(x)
    return jax.device_get(x)


def fetch_int(x) -> int:
    return int(fetch(x))


def fetch_float(x) -> float:
    return float(fetch(x))

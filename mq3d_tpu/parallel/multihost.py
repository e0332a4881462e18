"""Multi-host batch-of-sessions driver: the DCN scaling axis.

SURVEY §5 names two distribution axes for this workload: frames/pairs over
ICI within a host (parallel/sharded.py) and *capture sessions* over hosts,
where only tiny status/metadata traffic crosses the (slow) DCN.  Sessions
are embarrassingly parallel — the reference runs them serially through one
subprocess per session (reference: scripts/batch_run_full_pipeline.py:28-230)
— so the TPU-native design keeps each session's whole pipeline resident on
one host's chip(s) and uses DCN only for:

  * deterministic work assignment (pure function of (n_sessions, n_hosts),
    no coordinator);
  * the end-of-batch per-session status roll-up (one small all-gather).

Per-session failure isolation is preserved: each session still runs in its
own subprocess; a crash marks that session failed and the batch continues.

Host topology resolution order: explicit (host_id, n_hosts) args >
jax.distributed (process_index/process_count) > single host.  The roll-up
uses multihost_utils.process_allgather when several processes are live;
`dryrun_batch_multihost` validates the same collective program shape on a
virtual n-device CPU mesh (devices standing in for hosts), matching how
__graft_entry__.dryrun_multichip validates the ICI paths.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

_STATUS_NOT_MINE = -1  # session assigned to another host
_STATUS_FAILED = 0
_STATUS_OK = 1


def resolve_host_topology(
    host_id: Optional[int] = None, n_hosts: Optional[int] = None
) -> Tuple[int, int]:
    """(host_id, n_hosts) from explicit args, else jax.distributed, else
    (0, 1)."""
    if host_id is not None or n_hosts is not None:
        hid, n = int(host_id or 0), int(n_hosts or 1)
        # A lone --host-id would make this host skip sessions that no other
        # host runs (assign_sessions strides by n_hosts=1 starting at hid)
        # and still report success — reject instead of silently dropping.
        if not 0 <= hid < n:
            raise ValueError(
                f"host_id={hid} out of range for n_hosts={n}; pass both "
                "--host-id and --n-hosts with 0 <= host_id < n_hosts")
        return hid, n
    try:
        import jax

        return int(jax.process_index()), int(jax.process_count())
    except Exception:
        return 0, 1


def assign_sessions(n_sessions: int, n_hosts: int, host_id: int) -> List[int]:
    """Strided round-robin: session i -> host i % n_hosts.  Deterministic on
    every host with no communication, and balanced when session costs are
    i.i.d. (consecutive captures correlate in length, so striding beats
    contiguous blocks)."""
    return list(range(host_id, n_sessions, n_hosts))


def _default_runner(session: Path, config: Optional[Path],
                    reuse_cache: bool = False) -> bool:
    """One session through run_full_pipeline.py in its own subprocess
    (failure isolation identical to the single-host batch driver)."""
    cmd = [
        sys.executable, "-u",
        str(Path(__file__).resolve().parents[2]
            / "scripts/run_full_pipeline.py"),
        "--session_dir", str(session),
    ]
    if config is not None:
        cmd += ["--config", str(config)]
    if not reuse_cache:
        cmd.append("--no-cache")
    t0 = time.time()
    result = subprocess.run(cmd)
    print(f"[Info] Session {Path(session).name} finished in "
          f"{time.time() - t0:.1f}s (exit {result.returncode})")
    return result.returncode == 0


def rollup_statuses(local_status: np.ndarray, n_hosts: int) -> np.ndarray:
    """Merge per-host (n_sessions,) status vectors into the global one.

    Each host fills only its own sessions (others are _STATUS_NOT_MINE);
    the merge is an elementwise max, which is what rides DCN: with live
    jax.distributed processes this is one process_allgather of an
    int32 vector (bytes, not tensors); single-process it is the identity.
    """
    if n_hosts <= 1:
        return local_status
    try:
        import jax

        if jax.process_count() == n_hosts:
            from jax.experimental import multihost_utils

            gathered = np.asarray(
                multihost_utils.process_allgather(local_status)
            )  # (n_hosts, n_sessions)
            return gathered.max(axis=0)
    except Exception as e:  # pragma: no cover - no multi-process here
        print(f"[Warning] DCN roll-up unavailable ({e}); "
              "statuses cover the local shard only")
    return local_status


def batch_sessions_multihost(
    session_dirs: Sequence[Path],
    config: Optional[Path] = None,
    host_id: Optional[int] = None,
    n_hosts: Optional[int] = None,
    reuse_cache: bool = False,
    runner: Optional[Callable[[Path], bool]] = None,
) -> np.ndarray:
    """Run a batch of sessions sharded over hosts; returns the merged
    (n_sessions,) status vector (1 ok, 0 failed, -1 unassigned/remote when
    no DCN transport is live) and prints the failure roll-up."""
    host_id, n_hosts = resolve_host_topology(host_id, n_hosts)
    session_dirs = [Path(s) for s in session_dirs]
    mine = assign_sessions(len(session_dirs), n_hosts, host_id)
    print(f"[Info] Host {host_id}/{n_hosts}: {len(mine)} of "
          f"{len(session_dirs)} session(s) assigned")

    run = runner if runner is not None else (
        lambda s: _default_runner(s, config, reuse_cache)
    )
    status = np.full(len(session_dirs), _STATUS_NOT_MINE, np.int32)
    for i in mine:
        ok = False
        try:
            ok = bool(run(session_dirs[i]))
        except Exception as e:  # noqa: BLE001 - per-session isolation
            print(f"[Warning] Session {session_dirs[i].name} raised: {e}")
        status[i] = _STATUS_OK if ok else _STATUS_FAILED

    status = rollup_statuses(status, n_hosts)
    failed = [session_dirs[i].name for i in np.nonzero(status == 0)[0]]
    n_known = int((status >= 0).sum())
    print(f"[Info] Batch complete: {int((status == 1).sum())}/{n_known} "
          "session(s) succeeded")
    if failed:
        print("[Warning] Failed sessions:")
        for name in failed:
            print(f"  - {name}")
    return status


def dryrun_batch_multihost(n_hosts: int, n_sessions: int = 7) -> np.ndarray:
    """Validate the multi-host batch program on a virtual mesh.

    Devices stand in for hosts: per-host status shards live sharded over an
    ("hosts",) mesh axis and merge with an all_gather+max inside shard_map
    — the same collective shape the DCN roll-up compiles to — then every
    "host" checks it sees the identical global vector.  One session is
    forced to fail to exercise the roll-up path.  Called by
    __graft_entry__.dryrun_multichip alongside the ICI dryruns.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    devices = np.asarray(jax.devices()[:n_hosts])
    assert devices.size == n_hosts, (
        f"need {n_hosts} devices, have {len(jax.devices())}"
    )
    mesh = Mesh(devices, axis_names=("hosts",))

    # Per-host local status vectors, computed independently per shard: a
    # tiny jitted "pipeline step" stands in for the real per-session run.
    def local_fill(host_ids):
        # host_ids: (1,) int32 shard — this host's index.
        hid = host_ids[0]
        sess = jnp.arange(n_sessions, dtype=jnp.int32)
        mine = (sess % n_hosts) == hid
        ok = jnp.where(sess == 1, _STATUS_FAILED, _STATUS_OK)  # session 1 fails
        return jnp.where(mine, ok, _STATUS_NOT_MINE)[None, :]

    def rollup(local):
        # local: (1, n_sessions) shard -> all_gather over hosts, max-merge.
        g = jax.lax.all_gather(local[0], "hosts")  # (n_hosts, n_sessions)
        return jnp.max(g, axis=0)[None, :]

    fn = shard_map(
        lambda h: rollup(local_fill(h)),
        mesh=mesh,
        in_specs=P("hosts"),
        out_specs=P("hosts", None),
    )
    host_ids = jax.device_put(
        np.arange(n_hosts, dtype=np.int32),
        NamedSharding(mesh, P("hosts")),
    )
    out = np.asarray(jax.jit(fn)(host_ids))  # (n_hosts, n_sessions)

    expect = np.full(n_sessions, _STATUS_OK, np.int32)
    expect[1] = _STATUS_FAILED
    for h in range(n_hosts):
        np.testing.assert_array_equal(out[h], expect)
    assert (out >= 0).all(), "roll-up left unassigned sessions"
    print(f"[dryrun_batch_multihost] ok: {n_sessions} sessions over "
          f"{n_hosts} hosts, failure roll-up merged on every host")
    return out[0]

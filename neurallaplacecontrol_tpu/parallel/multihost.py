"""Multi-host orchestration over DCN.

The reference's outer experiment grid fans out over a local process pool
(run_exp_multi.py:103-165). On a TPU pod slice the equivalent is
single-controller multi-host JAX: every host runs the same program,
`jax.distributed.initialize` wires the hosts over DCN, compute shards over
the global device mesh on ICI, and the embarrassingly-parallel outer grid
(seeds, tasks) splits by process index — no inter-host communication beyond
what XLA's collectives need (SURVEY.md §2.4/§5).

Single-host processes (the common case, and all tests) pass through these
helpers unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               auto: bool = False) -> None:
    """Wire up multi-host JAX.

    MUST run before any other JAX call (anything that touches a backend —
    including jax.process_count()/jax.devices() — makes distributed
    initialization impossible, so this function deliberately performs no
    probing). ``auto=True`` lets jax auto-detect the cluster (Cloud TPU /
    SLURM environments); with no arguments and auto=False this is a no-op
    for plain single-host runs. Idempotent: an 'already initialized' state
    is tolerated."""
    if not auto and coordinator_address is None and num_processes is None:
        return  # single host, nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def process_slice(items: Sequence, process_id: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """This host's share of an embarrassingly-parallel work list (seed grid,
    task grid) — the DCN replacement for the reference's Pool fan-out.
    Round-robin so uneven lists stay balanced."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % n == pid]


def barrier(name: str, timeout_s: float = 3600.0) -> None:
    """Cross-host barrier over the jax.distributed coordination service.

    Prefer this to ``multihost_utils.sync_global_devices`` for RUNTIME
    synchronization (e.g. "all processes finished their grid cells"): the
    latter runs a device collective, whose CPU backend (gloo) performs its
    one-time context handshake with a ~30 s connect timeout — any real skew
    between hosts (one still training while another is done) kills it. The
    coordination-service barrier is pure DCN RPC with an explicit timeout
    and involves no device computation. Single-process runs: no-op."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed  # the service jax.distributed started

    client = distributed.global_state.client
    assert client is not None, "barrier() requires initialize() first"
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def global_mesh(axis_names=("dp",), shape: Optional[tuple] = None):
    """A mesh over ALL devices of all hosts (ICI within a host/slice, DCN
    across). Default is one flat data-parallel axis; pass ``shape`` to
    factor it (e.g. (n_hosts, devices_per_host) for ("dp", "tp"))."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n = len(jax.devices())
    shape = shape or (n,)
    assert int(np.prod(shape)) == n, (shape, n)
    devices = mesh_utils.create_device_mesh(shape)
    return Mesh(devices, axis_names=axis_names[: len(shape)])

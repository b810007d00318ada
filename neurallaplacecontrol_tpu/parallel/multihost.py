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

import socket
import time
from typing import Optional, Sequence

import jax
import numpy as np

# Recorded by initialize() so barrier() can rendezvous out-of-band on
# coordinator_port + 1 without reaching into jax's private coordination
# client (jax._src broke without deprecation once already).
_coordinator_address: Optional[str] = None


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
    global _coordinator_address
    if not auto and coordinator_address is None and num_processes is None:
        return  # single host, nothing to do
    _coordinator_address = coordinator_address
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


def barrier(name: str, timeout_s: float = 3600.0,
            coordinator_address: Optional[str] = None) -> None:
    """Cross-host rendezvous barrier on ``coordinator_port + 1``.

    Prefer this to ``multihost_utils.sync_global_devices`` for RUNTIME
    synchronization (e.g. "all processes finished their grid cells"): the
    latter runs a device collective, whose CPU backend (gloo) performs its
    one-time context handshake with a ~30 s connect timeout — any real skew
    between hosts (one still training while another is done) kills it.
    jax's own coordination-service barrier would fit but is only reachable
    through ``jax._src`` (no public accessor as of jax 0.9), so this is a
    ~40-line TCP rendezvous instead: process 0 listens on the coordinator
    host's ``port + 1`` (it already runs the coordinator service on
    ``port``), every other process connects, sends ``name``, and blocks
    until process 0 has heard from all N-1 peers and acks. Mismatched
    barrier names fail loudly — they mean the hosts' control flow diverged.
    Single-process runs: no-op. ``coordinator_address`` defaults to the one
    ``initialize()`` recorded."""
    n = jax.process_count()
    if n == 1:
        return
    addr = coordinator_address or _coordinator_address
    assert addr is not None, "barrier() requires initialize() first"
    host, _, port = addr.rpartition(":")
    bport = int(port) + 1
    deadline = time.monotonic() + timeout_s
    tag = f"{name}\n".encode()
    if jax.process_index() == 0:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        try:
            srv.bind(("", bport))
            srv.listen(n - 1)
            conns = []
            for _ in range(n - 1):
                srv.settimeout(max(0.1, deadline - time.monotonic()))
                conn, _ = srv.accept()
                conn.settimeout(max(0.1, deadline - time.monotonic()))
                got = conn.makefile("rb").readline()
                assert got == tag, (
                    f"barrier name mismatch: waiting at {name!r}, a peer "
                    f"sent {got!r} — host control flow diverged"
                )
                conns.append(conn)
            for conn in conns:  # everyone arrived: release all at once
                conn.sendall(tag)
                conn.close()
        except socket.timeout:
            raise TimeoutError(
                f"barrier {name!r}: only {len(conns)}/{n - 1} peers arrived "
                f"within {timeout_s:.0f}s"
            ) from None
        finally:
            srv.close()
    else:
        while True:  # process 0 may not be listening yet — retry to deadline
            try:
                conn = socket.create_connection(
                    (host, bport), timeout=max(0.1, deadline - time.monotonic())
                )
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"barrier {name!r}: could not reach process 0 at "
                        f"{host}:{bport} within {timeout_s:.0f}s"
                    ) from None
                time.sleep(0.5)
        try:
            conn.settimeout(max(0.1, deadline - time.monotonic()))
            conn.sendall(tag)
            got = conn.makefile("rb").readline()
            if got != tag:
                raise TimeoutError(
                    f"barrier {name!r}: process 0 closed without ack "
                    f"(got {got!r}) — it likely timed out waiting for "
                    "another peer"
                )
        except socket.timeout:
            raise TimeoutError(
                f"barrier {name!r}: no ack from process 0 within "
                f"{timeout_s:.0f}s"
            ) from None
        finally:
            conn.close()


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

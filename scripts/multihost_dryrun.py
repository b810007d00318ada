"""Two-process jax.distributed dryrun of the DCN grid fan-out.

VERDICT r2 item 6: parallel/multihost.py was code without a witness — the
initialize/grid-split helpers had only single-process tests. This script IS
the witness: run it once per process (a coordinator and a worker on one
machine, CPU backend) and each process

1. wires up the cluster through ``multihost.initialize`` (real
   ``jax.distributed`` coordination service over TCP, the same path a TPU
   pod slice uses over DCN),
2. takes its share of a seed grid via ``multihost.process_slice`` — the
   reference's Pool fan-out (run_exp_multi.py:103-165) as process-indexed
   slicing,
3. runs a tiny jitted eval per owned seed,
4. cross-checks the OTHER process's results with
   ``multihost_utils.process_allgather`` (a real DCN collective), and
5. writes a JSON record that tests/test_multihost.py asserts merges into
   the full grid.

Usage (what the test runs, one line per process):
    python scripts/multihost_dryrun.py --pid 0 --nprocs 2 --port 12345 --out DIR
    python scripts/multihost_dryrun.py --pid 1 --nprocs 2 --port 12345 --out DIR
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GRID_SEEDS = [0, 1, 2, 3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    import jax

    # the shell profile overrides the JAX_PLATFORMS env var on this image;
    # the config update must land before any backend touch (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    from neurallaplacecontrol_tpu.parallel import multihost

    # initialize MUST precede any backend-touching call — multihost.py:29-35
    multihost.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nprocs, jax.process_count()
    assert jax.process_index() == args.pid

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    # 2. this process's share of the embarrassingly-parallel seed grid
    share = multihost.process_slice(GRID_SEEDS)
    assert share, "every process must own part of the grid"

    # 3. one tiny jitted eval per owned seed (stand-in for a grid cell)
    @jax.jit
    def cell(seed):
        key = jax.random.PRNGKey(seed)
        return jnp.sum(jax.random.normal(key, (8,)) ** 2)

    local = {int(s): float(cell(s)) for s in share}

    # 4. DCN collective: every process gathers every process's partial sum
    partial = jnp.asarray([sum(local.values())], dtype=jnp.float32)
    gathered = multihost_utils.process_allgather(partial)
    assert gathered.shape[0] == args.nprocs, gathered.shape
    global_total = float(gathered.sum())

    # 4b. the out-of-band TCP rendezvous barrier (multihost.barrier) — the
    # same call the driver makes before its shard merge
    multihost.barrier("dryrun_done", timeout_s=120)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"proc{args.pid}.json").write_text(json.dumps({
        "pid": args.pid,
        "nprocs": args.nprocs,
        "share": sorted(local),
        "local_results": local,
        "local_total": float(partial[0]),
        "global_total": global_total,
    }))
    print(f"proc {args.pid}: share={sorted(local)} global_total={global_total:.4f}")


if __name__ == "__main__":
    main()

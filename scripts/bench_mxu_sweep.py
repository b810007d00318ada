"""MXU saturation sweep: NL forward throughput + MFU vs model width/dtype.

Answers the question the headline bench raises: bench.py reports ~11% MFU at
the reference operating point (hidden=128, K=1000, T=40 — w_nl.py:86-97 +
config.py:52-53 shapes), which is dispatch/latency-bound, NOT kernel-bound.
This sweep holds the workload structure fixed (a chain of SEQUENTIALLY
dependent NL forwards, like the planner's horizon rollout) and widens the
model until the matmuls dominate, measuring how close the compute stack gets
to the chip's peak. If MFU climbs toward peak with width, the kernels are
speed-of-light and the reference shape is simply too small to fill the MXU;
if it plateaus low, the stack leaves performance on the table.

Sequential dependency is enforced by feeding each forward's output back into
the next query's state AND rolling the action buffer with an action derived
from that state, exactly the dependency structure of an MPPI horizon rollout
— so this measures deployable latency, not embarrassingly-parallel
throughput. The buffer roll matters for the accounting, not just realism: a
loop-invariant buffer lets XLA hoist the entire GRU encoder (the
FLOP-dominant block at large widths) out of the scan, and the sweep then
reports impossible >100% MFU because the FLOP model still charges for it
(observed before this fix).

Run on the real chip (takes ~60-120 s compile per new shape):
    python scripts/bench_mxu_sweep.py [--widths 128,256,512,1024]
        [--dtypes float32,bfloat16] [--batch 8192] [--chain 50] [--reps 10]
        [--json artifacts/bench_mxu_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import count_params, make_model  # noqa: E402

V5E_PEAK_BF16_FLOPS = 1.97e14  # one v5e chip, public spec
V5E_PEAK_F32_FLOPS = V5E_PEAK_BF16_FLOPS / 2.0  # f32 runs the MXU at half rate


def measure_one(env_name, hidden, dtype, batch, chain, reps):
    config = Config(nl_hidden_units=hidden, nl_compute_dtype=dtype)
    spec = make_env(env_name, dt=config.dt).spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))

    obs0 = jax.random.normal(jax.random.PRNGKey(1), (batch, spec.n_obs), jnp.float32)
    buf = jax.random.normal(
        jax.random.PRNGKey(2), (batch, config.action_buffer_size, spec.m), jnp.float32
    )
    ts = jnp.full((batch, 1), config.dt, jnp.float32)

    # FLOPs per single forward from XLA's own cost model (counts the fused
    # elementwise ops too); per-sample so the chain arithmetic is explicit
    cost = jax.jit(model.apply).lower(params, obs0, buf, ts).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops_per_batched_forward = float(cost["flops"])

    @jax.jit
    def chained(obs, buf):
        def step(carry, _):
            o, b = carry
            # sequential dependency: next query's state is this step's
            # output (tanh keeps the iterate bounded over a 50-long chain),
            # and the action window rolls forward with a state-derived
            # action — nothing is loop-invariant, so XLA cannot hoist the
            # GRU out of the scan (planner-faithful; see module docstring)
            o = jnp.tanh(o + model.apply(params, o, b, ts))
            b = jnp.roll(b, -1, axis=1).at[:, -1, :].set(
                jnp.tanh(o[:, : b.shape[-1]])
            )
            return (o, b), ()

        (o, b), _ = jax.lax.scan(step, (obs, buf), None, length=chain)
        return o, b

    out, bout = chained(obs0, buf)
    out.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out, bout = chained(out, bout)
    out.block_until_ready()
    elapsed = (time.perf_counter() - t0) / reps
    per_forward_us = elapsed / chain * 1e6
    achieved_flops = flops_per_batched_forward * chain / elapsed
    peak = V5E_PEAK_BF16_FLOPS if dtype == "bfloat16" else V5E_PEAK_F32_FLOPS
    return {
        "hidden": hidden,
        "dtype": dtype,
        "batch": batch,
        "params": int(count_params(params)),
        "flops_per_forward": flops_per_batched_forward / batch,
        "per_forward_us": round(per_forward_us, 2),
        "forwards_per_sec": round(batch * chain / elapsed),
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_vs_dtype_peak": round(achieved_flops / peak, 4),
        "mfu_vs_bf16_peak": round(achieved_flops / V5E_PEAK_BF16_FLOPS, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="128,256,512,1024")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--env", default="oderl-cartpole")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rows = []
    for hidden in [int(w) for w in args.widths.split(",")]:
        for dtype in args.dtypes.split(","):
            r = measure_one(args.env, hidden, dtype, args.batch, args.chain, args.reps)
            rows.append(r)
            print(
                f"hidden={r['hidden']:5d} {r['dtype']:>8s} B={r['batch']}  "
                f"{r['per_forward_us']:9.1f} us/fwd  "
                f"{r['achieved_tflops']:7.2f} TFLOP/s  "
                f"MFU {r['mfu_vs_dtype_peak'] * 100:5.1f}% of {r['dtype']} peak",
                flush=True,
            )
    if args.json:
        Path(args.json).write_text(
            json.dumps({"batch": args.batch, "chain": args.chain, "rows": rows}, indent=1)
        )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

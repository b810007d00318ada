"""Measure the planner horizon-scan unroll factor (Config.mppi_scan_unroll).

Unrolling lets XLA co-schedule consecutive dynamics steps inside the MPPI
rollout — more fusion freedom at the cost of program size and compile time.
Runs the headline bench workload (trained NL flagship, cartpole d1, K=1000,
T=40, 8 vmapped episodes) at each unroll factor and prints one JSON line
per point. Semantics are pinned by tests/test_mppi.py (unrolled == rolled).

Usage: python scripts/bench_unroll.py [--unrolls 1,2,4,8] [--episodes 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", default="1,2,4,8")
    p.add_argument("--episodes", type=int, default=8)
    p.add_argument("--env", default="oderl-cartpole")
    p.add_argument("--delay", type=int, default=1)
    p.add_argument("--roll_outs", type=int, default=1000)
    p.add_argument("--time_steps", type=int, default=40)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    base = Config()
    spec = make_env(args.env, dt=base.dt).spec
    model = make_model("nl", args.env, spec.n_obs, spec.m, spec.action_high, base)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = resolve_checkpoint(
        model_checkpoint_name("nl", args.env, args.delay, "exp", 0, True)
    )
    if os.path.exists(ckpt):
        params = load_pytree(ckpt, params)
    else:
        print(f"WARNING: untrained params ({ckpt} missing)", file=sys.stderr)

    for unroll in [int(u) for u in args.unrolls.split(",")]:
        cfg = Config(mppi_scan_unroll=unroll, mppi_roll_outs=args.roll_outs,
                     mppi_time_steps=args.time_steps)
        t0 = time.perf_counter()
        res = evaluate_policy(
            "nl", args.env, args.delay, seeds=list(range(args.episodes)),
            config=cfg, model_apply=model.apply, params=params,
        )
        print(json.dumps({
            "unroll": unroll,
            "rollouts_per_sec": round(res["mppi_rollouts_per_sec"]),
            "total_reward": round(res["total_reward"], 2),
            "episode_elapsed_s": round(res["episode_elapsed_time"], 3),
            "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
            "backend": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()

"""Our-side mirror of ref_eval.py: same weights, same (K, T, seeds) protocol,
our JAX planner/envs via training.eval.evaluate_policy. Results append to the
same JSONL for side-by-side comparison (harness field distinguishes)."""

import argparse
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.training.eval import evaluate_policy  # noqa: E402
from neurallaplacecontrol_tpu.utils.checkpoint import (  # noqa: E402
    load_pytree,
    model_checkpoint_name,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)  # oracle/random/rnn/latent_ode_ref/...
    p.add_argument("--env", default="oderl-pendulum")
    p.add_argument("--delay", type=int, default=0)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--t", type=int, default=20)
    p.add_argument("--seeds", default="0,1,2,3,4")
    p.add_argument("--ckpt", default=None, help="latent_ode_ref: reference .pt path")
    p.add_argument("--out", default=str(HERE / "ref_eval_results.jsonl"))
    args = p.parse_args()

    cfg = Config()
    from neurallaplacecontrol_tpu.envs import make_env

    spec = make_env(args.env, dt=cfg.dt).spec
    model_apply = params = None
    if args.model == "latent_ode_ref":
        # the SAME reference-trained .pt the reference-harness run used
        from neurallaplacecontrol_tpu.interop import (
            latent_ode_params_from_state_dict,
            load_torch_state_dict,
        )

        model = make_model(args.model, args.env, spec.n_obs, spec.m, spec.action_high, cfg)
        params = latent_ode_params_from_state_dict(load_torch_state_dict(args.ckpt))
        model_apply = model.apply
    elif args.model not in ("oracle", "random"):
        model = make_model(args.model, args.env, spec.n_obs, spec.m, spec.action_high, cfg)
        params = load_pytree(
            str(REPO / "saved_models" / model_checkpoint_name(args.model, args.env, args.delay, "exp", 0, True)),
            model.init(jax.random.PRNGKey(0)),
        )
        model_apply = model.apply

    seeds = [int(s) for s in args.seeds.split(",")]
    eval_name = "latent_ode_ref" if args.model == "latent_ode_ref" else args.model
    t0 = time.perf_counter()
    res = evaluate_policy(
        eval_name, args.env, args.delay, seeds,
        config=cfg, model_apply=model_apply, params=params,
        roll_outs=args.k, time_steps=args.t,
    )
    wall = time.perf_counter() - t0
    for seed, r in zip(seeds, res["total_rewards"]):
        rec = {
            "harness": "ours",
            "seed": seed,
            "wall_s": round(wall / len(seeds), 1),
            "model_name": args.model,
            "env_name": args.env,
            "roll_outs": args.k,
            "time_steps": args.t,
            "delay": args.delay,
            "total_reward": r,
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

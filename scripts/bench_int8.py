"""int8 NL planner experiment: control quality + throughput vs f32/bf16.

Two modes:
  --mode quality  (any backend) episode returns with the int8 apply vs the
                  f32 apply on the same seeds — the gate that decides
                  whether the ~4-5% forward error (see ops/quant.py) is
                  resolved by MPPI's noise-dominated cost ranking.
  --mode perf     (real chip) single-plan latency sweep over K for
                  f32 / bf16 / int8(+fold), the big-K regime where bf16
                  already won 1.97x (artifacts/bench_bigk_dtype_r3.log).

Prints one JSON line per measurement; tee into artifacts/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _flagship(env_name: str, delay: int):
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    cfg = Config()
    env = make_env(env_name, dt=cfg.dt)
    spec = env.spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, cfg)
    params = load_pytree(
        resolve_checkpoint(
            model_checkpoint_name("nl", env_name, delay, "exp", 0, True)
        ),
        model.init(jax.random.PRNGKey(0)),
    )
    return cfg, env, spec, model, params


def mode_quality(args):
    from neurallaplacecontrol_tpu.models.base import norm_stats_for
    from neurallaplacecontrol_tpu.ops.quant import (
        planner_saturation_probe,
        quantized_apply_for,
    )
    from neurallaplacecontrol_tpu.training.eval import evaluate_policy

    cfg, env, spec, model, params = _flagship(args.env, args.delay)
    # obs-saturation observability (advisor r3): fraction of planner-rollout
    # obs features the int8 grid would clip at obs_bound, measured on the f32
    # dynamics under random-action excitation
    norm = norm_stats_for(args.env, spec.action_high, spec.m)
    sat = planner_saturation_probe(
        model.apply, params, norm, env.observe(env.reset(jax.random.PRNGKey(0))),
        action_high=spec.action_high, action_dim=spec.m,
        K=min(args.k, 256), T=args.t, key=jax.random.PRNGKey(1), dt=cfg.dt,
        action_buffer_size=cfg.action_buffer_size,
    )
    del env
    seeds = list(range(args.seeds))
    common = dict(
        config=cfg, params=params, roll_outs=args.k, time_steps=args.t
    )
    res_f32 = evaluate_policy(
        "nl", args.env, args.delay, seeds, model_apply=model.apply, **common
    )
    qapply = quantized_apply_for(
        "nl", args.env, params, cfg, spec, fold_t=float(cfg.dt)
    )
    res_int8 = evaluate_policy(
        "nl", args.env, args.delay, seeds, model_apply=qapply, **common
    )
    print(
        json.dumps(
            {
                "mode": "quality", "env": args.env, "delay": args.delay,
                "k": args.k, "t": args.t, "seeds": args.seeds,
                "f32_total_reward": res_f32["total_reward"],
                "int8_total_reward": res_int8["total_reward"],
                "f32_per_seed": res_f32["total_rewards"],
                "int8_per_seed": res_int8["total_rewards"],
                "obs_saturation": {
                    "clip_frac_mean": sat["clip_frac_mean"],
                    "clip_frac_max": sat["clip_frac_max"],
                    "clip_frac_final_step": sat["clip_frac_per_step"][-1],
                },
            }
        ),
        flush=True,
    )


def _time_plans(command, U0, obs, buf, key, iters: int):
    # AOT-compile, then time ITERS sequential plans (planner latency regime)
    action, U, _ = command(U0, obs, buf, key)
    action.block_until_ready()
    t0 = time.perf_counter()
    U_c = U0
    for i in range(iters):
        action, U_c, _ = command(U_c, obs, buf, jax.random.fold_in(key, i))
    action.block_until_ready()
    return (time.perf_counter() - t0) / iters


def mode_perf(args):
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for
    from neurallaplacecontrol_tpu.planners.mppi_delay import (
        MPPIConfig,
        default_noise_sigma,
        make_mppi_params,
        mppi_command,
        mppi_reset,
    )
    from neurallaplacecontrol_tpu.training.rollout import (
        build_learned_dynamics,
        build_running_cost,
    )
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    base = Config()
    env = make_env(args.env, dt=base.dt)
    spec = env.spec
    cost = build_running_cost(env)
    ckpt = resolve_checkpoint(
        model_checkpoint_name("nl", args.env, args.delay, "exp", 0, True)
    )
    # variant construction is K-invariant: load/quantize once, sweep K after
    variants = {}
    for dtype in ("float32", "bfloat16"):
        cfg = Config(nl_compute_dtype=dtype)
        model = make_model("nl", args.env, spec.n_obs, spec.m, spec.action_high, cfg)
        params = load_pytree(ckpt, model.init(jax.random.PRNGKey(0)))
        variants[dtype] = (model.apply, params)
    params_f32 = variants["float32"][1]
    # control variant: the exact theta/phi fold WITHOUT int8 — separates the
    # fold's own contribution from the int8 matmuls in the comparison
    variants["f32_fold"] = (
        quantized_apply_for(
            "nl", args.env, params_f32, base, spec,
            quantize_gru=False, mlp_int8_layers=(), fold_t=float(base.dt),
        ),
        params_f32,
    )
    variants["int8_fold"] = (
        quantized_apply_for("nl", args.env, params_f32, base, spec, fold_t=float(base.dt)),
        params_f32,
    )

    for K in (int(k) for k in args.ks.split(",")):
        mcfg = MPPIConfig(
            num_samples=K, horizon=args.t, nu=spec.m, lambda_=base.mppi_lambda,
            u_scale=spec.action_high, u_min=-spec.action_high, u_max=spec.action_high,
            dt=base.dt,
        )
        mparams = make_mppi_params(default_noise_sigma(spec.m, base.mppi_sigma))
        key = jax.random.PRNGKey(0)
        U0 = mppi_reset(key, mcfg, mparams)
        obs = env.observe(env.reset(key))
        buf = jnp.zeros((base.action_buffer_size, spec.m))

        for name, (apply_fn, params) in variants.items():
            dyn = build_learned_dynamics(env, apply_fn, params, K, base.dt)

            @jax.jit
            def command(U, o, b, k, _dyn=dyn):
                return mppi_command(mcfg, mparams, _dyn, cost, U, o, b, k)

            sec = _time_plans(command, U0, obs, buf, key, args.iters)
            print(
                json.dumps(
                    {
                        "mode": "perf", "variant": name, "K": K, "T": args.t,
                        "sec_per_plan": round(sec, 6),
                        "rollouts_per_sec": round(K / sec, 1),
                    }
                ),
                flush=True,
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("quality", "perf"), required=True)
    ap.add_argument("--env", default="oderl-cartpole")
    ap.add_argument("--delay", type=int, default=1)
    ap.add_argument("--k", type=int, default=200)  # quality-mode planner K
    ap.add_argument("--t", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--ks", default="16384,65536")  # perf-mode K sweep
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.mode == "quality":
        mode_quality(args)
    else:
        mode_perf(args)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

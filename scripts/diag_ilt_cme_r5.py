"""Diagnose the cme planner failure (round-5): trained cme NL hits train
loss 5.5e-4 yet plans at -793.4 +/- 0.14 (normalized 0.0, below random) on
pendulum d1 — near-zero seed variance implies every MPPI candidate scores
identically, i.e. the model's rollout predictions saturate the reward to a
constant. This probe loads the trained checkpoint through train_model's own
load path and measures prediction magnitudes on (a) the expert buffer at its
own ts, (b) the buffer at the planner's constant ts=dt, (c) planner-like
inputs from the eval start distribution (env reset, uniform action windows),
for cme vs the fourier flagship.

Usage: python scripts/diag_ilt_cme_r5.py [--platform cpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--platform", type=str, default=None)
ap.add_argument("--alg", type=str, default="cme")
ap.add_argument("--saved", type=str, default="./saved_models_ilt_cme/")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.data.collector import collect_expert_data  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.training.train import train_model  # noqa: E402


def stats(name, x):
    x = np.asarray(x)
    rec = {
        "probe": name,
        "finite_frac": float(np.isfinite(x).mean()),
        "abs_mean": float(np.abs(x[np.isfinite(x)]).mean()) if np.isfinite(x).any() else None,
        "abs_max": float(np.abs(x[np.isfinite(x)]).max()) if np.isfinite(x).any() else None,
    }
    print(json.dumps(rec), flush=True)
    return rec


def run(alg, saved):
    config = Config(
        nl_ilt_algorithm=alg,
        saved_models_path=saved,
        end_training_after_seconds=900.0,
    )
    model, params, _ = train_model(
        "nl", "oderl-pendulum", config, delay=1, retrain=False
    )
    # param health first: a poisoned checkpoint explains everything
    leaves = jax.tree_util.tree_leaves(params)
    stats(f"{alg}/params", np.concatenate([np.ravel(np.asarray(l)) for l in leaves]))

    s0, a0, sn, ts = collect_expert_data("oderl-pendulum", 1, config)
    n = 4096
    s0, a0, sn, ts = s0[:n], a0[:n], sn[:n], ts[:n]
    apply = jax.jit(model.apply)

    # (a) training distribution at its own ts: should reproduce train MSE
    pred = apply(params, s0, a0, ts)
    stats(f"{alg}/buffer@own_ts pred", pred)
    target = sn - s0
    mse = float(np.mean((np.asarray(pred) - np.asarray(target)) ** 2))
    print(json.dumps({"probe": f"{alg}/buffer@own_ts", "mse": mse}), flush=True)

    # (b) same rows, the planner's constant horizon ts = dt
    ts_dt = jnp.full_like(ts, config.dt)
    stats(f"{alg}/buffer@dt pred", apply(params, s0, a0, ts_dt))

    # (c) eval start distribution: env reset states x uniform action windows
    env = make_env("oderl-pendulum", ts_grid=config.ts_grid, dt=config.dt)
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    reset_obs = jax.vmap(lambda k: env.observe(env.reset(k)))(keys)
    abuf = jax.random.uniform(
        jax.random.PRNGKey(1),
        (512, config.action_buffer_size, env.spec.m),
        jnp.float32,
        -env.spec.action_high,
        env.spec.action_high,
    )
    ts_c = jnp.full((512, 1), config.dt)
    stats(f"{alg}/reset_obs@dt pred", apply(params, reset_obs, abuf, ts_c))

    # (d) 40-step open-loop compounding from reset: the planner integrates
    # deltas; measure where the rollout state lands
    obs = reset_obs
    for _ in range(40):
        obs = obs + apply(params, obs, abuf, ts_c)
    stats(f"{alg}/40step_rollout state", obs)


run(args.alg, args.saved)
print("--- fourier flagship, same probes ---", flush=True)
run("fourier", Config.saved_models_path)

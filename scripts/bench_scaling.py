"""Planner throughput scaling: MPPI rollouts/sec vs K on one chip.

Sweeps the rollout count through the regime the reference's wandb sweep
contemplates (mppi_optim.yaml K up to 262144) with the NL dynamics in the
loop, measuring steady-state planning throughput (single mppi_command calls,
not full episodes). Prints one line per K.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.planners import (  # noqa: E402
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
    mppi_reset,
)
from neurallaplacecontrol_tpu.training.rollout import (  # noqa: E402
    build_learned_dynamics,
    build_running_cost,
)


def main(ks=(1000, 4096, 16384, 65536, 262144), T=40, reps=20, dtype="float32"):
    config = Config(nl_compute_dtype=dtype)
    print(f"nl_compute_dtype={dtype}")
    env = make_env("oderl-cartpole")
    spec = env.spec
    model = make_model("nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))
    cost = build_running_cost(env)
    obs = env.observe(env.reset(jax.random.PRNGKey(1)))
    buf = jnp.zeros((4, spec.m))

    for K in ks:
        cfg = MPPIConfig(
            num_samples=int(K), horizon=T, nu=spec.m, u_scale=spec.action_high,
            u_min=-spec.action_high, u_max=spec.action_high,
        )
        mppi_params = make_mppi_params(default_noise_sigma(spec.m, config.mppi_sigma))
        dynamics = build_learned_dynamics(env, model.apply, params, int(K), config.dt)

        @jax.jit
        def command(U, key, cfg=cfg, mppi_params=mppi_params, dynamics=dynamics):
            a, U, _ = mppi_command(cfg, mppi_params, dynamics, cost, U, obs, buf, key)
            return a, U

        U = mppi_reset(jax.random.PRNGKey(2), cfg, mppi_params)
        a, U = command(U, jax.random.PRNGKey(3))
        a.block_until_ready()
        t0 = time.perf_counter()
        for i in range(reps):
            a, U = command(U, jax.random.fold_in(jax.random.PRNGKey(4), i))
        a.block_until_ready()
        dt_cmd = (time.perf_counter() - t0) / reps
        print(
            f"K={K:7d}  {dt_cmd * 1e3:8.2f} ms/plan  "
            f"{K / dt_cmd:12.0f} rollouts/s  "
            f"{K * T / dt_cmd:14.0f} model-forwards/s"
        )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1000,4096,16384,65536,262144")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--reps", type=int, default=20)
    a = ap.parse_args()
    main(ks=tuple(int(k) for k in a.ks.split(",")), reps=a.reps, dtype=a.dtype)

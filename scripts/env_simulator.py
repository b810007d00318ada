"""Environment visualization: roll a random/oracle policy and write a gif.

Analog of reference envs/oderl/env_simulator.py (standalone env viewer).
Usage: python scripts/env_simulator.py [env] [policy] — policy in
{random, oracle}; writes artifacts/sim_<env>_<policy>.gif.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402, F401 — handy in --interact sessions

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.envs.render import render_episode, save_video  # noqa: E402
from neurallaplacecontrol_tpu.planners import (  # noqa: E402
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
)
from neurallaplacecontrol_tpu.training.rollout import (  # noqa: E402
    EpisodeSettings,
    build_oracle_dynamics,
    make_episode_fn,
)


def main(env_name="oderl-pendulum", policy="random", n_steps=100):
    cfg = Config()
    env = make_env(env_name)
    spec = env.spec
    mppi_cfg = MPPIConfig(
        num_samples=200, horizon=30, nu=spec.m, u_scale=spec.action_high,
        u_min=-spec.action_high, u_max=spec.action_high,
    )
    params = make_mppi_params(default_noise_sigma(spec.m, cfg.mppi_sigma))
    dyn = build_oracle_dynamics(env, 200, spec.dt, 0) if policy == "oracle" else None
    settings = EpisodeSettings(delay=0, n_steps=int(n_steps),
                               random_policy=policy == "random")
    episode = jax.jit(make_episode_fn(env, dyn, mppi_cfg, params, settings))
    total, rec = episode(jax.random.PRNGKey(0))
    print(f"{env_name} {policy}: return {float(total) * 200.0 / int(n_steps):.1f}")
    os.makedirs("artifacts", exist_ok=True)
    frames = render_episode(env, rec)
    path = save_video(frames, f"artifacts/sim_{spec.name}_{policy}.gif",
                      fps=int(1.0 / spec.dt))
    print("wrote", path)


if __name__ == "__main__":
    main(*sys.argv[1:])

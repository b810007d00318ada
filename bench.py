"""Headline benchmark: MPPI rollouts/sec with the flagship NL dynamics model
in the planning loop, on one real TPU chip.

One rollout = one K-sample trajectory candidate simulated over the full
T=40-step horizon (the reference workload: K=1000 rollouts per env step,
mppi_with_model.py:218-230 + config.py:52-53). The measured episode is the
complete closed-loop protocol — 200 env steps, each containing a full MPPI
plan with 40 sequential batched-1000 NL forward passes — compiled as a
single on-device scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 10k rollouts/s north-star from BASELINE.md (the
reference publishes no throughput numbers; BASELINE.json "published": {}).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_ROLLOUTS_PER_SEC = 10_000.0  # BASELINE.md north-star for one v5e


def main():
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.planners import (
        MPPIConfig,
        default_noise_sigma,
        make_mppi_params,
    )
    from neurallaplacecontrol_tpu.training.rollout import (
        EpisodeSettings,
        build_learned_dynamics,
        make_batched_episode_fn,
    )

    config = Config()
    env_name = "oderl-cartpole"
    env = make_env(env_name, dt=config.dt)
    spec = env.spec
    K, T = config.mppi_roll_outs, config.mppi_time_steps
    n_steps = int(10.0 / config.dt)

    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))
    dynamics = build_learned_dynamics(env, model.apply, params, K, config.dt)

    mppi_cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=spec.m, lambda_=config.mppi_lambda,
        u_scale=spec.action_high, u_min=-spec.action_high, u_max=spec.action_high,
    )
    mppi_params = make_mppi_params(default_noise_sigma(spec.m, config.mppi_sigma))
    settings = EpisodeSettings(delay=1, n_steps=n_steps,
                               action_buffer_size=config.action_buffer_size)
    episode = make_batched_episode_fn(env, dynamics, mppi_cfg, mppi_params, settings)

    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(2)])
    # warmup / compile
    totals, _ = episode(keys)
    jax.block_until_ready(totals)
    # measure
    t0 = time.perf_counter()
    totals, _ = episode(keys)
    jax.block_until_ready(totals)
    elapsed = time.perf_counter() - t0

    n_episodes = keys.shape[0]
    rollouts_per_sec = K * n_steps * n_episodes / elapsed
    print(
        json.dumps(
            {
                "metric": "nl_mppi_rollouts_per_sec",
                "value": round(rollouts_per_sec, 1),
                "unit": "rollouts/s (K=1000,T=40 NL-dynamics MPPI, full episode)",
                "vs_baseline": round(rollouts_per_sec / BASELINE_ROLLOUTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

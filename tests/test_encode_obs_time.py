"""Time-age channel (encode_obs_time) through planner, rollout, and model.

Reference semantics:
- planner rollout advances a shared age buffer by dt each horizon step,
  rolls it, zeroes the newest entry, and appends it as an extra channel on
  the action window (mppi_delay.py:279-287);
- the episode/collector buffer ages advance by the REALIZED step duration,
  newest entry zero (mppi_dataset_collector.py:20-24, :204-208, :231-233).
"""

import jax
import jax.numpy as jnp
import numpy as np

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
)
from neurallaplacecontrol_tpu.training import evaluate_policy
from neurallaplacecontrol_tpu.training.rollout import (
    EpisodeSettings,
    make_episode_fn,
)


def test_planner_age_channel_values(key):
    """With ~zero noise, a dynamics that accumulates the age channel gives an
    analytically known cost: steady-state ages are [3dt, 2dt, dt, 0]."""
    dt = 0.1
    cfg = MPPIConfig(
        num_samples=2, horizon=3, nu=1, u_scale=1.0, u_min=-9.0, u_max=9.0,
        encode_obs_time=True, dt=dt,
    )
    params = make_mppi_params(jnp.asarray([[1e-18]], dtype=jnp.float64))

    def dynamics(state, window):
        assert window.shape[-1] == 2  # action + age channel (static shape)
        return state + jnp.sum(window[:, :, -1:], axis=1)  # sum of ages

    def cost_fn(state, action):
        return state[:, 0]

    U = jnp.zeros((3, 1), dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.zeros((4, 1), dtype=jnp.float64)
    _, _, aux = mppi_command(cfg, params, dynamics, cost_fn, U, obs, buf, key)
    # ages after each planner step: [3dt, 2dt, dt, 0] -> sum = 6dt = 0.6
    # states: 0.6, 1.2, 1.8 -> cost 3.6
    np.testing.assert_allclose(np.asarray(aux["cost_total"]), 3.6, atol=1e-6)


def test_episode_records_realized_ages(key):
    """Recorded buffer age channel tracks REALIZED step durations on the
    irregular 'exp' grid: a0[k, -1] age = 0, a0[k, -2] age = ts[k],
    a0[k, -3] age = ts[k-1] + ts[k]."""
    env = make_env("oderl-pendulum", ts_grid="exp")
    cfg = MPPIConfig(num_samples=4, horizon=3, nu=1, u_scale=2.0, u_min=-2.0,
                     u_max=2.0, encode_obs_time=True)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    settings = EpisodeSettings(
        delay=1, n_steps=8, action_buffer_size=4,
        random_policy=True, encode_obs_time=True,
    )
    episode = make_episode_fn(env, None, cfg, params, settings)
    _, rec = jax.jit(episode)(key)
    a0 = np.asarray(rec.a0)
    ts = np.asarray(rec.ts)
    assert a0.shape == (8, 4, 2)  # nu + age channel
    np.testing.assert_allclose(a0[:, -1, -1], 0.0, atol=1e-12)
    np.testing.assert_allclose(a0[:, -2, -1], ts, rtol=1e-6)
    np.testing.assert_allclose(a0[2:, -3, -1], ts[1:-1] + ts[2:], rtol=1e-6)
    assert ts.std() > 0  # exp grid really is irregular


def test_nl_model_eval_with_encode_obs_time(key):
    """NL built with encode_obs_time consumes the augmented window inside a
    full (tiny) planning episode."""
    cfg = Config(encode_obs_time=True)
    env = make_env("oderl-pendulum")
    spec = env.spec
    model = make_model("nl", "oderl-pendulum", spec.n_obs, spec.m,
                       spec.action_high, config=cfg, dtype=jnp.float64)
    params = model.init(key)
    # direct apply with the augmented buffer [B, A, m+1]
    obs = jnp.zeros((3, spec.n_obs), dtype=jnp.float64)
    buf = jnp.zeros((3, cfg.action_buffer_size, spec.m + 1), dtype=jnp.float64)
    ts = jnp.full((3, 1), 0.05, dtype=jnp.float64)
    out = model.apply(params, obs, buf, ts)
    assert out.shape == (3, spec.n_obs)
    res = evaluate_policy(
        "nl", "oderl-pendulum", 1, seeds=[0], config=cfg,
        model_apply=model.apply, params=params, roll_outs=16, time_steps=5,
    )
    assert np.isfinite(res["total_reward"])


def test_all_model_families_consume_age_channel(key):
    """rnn / delta_t_rnn / node / nl must all accept the (m+1)-channel
    encode_obs_time buffer (the reference's plain RNN crashes here; ours
    handles the extra channel cleanly, acrobot m=2 included)."""
    from neurallaplacecontrol_tpu.models import make_model

    cfg = Config(encode_obs_time=True)
    for env_name, n, m, hi in [("oderl-pendulum", 3, 1, 2.0),
                               ("oderl-acrobot", 6, 2, 5.0)]:
        for name in ("rnn", "delta_t_rnn", "node", "nl"):
            model = make_model(name, env_name, n, m, hi, cfg, dtype=jnp.float64)
            params = model.init(key)
            out = model.apply(
                params,
                jnp.zeros((3, n)),
                jnp.zeros((3, 4, m + 1)),
                jnp.full((3, 1), 0.05),
            )
            assert out.shape == (3, n), (env_name, name)
            assert bool(jnp.isfinite(out).all()), (env_name, name)

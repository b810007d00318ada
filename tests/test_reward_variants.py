"""Cartpole reward variants + two-frame (latent) oracle dynamics.

References: ctcartpole.diff_obs_reward_:290-343 (goal shift, state
constraint), diff_obs_reward_reduced_state:239-288,
oracle.cartpole_dynamics_dt_latent{,_reduced}:227-375.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.envs.cartpole import (
    end_effector_reward,
    end_effector_reward_reduced,
)
from neurallaplacecontrol_tpu.envs.oracle import (
    cartpole_dynamics_dt,
    cartpole_dynamics_dt_latent,
    cartpole_dynamics_dt_latent_reduced,
)
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
)
from neurallaplacecontrol_tpu.training.rollout import (
    EpisodeSettings,
    build_oracle_dynamics,
    make_episode_fn,
)


def _rand_states(key, n=7):
    return jax.random.normal(key, (n, 4), dtype=jnp.float64) * jnp.asarray(
        [1.0, 2.0, jnp.pi, 3.0]
    )


def test_goal_zero_matches_default(key):
    env = make_env("oderl-cartpole")
    s = _rand_states(key)
    np.testing.assert_allclose(
        np.asarray(env.reward_state_ext(s, 0.0)),
        np.asarray(env.reward_state(s)),
        rtol=1e-12,
    )


def test_goal_shift_value(key):
    """Moving the goal changes only the position error term:
    r(goal) - r(0) = -( (ee_x-goal)^2 - ee_x^2 )."""
    s = _rand_states(key)
    x, theta = s[..., 0], s[..., 2]
    ee_x = x + jnp.sin(theta)
    for goal in (-2.0, 2.0):
        diff = end_effector_reward(s, goal_x=goal) - end_effector_reward(s)
        expect = -((ee_x - goal) ** 2 - ee_x**2)
        np.testing.assert_allclose(np.asarray(diff), np.asarray(expect), rtol=1e-9)


def test_state_constraint_barrier(key):
    """state_constraint adds exactly -exp(10 err_x + 7)."""
    s = _rand_states(key)
    ee_x = s[..., 0] + jnp.sin(s[..., 2])
    diff = end_effector_reward(s, state_constraint=True) - end_effector_reward(s)
    np.testing.assert_allclose(
        np.asarray(diff), np.asarray(-jnp.exp(10.0 * ee_x + 7.0)), rtol=1e-9
    )


def test_reduced_reward_drops_velocity(key):
    """Reduced-state reward equals the full reward with zero velocities."""
    s = _rand_states(key)
    s_zero_vel = s.at[..., 1].set(0.0).at[..., 3].set(0.0)
    reduced = jnp.stack(
        [s[..., 0], jnp.cos(s[..., 2]), jnp.sin(s[..., 2])], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(end_effector_reward_reduced(reduced)),
        np.asarray(end_effector_reward(s_zero_vel, vel_rew_const=0.0)),
        rtol=1e-9,
    )


def test_latent_oracle_recovers_velocities(key):
    """With prev = state - ts * (true velocities), the finite-difference
    reconstruction is exact, and the raw-form latent step matches the
    semi-implicit update built from the single-frame oracle's accelerations."""
    ts = jnp.full((5,), 0.05, dtype=jnp.float64)
    s = _rand_states(key, 5)
    prev = s.at[..., 0].add(-ts * s[..., 1]).at[..., 2].add(-ts * s[..., 3])
    a = jnp.zeros((5, 1), dtype=jnp.float64) + 0.7
    out = cartpole_dynamics_dt_latent(s, prev, a, ts)
    # accelerations from the explicit-Euler single-frame oracle:
    # next = s + ts * rhs(s) -> acc = (next_vel - vel)/ts
    nxt = cartpole_dynamics_dt(s, a, ts)
    xacc = (nxt[..., 1] - s[..., 1]) / ts
    thacc = (nxt[..., 3] - s[..., 3]) / ts
    new_xdot = s[..., 1] + xacc * ts
    new_thdot = s[..., 3] + thacc * ts
    np.testing.assert_allclose(np.asarray(out[..., 1]), np.asarray(new_xdot), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(new_thdot), rtol=1e-7)
    # semi-implicit: positions advance with the NEW velocity
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(s[..., 0] + new_xdot * ts), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 2]), np.asarray(s[..., 2] + new_thdot * ts), rtol=1e-7
    )


def test_latent_reduced_matches_full_positions(key):
    ts = jnp.full((5,), 0.05, dtype=jnp.float64)
    s = _rand_states(key, 5)
    prev = s.at[..., 0].add(-ts * s[..., 1]).at[..., 2].add(-ts * s[..., 3])
    a = jnp.full((5, 1), -1.3, dtype=jnp.float64)
    full = cartpole_dynamics_dt_latent(s, prev, a, ts)
    red = cartpole_dynamics_dt_latent_reduced(
        jnp.stack([s[..., 0], jnp.cos(s[..., 2]), jnp.sin(s[..., 2])], axis=-1),
        jnp.stack([prev[..., 0], jnp.cos(prev[..., 2]), jnp.sin(prev[..., 2])], axis=-1),
        a,
        ts,
    )
    np.testing.assert_allclose(np.asarray(red[..., 0]), np.asarray(full[..., 0]), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(red[..., 1]), np.asarray(jnp.cos(full[..., 2])), rtol=1e-7
    )


def test_change_goal_episode_runs(key):
    """change_goal / state_constraint planner costs compile and run inside a
    full (tiny) oracle episode."""
    env = make_env("oderl-cartpole")
    cfg = MPPIConfig(num_samples=16, horizon=5, nu=1, u_scale=3.0, u_min=-3.0, u_max=3.0)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    dyn = build_oracle_dynamics(env, 16, 0.05, 0)
    r = {}
    for name, kw in {
        "default": {}, "cg": {"change_goal": True}, "sc": {"state_constraint": True},
    }.items():
        settings = EpisodeSettings(delay=0, n_steps=10, **kw)
        episode = jax.jit(make_episode_fn(env, dyn, cfg, params, settings))
        total, _ = episode(key)
        r[name] = float(total)
        assert np.isfinite(r[name])
    # the goal-shifted planner steers differently from the default cost
    assert r["cg"] != r["default"]

"""Environment physics tests: raw/trig-form consistency, oracle parity,
rewards, resets, time grids — the oracle-as-ground-truth validation the
reference only does manually (SURVEY.md §4.2, overlay.py:86-219).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.envs import make_env, env_step, sample_dt, ORACLES

ENVS = ["oderl-pendulum", "oderl-cartpole", "oderl-acrobot"]


def _rand_raw(env, key, batch=16):
    return (
        jax.random.uniform(key, (batch, env.spec.n_state), minval=-0.5, maxval=0.5)
        * jnp.asarray(env.state_max)
        * 2.0
    )


def _rand_action(env, key, batch=16):
    return jax.random.uniform(
        key, (batch, env.spec.m), minval=-env.spec.action_high, maxval=env.spec.action_high
    )


@pytest.mark.parametrize("name", ENVS)
def test_trig_rhs_is_pushforward_of_raw_rhs(name, key):
    """The trig-form rhs must equal the time-derivative of observe(raw) —
    an independent consistency check between the two physics forms."""
    env = make_env(name)
    k1, k2 = jax.random.split(key)
    raw = _rand_raw(env, k1)
    act = _rand_action(env, k2)
    d_raw = env.rhs(raw, act)
    obs, d_obs_expected = jax.jvp(env.observe, (raw,), (d_raw,))
    d_obs = env.rhs(obs, act)
    np.testing.assert_allclose(np.asarray(d_obs), np.asarray(d_obs_expected), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ENVS)
def test_observe_roundtrip(name, key):
    env = make_env(name)
    raw = _rand_raw(env, key)
    rt = env.obs_to_state(env.observe(raw))
    # angles wrap: compare via observe
    np.testing.assert_allclose(
        np.asarray(env.observe(rt)), np.asarray(env.observe(raw)), atol=1e-8
    )


@pytest.mark.parametrize("name", ENVS)
@pytest.mark.parametrize("delay", [0, 1, 3])
def test_oracle_matches_env_transition(name, delay, key):
    """oracle(s, buffer, dt, delay) == observe(euler-step(raw, delayed action))
    — mirrors the manual validation at overlay.py:137-177."""
    env = make_env(name)
    k1, k2 = jax.random.split(key)
    raw = _rand_raw(env, k1)
    A = 4
    buf = jax.random.uniform(
        k2, (raw.shape[0], A, env.spec.m), minval=-env.spec.action_high, maxval=env.spec.action_high
    )
    ts = jnp.full((raw.shape[0], 1), env.spec.dt)
    oracle = ORACLES[name]

    delayed = buf[:, -(delay + 1), :]
    expected_raw = env_step(env, raw, delayed, env.spec.dt)

    # raw-form oracle
    out_raw = oracle(raw, buf, ts, delay)
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(expected_raw), rtol=1e-8, atol=1e-8)

    # trig-form oracle
    out_obs = oracle(env.observe(raw), buf, ts, delay)
    np.testing.assert_allclose(
        np.asarray(out_obs), np.asarray(env.observe(expected_raw)), rtol=1e-7, atol=1e-7
    )


def test_pendulum_hand_values():
    env = make_env("oderl-pendulum")
    s = jnp.asarray([[1.0, 0.5]])
    a = jnp.asarray([[1.5]])
    d = np.asarray(env.rhs(s, a))[0]
    accel = -3 * 10.0 / 2.0 * np.sin(1.0 + np.pi) + 3.0 * 1.5
    np.testing.assert_allclose(d, [0.5, accel], rtol=1e-10)
    # upright, still, no action => reward 0; downward => -4
    assert float(env.reward_state(jnp.asarray([0.0, 0.0]))) == pytest.approx(0.0)
    assert float(env.reward_state(jnp.asarray([np.pi, 0.0]))) == pytest.approx(-4.0)
    assert float(env.reward_action(jnp.asarray([2.0]))) == pytest.approx(-0.04)


def test_cartpole_hand_values():
    env = make_env("oderl-cartpole")
    # balanced upright at origin: reward 0
    assert float(env.reward_state(jnp.asarray([0.0, 0.0, 0.0, 0.0]))) == pytest.approx(0.0)
    # hanging down: ee = (0, -1), err = (0,-2) => -4
    assert float(env.reward_state(jnp.asarray([0.0, 0.0, np.pi, 0.0]))) == pytest.approx(-4.0)
    # action clamp inside rhs: force saturates at +-3
    s = jnp.asarray([[0.0, 0.0, 0.1, 0.0]])
    d_big = np.asarray(env.rhs(s, jnp.asarray([[10.0]])))
    d_clamped = np.asarray(env.rhs(s, jnp.asarray([[3.0]])))
    np.testing.assert_allclose(d_big, d_clamped)


def test_acrobot_hand_values():
    env = make_env("oderl-acrobot")
    # both links hanging down (theta=0 points down per ctacrobot docstring):
    # tip at p2=(-2, 0) horizontally... reward -((p2x-2)^2) - p2y^2
    s = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    p2x = -2.0
    expected = -((p2x - 2.0) ** 2)
    assert float(env.reward_state(s)) == pytest.approx(expected)
    # fully extended (theta1=pi/2... tip up) gives reward 0 at zero velocity
    s_up = jnp.asarray([np.pi, 0.0, 0.0, 0.0])
    assert float(env.reward_state(s_up)) == pytest.approx(0.0, abs=1e-9)
    assert env.spec.ac_rew_const == pytest.approx(1e-4)
    assert env.spec.vel_rew_const == pytest.approx(1e-1)


@pytest.mark.parametrize("name", ENVS)
def test_reset_distribution(name, key):
    env = make_env(name)
    states = jax.vmap(env.reset)(jax.random.split(key, 256))
    assert states.shape == (256, env.spec.n_state)
    if name == "oderl-pendulum":
        assert np.all(np.abs(np.asarray(states[:, 0]) - np.pi) <= 0.1)
    if name == "oderl-cartpole":
        assert np.all(np.abs(np.asarray(states[:, 2]) - np.pi) <= 0.05)


def test_time_grids(key):
    dt = 0.05
    fixed = sample_dt(key, "fixed", dt, (1000,))
    assert np.all(np.asarray(fixed) == dt)
    uni = np.asarray(sample_dt(key, "uniform", dt, (20000,)))
    assert 0.0 <= uni.min() and uni.max() <= 2 * dt
    assert abs(uni.mean() - dt) < 0.002
    ex = np.asarray(sample_dt(key, "exp", dt, (20000,)))
    assert abs(ex.mean() - dt) < 0.002
    with pytest.raises(ValueError):
        sample_dt(key, "bogus", dt)


@pytest.mark.parametrize("name", ENVS)
def test_step_jit_vmap(name, key):
    env = make_env(name)
    raw = _rand_raw(env, key, batch=8)
    act = _rand_action(env, jax.random.fold_in(key, 1), batch=8)
    step = lambda s, a: env_step(env, s, a, env.spec.dt)  # noqa: E731
    out = step(raw, act)
    out_jit = jax.jit(step)(raw, act)
    out_vmap = jax.vmap(step)(raw, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_jit), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_vmap), rtol=1e-12)

"""MPPI-delay planner unit tests + end-to-end control episodes.

Regression targets from BASELINE.md: oracle/random episode returns per env
and delay (reference process_results/plot_util.py:1-26); the e2e tests use
reduced K for CPU speed and assert generous brackets around those numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
    mppi_reset,
)
from neurallaplacecontrol_tpu.training import (
    build_oracle_dynamics,
    build_running_cost,
    evaluate_policy,
)


def _pendulum_planner(K=64, T=10, delay=0):
    env = make_env("oderl-pendulum")
    cfg = MPPIConfig(num_samples=K, horizon=T, nu=1, u_scale=2.0, u_min=-2.0, u_max=2.0)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    dyn = build_oracle_dynamics(env, K, 0.05, delay)
    cost = build_running_cost(env)
    return env, cfg, params, dyn, cost


def test_command_shapes_and_determinism(key):
    env, cfg, params, dyn, cost = _pendulum_planner()
    U = mppi_reset(key, cfg, params)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    buf = jnp.zeros((4, 1))
    a1, U1, aux = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    a2, U2, _ = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    assert a1.shape == (1,)
    assert U1.shape == U.shape
    assert aux["cost_total"].shape == (cfg.num_samples,)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # same key
    a3, _, _ = mppi_command(cfg, params, dyn, cost, U, obs, buf, jax.random.fold_in(key, 1))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))  # fresh noise


def test_action_bounded(key):
    """U_new = sum_k omega_k * perturbed_k (convex, since sum omega = 1 and
    noise = perturbed - U), and perturbed is clamped — so the emitted action
    obeys [u_min, u_max] even from an absurd carry."""
    env, cfg, params, dyn, cost = _pendulum_planner()
    U = 10.0 * jnp.ones((cfg.horizon, 1), dtype=jnp.float64)  # absurd carry
    obs = env.observe(jnp.asarray([jnp.pi, 0.0]))
    buf = jnp.zeros((4, 1))
    action, U_new, _ = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    assert np.all(np.abs(np.asarray(U_new) * cfg.u_scale) <= cfg.u_max + 1e-9)
    assert abs(float(action[0])) <= cfg.u_max + 1e-9


def test_receding_horizon_shift(key):
    env, cfg, params, dyn, cost = _pendulum_planner(K=8, T=5)
    U = 0.1 * jnp.arange(5.0, dtype=jnp.float64)[:, None]  # inside [u_min, u_max]
    obs = env.observe(jnp.asarray([jnp.pi, 0.0]))
    buf = jnp.zeros((4, 1))
    # zero noise => perturbed == rolled U, omega uniform, U unchanged by update
    zero_sigma = make_mppi_params(jnp.asarray([[1e-12]], dtype=jnp.float64))
    _, U_new, _ = mppi_command(cfg, zero_sigma, dyn, cost, U, obs, buf, key)
    np.testing.assert_allclose(
        np.asarray(U_new[:-1, 0]), np.asarray(U[1:, 0]), atol=1e-4
    )
    assert abs(float(U_new[-1, 0])) < 1e-4  # u_init = 0


def test_rollout_windows_prepend_history(key):
    """The dynamics at rollout step t must see the sliding window
    [buffer[1+t:], planned actions...] (reference mppi_delay.py:256-277).
    Verified functionally: a linear dynamics that accumulates the window's
    OLDEST entry yields an analytically predictable cost."""
    cfg = MPPIConfig(num_samples=2, horizon=3, nu=1, u_scale=1.0, u_min=-9.0, u_max=9.0)
    params = make_mppi_params(jnp.asarray([[1e-18]], dtype=jnp.float64))  # ~zero noise

    def dynamics(state, window):
        return state + window[:, 0, :]  # oldest action in the window

    def cost_fn(state, action):
        return state[:, 0]

    U = jnp.zeros((3, 1), dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.asarray([[1.0], [2.0], [3.0], [4.0]], dtype=jnp.float64)
    _, _, aux = mppi_command(cfg, params, dynamics, cost_fn, U, obs, buf, key)
    # windows' oldest entries over t=0,1,2 are buf[1], buf[2], buf[3]
    # states: 2, 2+3=5, 5+4=9 -> total cost 16 per sample
    np.testing.assert_allclose(np.asarray(aux["cost_total"]), 16.0, atol=1e-6)


@pytest.mark.parametrize("delay", [0, 2])
def test_oracle_pendulum_swingup(delay):
    """Oracle-MPPI controls the delayed pendulum: return lands in the
    reference bracket (oracle -121, random -617; plot_util.py:2-11)."""
    res = evaluate_policy(
        "oracle", "oderl-pendulum", delay, seeds=[0],
        config=Config(), roll_outs=150, time_steps=30,
    )
    assert -300.0 < res["total_reward"] < -50.0, res["total_reward"]


def test_random_policy_baseline():
    res = evaluate_policy("random", "oderl-pendulum", 0, seeds=[0, 1], config=Config())
    # reference random mean: -616.77 (plot_util.py:2-6)
    assert -1000.0 < res["total_reward"] < -300.0
    assert len(res["total_rewards"]) == 2


def test_oracle_beats_random_cartpole():
    cfg = Config()
    oracle = evaluate_policy(
        "oracle", "oderl-cartpole", 1, seeds=[0], config=cfg, roll_outs=200, time_steps=30
    )
    random = evaluate_policy("random", "oderl-cartpole", 1, seeds=[0], config=cfg)
    assert oracle["total_reward"] > random["total_reward"] + 1000.0


def test_rollout_samples_deterministic_equivalence(key):
    """M>1 with deterministic dynamics gives exactly the M=1 result."""
    env, cfg1, params, dyn, cost = _pendulum_planner(K=32, T=8)
    import dataclasses
    cfgM = dataclasses.replace(cfg1, rollout_samples=3, rollout_var_cost=10.0)
    U = mppi_reset(key, cfg1, params)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    buf = jnp.zeros((4, 1))
    a1, U1, aux1 = mppi_command(cfg1, params, dyn, cost, U, obs, buf, key)
    aM, UM, auxM = mppi_command(cfgM, params, dyn, cost, U, obs, buf, key)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(aM), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(aux1["cost_total"]), np.asarray(auxM["cost_total"]), atol=1e-9
    )


def test_rollout_var_cost_penalizes_spread(key):
    """A dynamics whose M-slices diverge accrues the discounted variance
    penalty: with per-slice offsets m (m=0..M-1) and cost=state[0], the
    variance at step t is var([0,1,2]*t... analytically checked."""
    K, T, M = 2, 3, 3
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=1, u_scale=1.0, u_min=-9.0, u_max=9.0,
        rollout_samples=M, rollout_var_cost=1.0, rollout_var_discount=0.5,
    )
    params = make_mppi_params(jnp.asarray([[1e-18]], dtype=jnp.float64))

    def dynamics(state, window):
        m_index = jnp.arange(state.shape[0]) // K  # 0,0,1,1,2,2
        return state + m_index[:, None].astype(state.dtype)

    def cost_fn(state, action):
        return state[:, 0]

    U = jnp.zeros((T, 1), dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.zeros((4, 1), dtype=jnp.float64)
    _, _, aux = mppi_command(cfg, params, dynamics, cost_fn, U, obs, buf, key)
    # state after step t (t=0,1,2) in slice m: (t+1)*m; cost per step mean_m =
    # (t+1)*mean([0,1,2]) = t+1; sum over t = 6.
    # var_m at step t = (t+1)^2 * var([0,1,2]) = (t+1)^2 * 2/3;
    # discounted sum = 2/3*(1*1 + 4*0.5 + 9*0.25) = 2/3*5.25 = 3.5
    np.testing.assert_allclose(np.asarray(aux["cost_total"]), 6.0 + 3.5, atol=1e-9)


def test_step_dependent_dynamics_and_u_per_command(key):
    K, T = 2, 4
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=1, u_scale=1.0, u_min=-9.0, u_max=9.0,
        step_dependent_dynamics=True, u_per_command=2,
    )
    params = make_mppi_params(jnp.asarray([[1e-18]], dtype=jnp.float64))

    def dynamics(state, window, t):
        return state + t.astype(state.dtype)  # uses the horizon index

    def cost_fn(state, action):
        return state[:, 0]

    U = jnp.zeros((T, 1), dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.zeros((4, 1), dtype=jnp.float64)
    action, _, aux = mppi_command(cfg, params, dynamics, cost_fn, U, obs, buf, key)
    assert action.shape == (2, 1)  # u_per_command leading actions
    # states: 0, 1, 3, 6 -> cost 10
    np.testing.assert_allclose(np.asarray(aux["cost_total"]), 10.0, atol=1e-9)


def test_step_dependent_carried_dynamics(key):
    """step_dependent_dynamics must reach the carried-dynamics branch too
    (regression: the t index was silently dropped)."""
    K, T = 2, 3
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=1, u_scale=1.0, u_min=-9.0, u_max=9.0,
        step_dependent_dynamics=True,
    )
    params = make_mppi_params(jnp.asarray([[1e-18]], dtype=jnp.float64))

    def carry_init(state0):
        return jnp.zeros_like(state0)

    def dynamics(carry, state, window, t):
        carry = carry + 1.0
        return carry, state + t.astype(state.dtype) + carry[:, :1] * 0.0

    def cost_fn(state, action):
        return state[:, 0]

    U = jnp.zeros((T, 1), dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.zeros((4, 1), dtype=jnp.float64)
    _, _, aux = mppi_command(cfg, params, dynamics, cost_fn, U, obs, buf, key,
                             dynamics_carry_init=carry_init)
    # states: 0, 1, 3 -> cost 4
    np.testing.assert_allclose(np.asarray(aux["cost_total"]), 4.0, atol=1e-9)


def test_rollout_states_visualization(key):
    """mppi_rollout_states (reference get_rollouts :358-381): rolling the
    mean plan U through a known linear dynamics gives the analytic states."""
    from neurallaplacecontrol_tpu.planners import mppi_rollout_states

    cfg = MPPIConfig(num_samples=4, horizon=3, nu=1, u_scale=2.0, u_min=-9.0, u_max=9.0)

    def dynamics(state, window):
        return state + window[:, -1, :]  # integrate the current action

    U = jnp.asarray([[0.5], [1.0], [-0.5]], dtype=jnp.float64)
    obs = jnp.zeros((1,), dtype=jnp.float64)
    buf = jnp.zeros((4, 1), dtype=jnp.float64)
    states = mppi_rollout_states(cfg, dynamics, obs, U, buf, num_rollouts=2)
    assert states.shape == (2, 3, 1)
    # scaled actions 1.0, 2.0, -1.0 -> cumulative states 1, 3, 2
    np.testing.assert_allclose(np.asarray(states[0, :, 0]), [1.0, 3.0, 2.0], atol=1e-12)


def test_evaluate_policy_accepts_generator_seeds():
    res = evaluate_policy(
        "random", "oderl-pendulum", 0, seeds=(s for s in [0, 1]),
        config=Config(dt=0.5),
    )
    assert len(res["total_rewards"]) == 2 and res["seeds"] == [0, 1]


def test_scan_unroll_parity(key):
    """scan_unroll is semantics-neutral: same ops per step, so the planned
    action and aux costs match the rolled scan bit-for-bit (the episode-level
    check rides scripts/bench_unroll.py, which asserts equal returns)."""
    env, cfg, params, dyn, cost = _pendulum_planner(K=32, T=9, delay=1)
    import dataclasses

    U = mppi_reset(key, cfg, params)
    obs = env.observe(jnp.asarray([0.4, -1.2]))
    buf = jnp.full((4, 1), 0.3)
    a1, U1, aux1 = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    for unroll in (2, 4):  # 4 does not divide T=9: remainder path covered
        cfg_u = dataclasses.replace(cfg, scan_unroll=unroll)
        a2, U2, aux2 = mppi_command(cfg_u, params, dyn, cost, U, obs, buf, key)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))
        np.testing.assert_array_equal(
            np.asarray(aux1["cost_total"]), np.asarray(aux2["cost_total"])
        )


def test_run_mppi_online_retraining():
    """run_mppi (reference planners/mppi_delay.py:384-410 equivalent): the
    online loop steps the real env, ring-buffers (obs, action), fires the
    retrain callback on the reference's cadence (every retrain_after_iter,
    skipping i=0), rebuilds the planner dynamics with the returned params,
    and accumulates a finite total reward."""
    import numpy as np

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.planners import (
        MPPIConfig,
        default_noise_sigma,
        make_mppi_params,
        run_mppi,
    )
    from neurallaplacecontrol_tpu.training.rollout import (
        build_learned_dynamics,
        build_running_cost,
    )

    env = make_env("oderl-pendulum", dt=0.05)
    spec = env.spec
    model = make_model("rnn", "oderl-pendulum", spec.n_obs, spec.m,
                       spec.action_high, Config())
    params0 = model.init(jax.random.PRNGKey(0))
    cfg = MPPIConfig(num_samples=16, horizon=4, nu=spec.m,
                     u_scale=spec.action_high, u_min=-spec.action_high,
                     u_max=spec.action_high)
    mp = make_mppi_params(default_noise_sigma(spec.m, 1.0))

    calls = []

    def retrain(dataset, params):
        # the reference hands over the ring buffer and may mutate the model
        calls.append(np.array(dataset, copy=True))
        return params

    total, dataset = run_mppi(
        env, cfg, mp,
        make_dynamics=lambda p: build_learned_dynamics(
            env, model.apply, p, cfg.num_samples, spec.dt
        ),
        running_cost=build_running_cost(env),
        model_params=params0,
        key=jax.random.PRNGKey(3),
        retrain_dynamics=retrain,
        retrain_after_iter=10,
        iters=25,
        delay=1,
    )
    assert np.isfinite(total)
    assert dataset.shape == (10, spec.n_obs + spec.m)
    # reference cadence: fires at i=10 and i=20, not at i=0
    assert len(calls) == 2
    # the ring held a full cycle of real transitions at each retrain
    for d in calls:
        assert np.isfinite(d).all()
        assert (np.abs(d[:, -spec.m:]) <= spec.action_high + 1e-6).all()

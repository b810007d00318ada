"""Latent-ODE model tests: shapes, VAE training signal, carried-dynamics
planning path, adaptive decoder solver."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.models.latent_ode import make_carried_dynamics
from neurallaplacecontrol_tpu.ops.integrate import odeint_dopri5


def _setup(env_name="oderl-pendulum", dtype=jnp.float64):
    env = make_env(env_name)
    model = make_model(
        "latent_ode", env_name, env.spec.n_obs, env.spec.m, env.spec.action_high,
        Config(), dtype=dtype,
    )
    params = model.init(jax.random.PRNGKey(0))
    return env, model, params


def test_apply_shapes_and_finite():
    env, model, params = _setup()
    B = 5
    obs = jax.random.normal(jax.random.PRNGKey(1), (B, 3), dtype=jnp.float64)
    abuf = jax.random.uniform(jax.random.PRNGKey(2), (B, 4, 1), dtype=jnp.float64)
    ts = jnp.full((B, 1), 0.05, dtype=jnp.float64)
    out = model.apply(params, obs, abuf, ts)
    assert out.shape == (B, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    out_jit = jax.jit(model.apply)(params, obs, abuf, ts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_jit), rtol=1e-8)


def test_train_step_decreases_on_fixed_batch():
    env, model, params = _setup()
    key = jax.random.PRNGKey(3)
    B, A = 8, 4
    hist_s = jax.random.normal(key, (B, A, 3), dtype=jnp.float64) * 0.5
    hist_a = jax.random.uniform(jax.random.fold_in(key, 1), (B, A, 1), dtype=jnp.float64)
    ts = jnp.full((B, 1), 0.05, dtype=jnp.float64)
    target = 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (B, 3), dtype=jnp.float64)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        loss, grads = jax.value_and_grad(
            lambda p: model.train_step(p, k, hist_s, hist_a, ts, target)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(150):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 10.0, (losses[0], losses[-1])


def test_grads_flow_everywhere():
    env, model, params = _setup()
    key = jax.random.PRNGKey(0)
    hist_s = jnp.ones((4, 4, 3), dtype=jnp.float64) * 0.1
    hist_a = jnp.ones((4, 4, 1), dtype=jnp.float64) * 0.2
    ts = jnp.full((4, 1), 0.05, dtype=jnp.float64)
    target = jnp.zeros((4, 3), dtype=jnp.float64)
    grads = jax.grad(lambda p: model.train_step(p, key, hist_s, hist_a, ts, target))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero >= len(leaves) - 1  # enc std path may be zero at init


def test_carried_dynamics_rolls_history():
    env, model, params = _setup()
    carry_init, dynamics = make_carried_dynamics(model, params, 0.05, 3, 1)
    K = 6
    state0 = jnp.ones((K, 3), dtype=jnp.float64) * 0.3
    carry = carry_init(state0)
    assert carry.shape == (K, 4, 3)
    window = jnp.zeros((K, 4, 1), dtype=jnp.float64)
    carry2, state1 = dynamics(carry, state0 * 2.0, window)
    # newest slot now holds the state passed in
    np.testing.assert_allclose(np.asarray(carry2[:, -1]), np.asarray(state0 * 2.0))
    assert state1.shape == (K, 3)


def test_dopri5_matches_closed_form():
    """Adaptive decoder solver sanity: dy/dt = -y from 1.0."""
    ts = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float64)
    ys = odeint_dopri5(lambda y, t: -y, jnp.asarray([1.0], dtype=jnp.float64), ts)
    np.testing.assert_allclose(
        np.asarray(ys[:, 0]), np.exp(-np.asarray(ts)), rtol=1e-4
    )


def test_dopri5_grad_and_vmap():
    ts = jnp.asarray([0.0, 1.0], dtype=jnp.float64)

    def solve(a):
        ys = odeint_dopri5(lambda y, t: -a * y, jnp.ones((1,), dtype=jnp.float64), ts)
        return ys[-1, 0]

    g = jax.grad(solve)(1.0)
    # d/da exp(-a) at a=1 = -exp(-1)
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-3)
    vals = jax.vmap(solve)(jnp.asarray([0.5, 1.0, 2.0], dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(vals), np.exp([-0.5, -1.0, -2.0]), rtol=2e-3)


def test_latent_ode_episode_runs():
    """Untrained latent-ODE through the full eval path (tiny K/T)."""
    from neurallaplacecontrol_tpu.training import evaluate_policy

    env, model, params = _setup()
    res = evaluate_policy(
        "latent_ode", "oderl-pendulum", 0, seeds=[0],
        config=Config(), model_apply=model, params=params,
        roll_outs=16, time_steps=5,
    )
    assert np.isfinite(res["total_reward"])


def test_dopri5_stats_and_decoder_nfes(key):
    """odeint_dopri5_with_stats counts accepted steps; the stats-solver's
    solution is identical to odeint_dopri5; the latent-ODE model surfaces
    decoder nfes (w_latent_ode._get_and_reset_nfes analog)."""
    import jax.numpy as jnp
    import numpy as np
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.ops.integrate import (
        odeint_dopri5,
        odeint_dopri5_with_stats,
    )

    rhs = lambda y, t: -y  # noqa: E731
    y0 = jnp.ones(3)
    ts = jnp.asarray([0.0, 0.5, 1.0])
    ys = odeint_dopri5(rhs, y0, ts)
    ys2, n_acc = odeint_dopri5_with_stats(rhs, y0, ts)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(ys2))
    assert n_acc.shape == (2,)
    assert int(n_acc.min()) >= 1

    model = make_model("latent_ode", "oderl-pendulum", 3, 1, 2.0, dtype=jnp.float64)
    params = model.init(key)
    obs = jnp.zeros((2, 3)).at[:, 0].set(1.0)
    buf = jnp.zeros((2, 4, 1))
    ts_pred = jnp.full((2, 1), 0.05)
    nfes = model.decoder_nfes(params, obs, buf, ts_pred)
    assert int(nfes.min()) >= 7


def test_predict_diff_per_row_horizons(key):
    """Each batch row decodes at its OWN horizon: swapping a row's horizon
    changes that row's output and only that row's."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurallaplacecontrol_tpu.models import make_model

    model = make_model("latent_ode", "oderl-pendulum", 3, 1, 2.0, dtype=jnp.float64)
    params = model.init(key)
    obs = jnp.zeros((2, 4, 3)).at[..., 0].set(1.0)
    act = jnp.zeros((2, 4, 1)) + 0.3
    ts_a = jnp.asarray([[0.05], [0.05]])
    ts_b = jnp.asarray([[0.05], [0.50]])  # row 1 horizon changes
    out_a, _ = model.predict_diff(params, key, obs, act, ts_a)
    out_b, _ = model.predict_diff(params, key, obs, act, ts_b)
    np.testing.assert_allclose(np.asarray(out_a[0, 0]), np.asarray(out_b[0, 0]), atol=1e-12)
    assert float(jnp.abs(out_a[0, 1] - out_b[0, 1]).max()) > 1e-6


@pytest.mark.slow
def test_train_model_forwards_budget_override(tmp_path):
    """Regression (r3): train_model must forward end_training_after_seconds
    to the latent_ode trainer — before the fix the override was dropped and
    config.end_training_after_seconds (180 s default) silently capped every
    latent_ode run, including the driver's --train_seconds 8100."""
    from neurallaplacecontrol_tpu.training import train_model

    cfg = Config(
        dt=0.5,
        train_with_expert_trajectories=False,
        train_samples_per_dim=3,
        saved_models_path=str(tmp_path) + "/",
        end_training_after_seconds=600.0,  # config says 10 min...
        iters_per_log=50,
    )
    _, _, res = train_model(
        "latent_ode", "oderl-pendulum", cfg, delay=0,
        retrain=True, force_retrain=True,
        end_training_after_seconds=6.0,  # ...caller says 6 s — must win
    )
    assert res["train_seconds"] < 120.0, res["train_seconds"]


def test_latent_ode_ref_episode_runs():
    """The reference-layout twin (models/latent_ode_ref.py) plans through the
    standard eval path: make_model('latent_ode_ref') + evaluate_policy, the
    route a transplanted reference .pt checkpoint takes (interop docstring)."""
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config()
    model = make_model("latent_ode_ref", "oderl-pendulum", 3, 1, 2.0, cfg)
    params = model.init(jax.random.PRNGKey(0))
    res = evaluate_policy(
        "latent_ode_ref", "oderl-pendulum", 0, seeds=[0],
        config=cfg, model_apply=model.apply, params=params,
        roll_outs=16, time_steps=5,
    )
    assert np.isfinite(res["total_reward"])

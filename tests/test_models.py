"""Model-family tests: shapes, jit/vmap/grad cleanliness, parameter counts,
and single-batch overfitting (does each model actually learn?)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model, count_params

MODELS = ["nl", "rnn", "delta_t_rnn", "node"]


def _setup(model_name, env_name="oderl-pendulum", dtype=jnp.float64):
    env = make_env(env_name)
    model = make_model(
        model_name,
        env_name,
        env.spec.n_obs,
        env.spec.m,
        env.spec.action_high,
        Config(),
        dtype=dtype,
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    B, A = 6, 4
    obs = jax.random.normal(jax.random.fold_in(key, 1), (B, env.spec.n_obs), dtype=dtype)
    abuf = jax.random.uniform(
        jax.random.fold_in(key, 2), (B, A, env.spec.m), minval=-2, maxval=2, dtype=dtype
    )
    ts = jnp.full((B, 1), 0.05, dtype=dtype)
    return env, model, params, obs, abuf, ts


@pytest.mark.parametrize("model_name", MODELS)
def test_shapes_and_jit(model_name):
    env, model, params, obs, abuf, ts = _setup(model_name)
    out = model.apply(params, obs, abuf, ts)
    assert out.shape == (obs.shape[0], env.spec.n_obs)
    out_jit = jax.jit(model.apply)(params, obs, abuf, ts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_jit), rtol=1e-10)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("model_name", MODELS)
def test_grad_flows_to_all_params(model_name):
    _, model, params, obs, abuf, ts = _setup(model_name)

    def loss(p):
        return jnp.sum(model.apply(p, obs, abuf, ts) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero == len(leaves), f"{nonzero}/{len(leaves)} grads nonzero"


@pytest.mark.parametrize("model_name", MODELS)
def test_vmap_over_batch_equals_batched(model_name):
    _, model, params, obs, abuf, ts = _setup(model_name)
    batched = model.apply(params, obs, abuf, ts)
    single = jax.vmap(
        lambda o, a, t: model.apply(params, o[None], a[None], t[None])[0]
    )(obs, abuf, ts)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-7, atol=1e-9)


def test_nl_param_count_matches_reference_shape():
    """NL on cartpole: encoder GRU(1->64,2 layers)+linear(64->2), rep MLP
    (2*17+7 -> 128 -> 128 -> 2*17*5). Counts derived from w_nl.py:89-100."""
    _, model, params, *_ = _setup("nl", "oderl-cartpole")
    gru = 3 * 64 * (1 + 64) + 3 * 64 * 2 + (3 * 64 * (64 + 64) + 3 * 64 * 2)
    enc_out = 64 * 2 + 2
    mlp = (41 * 128 + 128) + (128 * 128 + 128) + (128 * 170 + 170)
    assert count_params(params) == gru + enc_out + mlp


def test_nl_time_dependence_is_smooth():
    """The ILT gives NL an explicit, smooth dependence on the horizon ts —
    the property that distinguishes it from RNN (which ignores ts)."""
    _, model, params, obs, abuf, _ = _setup("nl")

    def at(t):
        return np.asarray(
            model.apply(params, obs[:1], abuf[:1], jnp.full((1, 1), t, jnp.float64))[0]
        )

    for t in (0.02, 0.05, 0.2, 0.39):
        f0, f1 = at(t), at(t + 1e-7)
        assert np.all(np.isfinite(f0))
        # continuous in t (init-scale outputs can be large — the fourier
        # prefactor e^{sigma t}/T is O(1e3/T); training shrinks them, same
        # as the reference parameterization)
        np.testing.assert_allclose(f1, f0, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_name", MODELS)
def test_overfit_small_batch(model_name):
    """Each model can fit 8 (s, a-buffer, ts) -> Δs pairs: loss drops >100x."""
    import optax

    env, model, params, obs, abuf, ts = _setup(model_name)
    key = jax.random.PRNGKey(3)
    target = 0.1 * jax.random.normal(key, (obs.shape[0], env.spec.n_obs), dtype=jnp.float64)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, obs, abuf, ts)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(400):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] / 100.0, f"{model_name}: {losses[0]} -> {losses[-1]}"


@pytest.mark.slow
def test_nl_bf16_compute_matches_f32():
    """nl_compute_dtype='bfloat16' runs the GRU+MLP stack in bf16 on the
    MXU while the sphere/ILT stay f32: on a TRAINED checkpoint (an
    untrained model's pole-scale outputs amplify any perturbation — see
    artifacts/pallas_accuracy_r3.json) outputs track the f32 model to bf16
    resolution (measured: max rel 4.8%, median 0.37% at B=512), gradients
    stay finite, and the params pytree is unchanged so checkpoints are
    interchangeable between the two modes."""
    import os

    env = make_env("oderl-cartpole")
    kw = dict(dtype=jnp.float32)
    m32 = make_model("nl", "oderl-cartpole", env.spec.n_obs, env.spec.m,
                     env.spec.action_high, Config(), **kw)
    mbf = make_model("nl", "oderl-cartpole", env.spec.n_obs, env.spec.m,
                     env.spec.action_high,
                     Config(nl_compute_dtype="bfloat16"), **kw)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape and a.dtype == b.dtype,
        m32.init(jax.random.PRNGKey(0)), mbf.init(jax.random.PRNGKey(0))))
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    ckpt = resolve_checkpoint(
        model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True)
    )
    params = load_pytree(ckpt, m32.init(jax.random.PRNGKey(0)))
    key = jax.random.PRNGKey(3)
    B = 512
    obs = jax.random.normal(key, (B, env.spec.n_obs), jnp.float32)
    abuf = jax.random.uniform(jax.random.fold_in(key, 1), (B, 4, env.spec.m),
                              jnp.float32, minval=-3, maxval=3)
    ts = jnp.full((B, 1), 0.05, jnp.float32)
    a = jax.jit(m32.apply)(params, obs, abuf, ts)
    b = jax.jit(mbf.apply)(params, obs, abuf, ts)
    assert b.dtype == jnp.float32
    rel = np.abs(np.asarray(a - b)) / (1.0 + np.abs(np.asarray(a)))
    assert np.all(np.isfinite(np.asarray(b)))
    assert rel.max() < 0.10, rel.max()  # bf16 resolution through the ILT
    assert np.median(rel) < 0.01, np.median(rel)

    def loss(p):
        return jnp.mean(mbf.apply(p, obs, abuf, ts) ** 2)

    grads = jax.grad(loss)(params)
    assert jax.tree.all(jax.tree.map(lambda g: bool(jnp.all(jnp.isfinite(g))), grads))

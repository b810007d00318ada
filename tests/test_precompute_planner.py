"""Planner window-encoder precompute path (Config.nl_planner_precompute).

MPPI samples every candidate action BEFORE the rollout, and the NL model's
reverse-GRU window encoding is state-independent (w_nl.py:117-127) — so all
K x T windows can encode in ONE batched call ahead of the horizon scan
(planners.mppi_delay ``window_encoder``). These tests pin that the hoisted
path is the SAME math: encoder+decoder == apply on a trained checkpoint, the
full planning step matches the plain path for every feature flag, and the
K-sharded planner with an encoder still matches single-chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
    mppi_reset,
)
from neurallaplacecontrol_tpu.training import build_running_cost
from neurallaplacecontrol_tpu.training.rollout import (
    build_learned_dynamics,
    build_learned_dynamics_encoded,
)
from neurallaplacecontrol_tpu.utils.checkpoint import (
    load_pytree,
    model_checkpoint_name,
    resolve_checkpoint,
)

_CKPT = resolve_checkpoint(
    model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True)
)


def _trained_nl(config=None, encode_obs_time=False):
    config = config or Config()
    if encode_obs_time:
        config = Config(encode_obs_time=True)
    env = make_env("oderl-cartpole")
    model = make_model(
        "nl", "oderl-cartpole", env.spec.n_obs, env.spec.m,
        env.spec.action_high, config, dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0))
    if not encode_obs_time:  # the shipped checkpoint is encode_obs_time=False
        params = load_pytree(_CKPT, params)
    else:
        # untrained NL params emit pole-scale outputs (|Δs| ~ 1e4; see
        # CLAUDE.md landmine) which amplify chaotically over a rollout and
        # would swamp a path-equality comparison — shrink to a benign scale
        params = jax.tree.map(lambda x: x * 0.05, params)
    return env, model, params


def test_encoded_apply_matches_apply():
    """apply(o, w, ts) == apply_encoded(o, encode(w), ts) on a trained
    checkpoint — identical ops, only the GRU's GEMM batch shape differs."""
    env, model, params = _trained_nl()
    key = jax.random.PRNGKey(7)
    K, T, A = 13, 6, 4
    windows = jax.random.uniform(
        key, (K, T, A, env.spec.m), jnp.float32, minval=-3, maxval=3
    )
    obs = jax.random.normal(jax.random.fold_in(key, 1), (K, env.spec.n_obs), jnp.float32)
    ts = jnp.full((K, 1), 0.05, jnp.float32)

    encode = model.make_planner_window_encoder(params)
    latents = jax.jit(encode)(windows)  # [K, T, 2]
    assert latents.shape == (K, T, 2)

    for t in [0, 3, T - 1]:
        direct = jax.jit(model.apply)(params, obs, windows[:, t], ts)
        hoisted = jax.jit(model.apply_encoded)(params, obs, latents[:, t], ts)
        np.testing.assert_allclose(
            np.asarray(hoisted), np.asarray(direct), rtol=2e-5, atol=2e-6
        )


def test_encoded_apply_matches_apply_f64():
    """The identity must also hold at f64 (jax_enable_x64 is the suite's
    parity regime): the encoder hook follows the input dtype like apply()
    does instead of hardcoding f32 — a hardcoded-f32 latent would cap the
    agreement at f32 epsilon and break any tight f64 parity assertion."""
    env, model, params = _trained_nl()
    params64 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    key = jax.random.PRNGKey(11)
    K, T, A = 7, 5, 4
    windows = jax.random.uniform(
        key, (K, T, A, env.spec.m), jnp.float64, minval=-3, maxval=3
    )
    obs = jax.random.normal(
        jax.random.fold_in(key, 1), (K, env.spec.n_obs), jnp.float64
    )
    ts = jnp.full((K, 1), 0.05, jnp.float64)

    encode = model.make_planner_window_encoder(params64)
    latents = jax.jit(encode)(windows)
    assert latents.dtype == jnp.float64  # follows the window dtype

    direct = jax.jit(model.apply)(params64, obs, windows[:, 2], ts)
    hoisted = jax.jit(model.apply_encoded)(params64, obs, latents[:, 2], ts)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(direct), rtol=1e-12, atol=1e-13
    )


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"sample_null_action": True},
        {"noise_abs_cost": True},
        {"rollout_samples": 3, "rollout_var_cost": 0.5},
        {"encode_obs_time": True},
    ],
    ids=["plain", "null_action", "abs_noise", "m_samples", "obs_time"],
)
def test_mppi_command_window_encoder_matches_plain(flags):
    """The full planning step with the encoder hoisted matches the plain
    per-step path for every planner feature flag."""
    encode_obs_time = flags.get("encode_obs_time", False)
    env, model, params = _trained_nl(encode_obs_time=encode_obs_time)
    spec = env.spec
    K, T = 32, 7
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=spec.m, u_scale=spec.action_high,
        u_min=-spec.action_high, u_max=spec.action_high, dt=0.05, **flags,
    )
    mppi_params = make_mppi_params(default_noise_sigma(spec.m, 1.0))
    cost = build_running_cost(env)

    dyn_plain = build_learned_dynamics(env, model.apply, params, K, cfg.dt)
    encoder, dyn_enc = build_learned_dynamics_encoded(model, params, cfg.dt)

    key = jax.random.PRNGKey(11)
    U = mppi_reset(key, cfg, mppi_params)
    obs = env.observe(env.reset(jax.random.fold_in(key, 1)))
    buf = 0.3 * jnp.ones((4, spec.m))
    tb = jnp.flip(jnp.arange(4, dtype=jnp.float32)) * cfg.dt if encode_obs_time else None

    a0, U0, aux0 = jax.jit(
        lambda U, k: mppi_command(
            cfg, mppi_params, dyn_plain, cost, U, obs, buf, k, time_buffer=tb
        )
    )(U, key)
    a1, U1, aux1 = jax.jit(
        lambda U, k: mppi_command(
            cfg, mppi_params, dyn_enc, cost, U, obs, buf, k,
            time_buffer=tb, window_encoder=encoder,
        )
    )(U, key)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(aux1["cost_total"]), np.asarray(aux0["cost_total"]),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_sharded_window_encoder_matches_single():
    """K-sharded planner with the window encoder == single-chip with the
    window encoder (each shard encodes its local K/n window slice)."""
    from jax.sharding import Mesh

    from neurallaplacecontrol_tpu.parallel import make_k_sharded_mppi_command

    env, model, params = _trained_nl()
    spec = env.spec
    n_dev = len(jax.devices())
    K, T = 8 * n_dev, 5
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=spec.m, u_scale=spec.action_high,
        u_min=-spec.action_high, u_max=spec.action_high, dt=0.05,
    )
    mppi_params = make_mppi_params(default_noise_sigma(spec.m, 1.0))
    cost = build_running_cost(env)
    encoder, dyn_enc = build_learned_dynamics_encoded(model, params, cfg.dt)

    key = jax.random.PRNGKey(3)
    U = mppi_reset(key, cfg, mppi_params)
    obs = env.observe(env.reset(jax.random.fold_in(key, 1)))
    buf = jnp.zeros((4, spec.m))

    a_single, U_single, _ = mppi_command(
        cfg, mppi_params, dyn_enc, cost, U, obs, buf, key, window_encoder=encoder
    )
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("k",))
    command = make_k_sharded_mppi_command(
        cfg, mppi_params, dyn_enc, cost, mesh, window_encoder=encoder
    )
    a_shard, U_shard, _ = command(U, obs, buf, key)

    np.testing.assert_allclose(np.asarray(a_shard), np.asarray(a_single), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(U_shard), np.asarray(U_single), rtol=1e-5, atol=1e-6)


def test_evaluate_policy_precompute_flag():
    """End-to-end: evaluate_policy with nl_planner_precompute=True produces
    (numerically near-identical) episode returns vs the default path."""
    from neurallaplacecontrol_tpu.training import evaluate_policy

    env, model, params = _trained_nl()
    common = dict(
        seeds=[0, 1], model_apply=model.apply, params=params,
    )
    cfg_off = Config(mppi_roll_outs=48, mppi_time_steps=6)
    cfg_on = Config(
        mppi_roll_outs=48, mppi_time_steps=6, nl_planner_precompute=True
    )
    r_off = evaluate_policy("nl", "oderl-cartpole", 1, config=cfg_off, **common)
    r_on = evaluate_policy("nl", "oderl-cartpole", 1, config=cfg_on, **common)
    np.testing.assert_allclose(
        np.asarray(r_on["total_reward"]), np.asarray(r_off["total_reward"]),
        rtol=1e-4, atol=1e-3,
    )

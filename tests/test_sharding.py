"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
dp+tp train step and K-sharded MPPI must match single-chip numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.parallel import (
    make_k_sharded_mppi_command,
    make_mesh,
    make_sharded_train_step,
    shard_params,
)
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
)
from neurallaplacecontrol_tpu.training.rollout import (
    build_oracle_dynamics,
    build_running_cost,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _model_and_batch(dtype=jnp.float32):
    model = make_model("nl", "oderl-cartpole", 5, 1, 3.0, Config(), dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    B = 32
    s0 = jax.random.normal(key, (B, 5), dtype)
    a0 = jax.random.normal(jax.random.fold_in(key, 1), (B, 4, 1), dtype)
    sn = s0 + 0.01
    ts = jnp.full((B, 1), 0.05, dtype)
    return model, params, (s0, a0, sn, ts)


def test_mesh_shape():
    mesh = make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")


def test_derive_param_pspecs_covers_model_families():
    """nl + node expose their MLP stacks to tp; rnn falls back to dp-only."""
    from jax.sharding import PartitionSpec as P

    from neurallaplacecontrol_tpu.parallel.sharding import derive_param_pspecs

    nl = make_model("nl", "oderl-cartpole", 5, 1, 3.0, Config())
    specs = derive_param_pspecs(nl.init(jax.random.PRNGKey(0)))
    assert specs["laplace_rep"][0]["w"] == P(None, "tp")
    assert specs["laplace_rep"][1]["w"] == P("tp", None)
    assert specs["laplace_rep"][2]["w"] == P(None, "tp")
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs["encoder"], is_leaf=lambda x: isinstance(x, P)))

    node = make_model("node", "oderl-cartpole", 5, 1, 3.0, Config())
    specs = derive_param_pspecs(node.init(jax.random.PRNGKey(0)))
    assert specs["ode_func"][0]["w"] == P(None, "tp")
    assert specs["ode_func"][1]["w"] == P("tp", None)

    rnn = make_model("rnn", "oderl-cartpole", 5, 1, 3.0, Config())
    specs = derive_param_pspecs(rnn.init(jax.random.PRNGKey(0)))
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))


@pytest.mark.parametrize("model_name", ["rnn", "node"])
def test_sharded_train_step_other_families(model_name):
    """The mesh training step is model-agnostic: tp shards node's ode_func
    MLP, rnn trains dp-only — both must match single-device numerics with
    the vma check enabled."""
    model = make_model(model_name, "oderl-cartpole", 5, 1, 3.0, Config())
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    B = 32
    s0 = jax.random.normal(key, (B, 5), jnp.float32)
    a0 = jax.random.normal(jax.random.fold_in(key, 1), (B, 4, 1), jnp.float32)
    sn = s0 + 0.01
    ts = jnp.full((B, 1), 0.05, jnp.float32)
    optimizer = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-4))

    @jax.jit
    def ref_step(p, o):
        def loss_fn(p):
            pred = model.apply(p, s0, a0, ts)
            return jnp.mean((pred - (sn - s0)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, _, loss_ref = ref_step(params, optimizer.init(params))

    mesh = make_mesh(8, tp=2)
    params_sh = shard_params(params, mesh)
    step = make_sharded_train_step(model.apply, optimizer, mesh)
    p_sh, _, loss_sh = step(params_sh, optimizer.init(params_sh), s0, a0, sn, ts)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(jax.device_get(p_sh))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_sharded_train_step_matches_single_device():
    model, params, (s0, a0, sn, ts) = _model_and_batch()
    optimizer = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-4))

    # single-device reference
    opt_state = optimizer.init(params)

    @jax.jit
    def ref_step(p, o, s0, a0, sn, ts):
        def loss_fn(p):
            pred = model.apply(p, s0, a0, ts)
            return jnp.mean((pred - (sn - s0)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, _, loss_ref = ref_step(params, opt_state, s0, a0, sn, ts)

    # sharded
    mesh = make_mesh(8, tp=2)
    params_sh = shard_params(params, mesh)
    opt_state_sh = optimizer.init(params_sh)
    step = make_sharded_train_step(model.apply, optimizer, mesh)
    p_sh, _, loss_sh = step(params_sh, opt_state_sh, s0, a0, sn, ts)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_sh = jax.tree_util.tree_leaves(jax.device_get(p_sh))
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_k_sharded_mppi_matches_single_chip():
    """Same key => same noise => the sharded command must reproduce the
    single-chip mppi_command exactly (collectives only reorder reductions)."""
    from neurallaplacecontrol_tpu.planners import mppi_command

    env = make_env("oderl-cartpole")
    K, T = 64, 6
    cfg = MPPIConfig(num_samples=K, horizon=T, nu=1, u_scale=3.0, u_min=-3.0, u_max=3.0)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    dyn = build_oracle_dynamics(env, K, 0.05, 1)
    cost = build_running_cost(env)
    mesh = make_mesh(8, tp=2)
    command = make_k_sharded_mppi_command(cfg, params, dyn, cost, mesh)

    key = jax.random.PRNGKey(5)
    U = jnp.zeros((T, 1), jnp.float64)
    obs = env.observe(jnp.asarray([0.1, -0.2, 3.0, 0.5], jnp.float64))
    buf = jnp.asarray([[0.3], [0.6], [-0.9], [1.2]], jnp.float64)

    a_sh, U_sh, _ = jax.jit(command)(U, obs, buf, key)

    # single-chip with the identical noise draw
    z = jax.random.normal(key, (K, T, 1), dtype=jnp.float64)
    noise = z @ params.noise_chol.T

    # reproduce via mppi_command's internal draw (same key, same shape)
    a_ref, U_ref, _ = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(U_ref), rtol=1e-8)
    del noise


@pytest.mark.parametrize(
    "flags",
    [
        dict(sample_null_action=True),
        dict(noise_abs_cost=True),
        dict(encode_obs_time=True),
        dict(rollout_samples=3, rollout_var_cost=0.5),
        dict(step_dependent_dynamics=True),
        dict(u_per_command=3),
    ],
    ids=lambda f: next(iter(f)),
)
def test_k_sharded_mppi_extended_flags_match_single_chip(flags):
    """Every planner feature flag must behave identically K-sharded and
    single-chip (same code via mppi_command_core; same noise draw)."""
    from neurallaplacecontrol_tpu.planners import mppi_command

    env = make_env("oderl-cartpole")
    K, T = 64, 6
    cfg = MPPIConfig(
        num_samples=K, horizon=T, nu=1, u_scale=3.0, u_min=-3.0, u_max=3.0,
        dt=0.05, **flags,
    )
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    base_dyn = build_oracle_dynamics(env, K, 0.05, 1)
    if cfg.encode_obs_time:
        # strip the age channel the planner appends (the oracle closure is
        # not time-aware; what matters here is window plumbing parity)
        def dyn(state, window):
            return base_dyn(state, window[..., :1])
    elif cfg.step_dependent_dynamics:
        def dyn(state, window, t):
            return base_dyn(state, window) + 1e-4 * t
    else:
        dyn = base_dyn
    cost = build_running_cost(env)
    mesh = make_mesh(8, tp=2)
    command = make_k_sharded_mppi_command(cfg, params, dyn, cost, mesh)

    key = jax.random.PRNGKey(7)
    U = jnp.zeros((T, 1), jnp.float64)
    obs = env.observe(jnp.asarray([0.1, -0.2, 3.0, 0.5], jnp.float64))
    buf = jnp.asarray([[0.3], [0.6], [-0.9], [1.2]], jnp.float64)

    a_sh, U_sh, aux_sh = jax.jit(command)(U, obs, buf, key)
    a_ref, U_ref, aux_ref = mppi_command(cfg, params, dyn, cost, U, obs, buf, key)
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_ref), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(U_ref), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(aux_sh["cost_total"]), np.asarray(aux_ref["cost_total"]), rtol=1e-8
    )


def test_k_sharded_mppi_terminal_and_carried_dynamics():
    """Terminal state cost and carried (stateful) dynamics through the
    sharded path match the single-chip planner."""
    from neurallaplacecontrol_tpu.planners import mppi_command

    env = make_env("oderl-cartpole")
    K, T = 32, 5
    cfg = MPPIConfig(num_samples=K, horizon=T, nu=1, u_scale=3.0, u_min=-3.0, u_max=3.0)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    base_dyn = build_oracle_dynamics(env, K, 0.05, 1)
    cost = build_running_cost(env)

    def terminal(states, actions):  # [K, T, nx], [K, T, nu]
        return jnp.sum(states[:, -1, :] ** 2, axis=-1)

    def carry_init(state0):
        return jnp.zeros((state0.shape[0],), state0.dtype)

    def carried_dyn(carry, state, window):
        carry = carry + jnp.sum(window[:, -1, :], axis=-1)
        return carry, base_dyn(state, window) + 1e-5 * carry[:, None]

    mesh = make_mesh(8, tp=2)
    key = jax.random.PRNGKey(11)
    U = jnp.zeros((T, 1), jnp.float64)
    obs = env.observe(jnp.asarray([0.1, -0.2, 3.0, 0.5], jnp.float64))
    buf = jnp.asarray([[0.3], [0.6], [-0.9], [1.2]], jnp.float64)

    cmd = make_k_sharded_mppi_command(
        cfg, params, base_dyn, cost, mesh, terminal_state_cost=terminal
    )
    a_sh, U_sh, _ = jax.jit(cmd)(U, obs, buf, key)
    a_ref, U_ref, _ = mppi_command(
        cfg, params, base_dyn, cost, U, obs, buf, key, terminal_state_cost=terminal
    )
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(U_ref), rtol=1e-8)

    cmd = make_k_sharded_mppi_command(
        cfg, params, carried_dyn, cost, mesh, dynamics_carry_init=carry_init
    )
    a_sh, U_sh, _ = jax.jit(cmd)(U, obs, buf, key)
    a_ref, U_ref, _ = mppi_command(
        cfg, params, carried_dyn, cost, U, obs, buf, key, dynamics_carry_init=carry_init
    )
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(U_sh), np.asarray(U_ref), rtol=1e-8)


def test_rollout_sharded_eval_matches_unsharded():
    """evaluate_policy(shard_rollouts=True) — the K-sharded planner inside
    the episode scan — must reproduce the single-chip episode returns
    exactly (same keys, same noise tensors)."""
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config(dt=0.5)  # 20-step episodes for CPU speed
    kw = dict(seeds=range(2), config=cfg, roll_outs=16, time_steps=4)
    a = evaluate_policy("oracle", "oderl-pendulum", 1, **kw)
    b = evaluate_policy("oracle", "oderl-pendulum", 1, shard_rollouts=True, **kw)
    np.testing.assert_allclose(a["total_rewards"], b["total_rewards"], rtol=1e-10)


def test_seed_sharded_eval_matches_unsharded():
    """shard_seeds spreads the episode batch over the 8 virtual devices and
    must give byte-identical per-seed returns (episodes are key-deterministic)."""
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config(dt=0.5)  # 20-step episodes for CPU speed
    kw = dict(seeds=range(8), config=cfg, roll_outs=16, time_steps=4)
    a = evaluate_policy("oracle", "oderl-pendulum", 0, **kw)
    b = evaluate_policy("oracle", "oderl-pendulum", 0, shard_seeds=True, **kw)
    np.testing.assert_allclose(a["total_rewards"], b["total_rewards"], rtol=1e-12)


def test_devices_subset_local_mesh_parity():
    """evaluate_policy(devices=...) restricts every shard mesh to an explicit
    device subset — the per-host local mesh the driver's --multihost x
    --shard composition passes (run_exp_multi.py: each pod host shards its
    OWN cells over jax.local_devices()). Returns must match the unsharded
    episode on a 4-device subset of the 8 virtual devices in every mode."""
    import jax

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config(dt=0.5)  # 20-step episodes for CPU speed
    local = jax.devices()[:4]
    kw = dict(seeds=range(4), config=cfg, roll_outs=16, time_steps=4)
    a = evaluate_policy("oracle", "oderl-pendulum", 1, **kw)
    for shard in (
        dict(shard_seeds=True),
        dict(shard_rollouts=True),
        dict(shard_grid=(2, 2)),
    ):
        b = evaluate_policy(
            "oracle", "oderl-pendulum", 1, devices=local, **shard, **kw
        )
        np.testing.assert_allclose(
            a["total_rewards"], b["total_rewards"], rtol=1e-9, err_msg=str(shard)
        )


def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """Save a tp-sharded params pytree with orbax and restore it directly
    onto the mesh placement."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neurallaplacecontrol_tpu.parallel.sharding import make_mesh
    from neurallaplacecontrol_tpu.utils.checkpoint import load_sharded, save_sharded

    mesh = make_mesh(8, tp=2)
    params = {
        "w": jnp.arange(16.0 * 8).reshape(16, 8),
        "b": jnp.arange(8.0),
    }
    shardings = {
        "w": NamedSharding(mesh, P(None, "tp")),
        "b": NamedSharding(mesh, P()),
    }
    sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
    path = save_sharded(tmp_path / "ckpt", sharded)
    restored = load_sharded(path, shardings=shardings)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(params["w"]))
    assert restored["w"].sharding.spec == P(None, "tp")


def test_multihost_helpers_single_process():
    """Single-process passthrough behavior of the multi-host helpers; the
    global mesh covers all 8 virtual devices."""
    from neurallaplacecontrol_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        process_slice,
    )

    initialize()  # no-op on a single host
    assert process_slice(list(range(7))) == list(range(7))
    # simulated 3-process round-robin split covers everything exactly once
    parts = [process_slice(list(range(7)), pid, 3) for pid in range(3)]
    assert sorted(sum(parts, [])) == list(range(7))
    mesh = global_mesh(("dp", "tp"), shape=(4, 2))
    assert mesh.devices.shape == (4, 2)


def _grid_setup(mppi_kwargs=None, settings_kwargs=None, model="oracle"):
    from neurallaplacecontrol_tpu.training.rollout import (
        EpisodeSettings,
        make_batched_episode_fn,
    )

    env = make_env("oderl-pendulum")
    cfg = MPPIConfig(num_samples=32, horizon=6, nu=1, u_scale=2.0,
                     u_min=-2.0, u_max=2.0, **(mppi_kwargs or {}))
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    dyn = build_oracle_dynamics(env, cfg.num_samples, 0.05, 1)
    settings = EpisodeSettings(delay=1, n_steps=10, **(settings_kwargs or {}))
    keys = jnp.stack([jax.random.PRNGKey(s) for s in range(4)])
    ref = make_batched_episode_fn(env, dyn, cfg, params, settings)
    return env, cfg, params, dyn, settings, keys, ref


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_grid_sharded_episodes_match_unsharded(mesh_shape):
    """2-D (seeds x k) mesh: per-seed returns and transition records match
    the unsharded vmapped episode batch (same keys -> same noise draws)."""
    from neurallaplacecontrol_tpu.parallel import make_grid_sharded_episodes

    env, cfg, params, dyn, settings, keys, ref = _grid_setup()
    tot_ref, rec_ref = ref(keys)
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()).reshape(mesh_shape), axis_names=("seeds", "k")
    )
    grid = make_grid_sharded_episodes(env, dyn, cfg, params, settings, mesh)
    tot_g, rec_g = grid(keys)
    np.testing.assert_allclose(np.asarray(tot_ref), np.asarray(tot_g), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rec_ref.sn), np.asarray(rec_g.sn), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rec_ref.a0), np.asarray(rec_g.a0), rtol=1e-9)


def test_grid_sharded_episodes_flags_parity():
    """Planner feature flags (null action pinned to the globally-last
    rollout, abs-noise cost, encode_obs_time ages) behave identically on
    the 2-D mesh — they share mppi_command_core with the single chip."""
    from neurallaplacecontrol_tpu.parallel import make_grid_sharded_episodes

    env, cfg, params, dyn, settings, keys, ref = _grid_setup(
        mppi_kwargs=dict(sample_null_action=True, noise_abs_cost=True,
                         encode_obs_time=True),
        settings_kwargs=dict(encode_obs_time=True),
    )
    tot_ref, rec_ref = ref(keys)
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()).reshape(2, 4), axis_names=("seeds", "k")
    )
    grid = make_grid_sharded_episodes(env, dyn, cfg, params, settings, mesh)
    tot_g, rec_g = grid(keys)
    np.testing.assert_allclose(np.asarray(tot_ref), np.asarray(tot_g), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rec_ref.a0), np.asarray(rec_g.a0), rtol=1e-9)


def test_grid_sharded_eval_matches_unsharded():
    """evaluate_policy(shard_grid=(2, 4)) end-to-end parity."""
    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config(dt=0.5)  # 20-step episodes for CPU speed
    kw = dict(seeds=range(4), config=cfg, roll_outs=16, time_steps=4)
    a = evaluate_policy("oracle", "oderl-pendulum", 1, **kw)
    b = evaluate_policy("oracle", "oderl-pendulum", 1, shard_grid=(2, 4), **kw)
    np.testing.assert_allclose(a["total_rewards"], b["total_rewards"], rtol=1e-9)

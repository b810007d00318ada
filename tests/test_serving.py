"""Serving controller: tick semantics, export roundtrip, compile cache.

The controller is a pure-function packaging of one reference episode-loop
iteration (mppi_with_model.py:244-268); the parity test below asserts its
tick is bit-identical to calling planners.mppi_command by hand with the
same key split.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu import serving
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.planners import mppi_command
from neurallaplacecontrol_tpu.training.rollout import (
    build_oracle_dynamics,
    build_running_cost,
)

CFG = Config(dt=0.05, mppi_roll_outs=16, mppi_time_steps=5)


def _oracle_controller(delay=1, config=CFG):
    return serving.make_controller("oracle", "oderl-pendulum", delay, config)


def test_controller_tick_shapes_and_bounds(key):
    ctrl = _oracle_controller()
    state = ctrl.reset(key)
    env = make_env("oderl-pendulum", dt=CFG.dt)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    for _ in range(3):
        action, state = ctrl.step(state, obs)
    assert action.shape == (1,)
    assert float(jnp.abs(action[0])) <= env.spec.action_high + 1e-6
    assert state.U.shape == (CFG.mppi_time_steps, 1)
    assert state.action_buffer.shape == (CFG.action_buffer_size, 1)
    # newest buffer entry is the just-planned action
    np.testing.assert_allclose(state.action_buffer[-1], action)
    # ages: newest 0, older entries aged by dt per tick
    assert float(state.ages[-1]) == 0.0
    assert np.all(np.diff(np.asarray(state.ages)) <= 0.0)


def test_controller_tick_matches_manual_mppi_command(key):
    """One controller tick == mppi_command with the controller's key split."""
    ctrl = _oracle_controller(delay=0)
    state = ctrl.reset(key)
    env = make_env("oderl-pendulum", dt=CFG.dt)
    obs = env.observe(jnp.asarray([0.3, -0.2]))
    action, new_state = ctrl.step(state, obs)

    _, k_noise = jax.random.split(state.key)
    dynamics = build_oracle_dynamics(env, CFG.mppi_roll_outs, CFG.dt, 0)
    cost = build_running_cost(env)
    from neurallaplacecontrol_tpu.planners import (
        default_noise_sigma,
        make_mppi_params,
    )

    params = make_mppi_params(
        default_noise_sigma(1, CFG.mppi_sigma, dtype=jnp.result_type(float))
    )
    ref_action, ref_U, _ = mppi_command(
        ctrl.mppi_cfg, params, dynamics, cost,
        state.U, obs, state.action_buffer, k_noise,
    )
    np.testing.assert_allclose(np.asarray(action), np.asarray(ref_action), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.U), np.asarray(ref_U), rtol=1e-6)


def test_controller_learned_model_runs(key):
    cfg = Config(dt=0.05, mppi_roll_outs=8, mppi_time_steps=4,
                 nl_hidden_units=16, nl_s_recon_terms=17)
    env = make_env("oderl-pendulum", dt=cfg.dt)
    model = make_model("nl", "oderl-pendulum", env.spec.n_obs, env.spec.m,
                       env.spec.action_high, cfg)
    params = model.init(key)
    ctrl = serving.make_controller(
        "nl", "oderl-pendulum", 1, cfg, model_apply=model.apply, params=params
    )
    state = ctrl.reset(key)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    a1, state = ctrl.step(state, obs)
    a2, state = ctrl.step(state, obs)
    assert np.all(np.isfinite(np.asarray(a1)))
    # fresh noise each tick: consecutive plans differ
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_export_roundtrip_bit_exact(key, tmp_path):
    ctrl = _oracle_controller(delay=2)
    state = ctrl.reset(key)
    env = make_env("oderl-pendulum", dt=CFG.dt)
    obs = env.observe(jnp.asarray([1.0, 0.5]))

    path = str(tmp_path / "controller.jaxexport")
    blob = serving.export_controller(ctrl, path=path)
    assert len(blob) > 0
    with open(path, "rb") as f:
        assert f.read() == blob

    restored = serving.load_controller_step(path)
    a_live, s_live = ctrl.step(state, obs)
    a_rest, s_rest = restored(state, obs)
    np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_rest))
    np.testing.assert_array_equal(np.asarray(s_live.U), np.asarray(s_rest.U))
    np.testing.assert_array_equal(np.asarray(s_live.key), np.asarray(s_rest.key))
    # the restored step is itself jittable at the deployment site
    a_jit, _ = jax.jit(restored)(state, obs)
    np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_jit))


def test_export_multiplatform_lowering(key, tmp_path):
    """cpu+tpu lowering in one artifact (deploy the same blob everywhere)."""
    ctrl = _oracle_controller()
    try:
        blob = serving.export_controller(ctrl, platforms=("cpu", "tpu"))
    except Exception as e:  # pragma: no cover - depends on jaxlib build
        pytest.skip(f"multi-platform lowering unavailable: {e}")
    exported = jax.export.deserialize(blob)
    assert set(p.lower() for p in exported.platforms) == {"cpu", "tpu"}


def test_persistent_compile_cache_populates(tmp_path):
    from jax.experimental.compilation_cache import compilation_cache as cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_time = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        # the process-wide cache backend latches the FIRST dir it
        # initializes with (the conftest points it at .pytest_jit_cache);
        # reset so persistent_compile_cache's dir takes effect here
        cc.reset_cache()
        cache = serving.persistent_compile_cache(str(tmp_path / "xla-cache"))

        @jax.jit
        def fresh(x):  # a shape/fn the suite hasn't compiled yet
            return jnp.tanh(x @ x.T) * 3.14159

        fresh(jnp.ones((7, 13))).block_until_ready()
        import os

        entries = os.listdir(cache)
        assert entries, "compile cache dir stayed empty"
    finally:
        cc.reset_cache()  # release the tmp dir; next compile re-latches conftest's
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_time)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)


def test_export_roundtrip_nl_flagship(key, tmp_path):
    """The flagship NL controller (complex-valued ILT inside the step)
    exports and replays bit-exactly — guards the serving path for the
    model family users actually deploy (reference w_nl.py:117-145)."""
    cfg = Config(dt=0.05, mppi_roll_outs=8, mppi_time_steps=4,
                 nl_hidden_units=16, nl_s_recon_terms=9)
    env = make_env("oderl-pendulum", dt=cfg.dt)
    model = make_model("nl", "oderl-pendulum", env.spec.n_obs, env.spec.m,
                       env.spec.action_high, cfg)
    params = model.init(key)
    ctrl = serving.make_controller(
        "nl", "oderl-pendulum", 1, cfg, model_apply=model.apply, params=params
    )
    state = ctrl.reset(key)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    path = str(tmp_path / "nl_controller.jaxexport")
    serving.export_controller(ctrl, path=path)
    restored = serving.load_controller_step(path)
    a_live, _ = ctrl.step(state, obs)
    a_rest, _ = restored(state, obs)
    np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_rest))


def test_controller_latent_ode_history_carried(key):
    """latent_ode deploys with the SAME history-carried planner dynamics
    evaluate_policy uses (training/eval.py predict_diff detection): pass the
    DynamicsModel itself and the tick must match mppi_command run by hand
    with models.latent_ode.make_carried_dynamics. Guards the serving/eval
    semantic-parity contract for the one family whose dynamics carry state
    (reference w_latent_ode.py:160-172 batch_obs_buffer)."""
    from neurallaplacecontrol_tpu.models.latent_ode import make_carried_dynamics
    from neurallaplacecontrol_tpu.planners import (
        default_noise_sigma,
        make_mppi_params,
    )

    cfg = Config(dt=0.05, mppi_roll_outs=8, mppi_time_steps=4)
    env = make_env("oderl-pendulum", dt=cfg.dt)
    model = make_model("latent_ode", "oderl-pendulum", env.spec.n_obs,
                       env.spec.m, env.spec.action_high, cfg)
    params = model.init(key)
    ctrl = serving.make_controller(
        "latent_ode", "oderl-pendulum", 1, cfg, model_apply=model, params=params
    )
    state = ctrl.reset(key)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    action, new_state = ctrl.step(state, obs)
    assert np.all(np.isfinite(np.asarray(action)))

    _, k_noise = jax.random.split(state.key)
    carry_init, dynamics = make_carried_dynamics(
        model, params, cfg.dt, env.spec.n_obs, env.spec.m,
        action_buffer_size=cfg.action_buffer_size,
    )
    mppi_params = make_mppi_params(
        default_noise_sigma(1, cfg.mppi_sigma, dtype=jnp.result_type(float))
    )
    ref_action, ref_U, _ = mppi_command(
        ctrl.mppi_cfg, mppi_params, dynamics, build_running_cost(env),
        state.U, obs, state.action_buffer, k_noise,
        dynamics_carry_init=carry_init,
    )
    np.testing.assert_allclose(np.asarray(action), np.asarray(ref_action), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.U), np.asarray(ref_U), rtol=1e-6)


def test_export_roundtrip_latent_ode_carried(key, tmp_path):
    """The history-carried latent_ode controller — an adaptive dopri5
    decode (lax.while_loop) inside every rollout step — serializes through
    jax.export and replays bit-exactly, so the one stateful-dynamics family
    deploys through the same portable-artifact path as the rest."""
    cfg = Config(dt=0.05, mppi_roll_outs=8, mppi_time_steps=4)
    env = make_env("oderl-pendulum", dt=cfg.dt)
    model = make_model("latent_ode", "oderl-pendulum", env.spec.n_obs,
                       env.spec.m, env.spec.action_high, cfg)
    params = model.init(key)
    ctrl = serving.make_controller(
        "latent_ode", "oderl-pendulum", 1, cfg, model_apply=model, params=params
    )
    path = str(tmp_path / "lode_controller.jaxexport")
    serving.export_controller(ctrl, path=path)
    restored = serving.load_controller_step(path)
    state = ctrl.reset(key)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    a_live, s_live = ctrl.step(state, obs)
    a_rest, s_rest = restored(state, obs)
    np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_rest))
    np.testing.assert_array_equal(np.asarray(s_live.U), np.asarray(s_rest.U))


def test_controller_rejects_non_callable_apply():
    """A DynamicsModel passed where a callable apply belongs fails loudly at
    build time (not with an opaque TypeError at the first traced step)."""
    cfg = Config(dt=0.05, mppi_roll_outs=8, mppi_time_steps=4,
                 nl_hidden_units=16, nl_s_recon_terms=9)
    env = make_env("oderl-pendulum", dt=cfg.dt)
    model = make_model("nl", "oderl-pendulum", env.spec.n_obs, env.spec.m,
                       env.spec.action_high, cfg)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="callable"):
        serving.make_controller(
            "nl", "oderl-pendulum", 1, cfg, model_apply=model, params=params
        )


@pytest.mark.tpu
def test_controller_tick_on_real_tpu(key):
    """Deployment witness on the real chip: the serving Controller at the
    full reference operating point (K=1000, T=40, trained flagship ckpt,
    cartpole d1 — mppi_with_model.py:218-230 + config.py:52-55) plans
    finite bounded actions, and one tick reproduces planners.mppi_command
    run on the same chip with the controller's own key split (the CPU
    parity test above, compiled for TPU)."""
    import os

    from neurallaplacecontrol_tpu.planners import (
        default_noise_sigma,
        make_mppi_params,
    )
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    assert jax.devices()[0].platform == "tpu"
    cfg = Config()
    env = make_env("oderl-cartpole", dt=cfg.dt)
    model = make_model("nl", "oderl-cartpole", env.spec.n_obs, env.spec.m,
                       env.spec.action_high, cfg)
    ckpt = resolve_checkpoint(
        model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True)
    )
    params = load_pytree(ckpt, model.init(key))
    ctrl = serving.make_controller(
        "nl", "oderl-cartpole", 1, cfg, model_apply=model.apply, params=params
    )
    state = ctrl.reset(key)
    obs = env.observe(jnp.asarray([0.0, 0.0, jnp.pi, 0.0]))
    for _ in range(3):
        action, state = ctrl.step(state, obs)
        assert np.all(np.isfinite(np.asarray(action)))
        assert float(jnp.max(jnp.abs(action))) <= env.spec.action_high + 1e-5

    # tick == mppi_command with the controller's key split, on the chip
    from neurallaplacecontrol_tpu.training.rollout import (
        build_learned_dynamics,
    )

    _, k_noise = jax.random.split(state.key)
    dynamics = build_learned_dynamics(
        env, model.apply, params, cfg.mppi_roll_outs, cfg.dt,
        action_buffer_size=cfg.action_buffer_size,
    )
    cost = build_running_cost(env)
    mp = make_mppi_params(
        default_noise_sigma(env.spec.m, cfg.mppi_sigma,
                            dtype=jnp.result_type(float))
    )
    action, new_state = ctrl.step(state, obs)
    ref_action, ref_U, _ = mppi_command(
        ctrl.mppi_cfg, mp, dynamics, cost,
        state.U, obs, state.action_buffer, k_noise,
        time_buffer=state.ages if ctrl.mppi_cfg.encode_obs_time else None,
    )
    np.testing.assert_allclose(
        np.asarray(action), np.asarray(ref_action), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.U), np.asarray(ref_U), rtol=1e-4, atol=1e-5
    )


def test_controller_state_checkpoint_roundtrip(key, tmp_path):
    """A mid-episode ControllerState checkpoints through utils.checkpoint
    (the carry IS the controller's whole runtime state, so save/restore =
    migrate the controller to another host mid-episode)."""
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        resolve_checkpoint,
        save_pytree,
    )

    ctrl = _oracle_controller()
    env = make_env("oderl-pendulum", dt=CFG.dt)
    obs = env.observe(jnp.asarray([jnp.pi, 1.0]))
    state = ctrl.reset(key)
    _, state = ctrl.step(state, obs)

    path = str(tmp_path / "controller_state.npz")
    save_pytree(path, state)
    restored = load_pytree(path, state)
    assert isinstance(restored, serving.ControllerState)
    # the restored controller continues identically
    a1, _ = ctrl.step(state, obs)
    a2, _ = ctrl.step(restored, obs)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

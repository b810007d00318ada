"""Deployment-facing controller: one planner tick as a service.

The reference has no serving story — deploying its controller means
re-running the Python episode loop in mppi_with_model.py:244-317 (numpy
round-trips, torch module state, 8,100 s of training artifacts on the
import path). Here the per-tick planner call is packaged three ways:

1. ``make_controller`` — a jitted ``reset``/``step`` pair over an explicit
   ``ControllerState`` carry. The plant sends an observation, gets the
   planned action back; the receding-horizon plan ``U``, the action-history
   buffer the delay-aware models condition on (reference
   planners/mppi_delay.py:244-249), and the PRNG state all live in the
   carry, so the controller itself is a pure function — restartable,
   checkpointable, shippable to another host mid-episode.
2. ``export_controller`` / ``load_controller_step`` — the jitted step
   serialized to a portable StableHLO artifact via ``jax.export``. The
   artifact replays WITHOUT the model's Python code (no flax/model imports
   at the deployment site) and can be lowered for several platforms at
   once (``platforms=("cpu", "tpu")``).
3. ``persistent_compile_cache`` — switches on JAX's on-disk compilation
   cache so a process restart pays ~0 instead of the 60-120 s first-jit
   this TPU's remote compile helper costs (CLAUDE.md facts).

The tick semantics mirror one iteration of the reference episode loop
(mppi_with_model.py:244-268): plan from the current observation, push the
planned action into the history buffer, advance the entry-age channel by
the nominal control interval. The *delay* is a property of the plant (the
actuator applies the action ``delay`` ticks late); the controller only
maintains the history the planner conditions on, so ``step`` returns the
freshly planned action and the caller's plant applies its own latency —
exactly how the reference splits planner vs env-side delay buffer
(mppi_with_model.py:255-259 vs overlay.py get_action:25-28).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import Config
from .envs import make_env
from .planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
    mppi_reset,
)
from .training.rollout import (
    build_learned_dynamics,
    build_oracle_dynamics,
    build_running_cost,
)


class ControllerState(NamedTuple):
    """Everything one planner tick carries to the next (a pytree)."""

    U: jnp.ndarray  # [T, nu] receding-horizon control plan (unit scale)
    action_buffer: jnp.ndarray  # [A, nu] recent planned actions (env units)
    ages: jnp.ndarray  # [A] entry ages for encode_obs_time (seconds)
    key: jax.Array  # PRNG carry (uint32 [2])


# jax.export needs to know how to serialize the state pytree so exported
# artifacts can accept/return it without this module on the import path
try:  # idempotence: re-importing this module must not raise
    jax.export.register_namedtuple_serialization(
        ControllerState,
        serialized_name="neurallaplacecontrol_tpu.serving.ControllerState",
    )
except ValueError:  # already registered
    pass


@dataclass(frozen=True)
class Controller:
    """A jitted planner tick bound to one (model, env, delay) triple."""

    reset: Callable  # (key) -> ControllerState
    step: Callable  # (ControllerState, obs [nx]) -> (action [nu], ControllerState)
    mppi_cfg: MPPIConfig
    n_obs: int
    action_delay: int


def make_controller(
    model_name: str,
    env_name: str,
    action_delay: int,
    config: Config = Config(),
    model_apply=None,
    params=None,
    roll_outs: Optional[int] = None,
    time_steps: Optional[int] = None,
    state_constraint: bool = False,
) -> Controller:
    """Assemble the serving controller exactly like training.eval does for
    episodes (same dynamics closure, same cost, same MPPIConfig — see
    training/eval.py evaluate_policy), minus the env simulation.

    ``model_name`` is "oracle" or any learned family with
    ``model_apply``/``params`` supplied (training.train.train_model returns
    them; utils.checkpoint.load_pytree restores them). For ``latent_ode``
    pass the DynamicsModel itself as ``model_apply`` — the controller then
    plans with the same history-carried dynamics evaluate_policy uses.
    """
    roll_outs = roll_outs or config.mppi_roll_outs
    time_steps = time_steps or config.mppi_time_steps
    dt = config.dt
    env = make_env(env_name, dt=dt, friction=config.friction)
    spec = env.spec

    mppi_cfg = MPPIConfig(
        num_samples=roll_outs,
        horizon=time_steps,
        nu=spec.m,
        lambda_=config.mppi_lambda,
        u_scale=spec.action_high,
        u_min=-spec.action_high,
        u_max=spec.action_high,
        encode_obs_time=config.encode_obs_time and model_name != "latent_ode",
        dt=dt,
        scan_unroll=config.mppi_scan_unroll,
    )
    dtype = jnp.result_type(float)
    mppi_params = make_mppi_params(
        default_noise_sigma(spec.m, config.mppi_sigma, dtype=dtype)
    )

    dynamics_carry_init = None
    if model_name == "oracle":
        dynamics = build_oracle_dynamics(env, roll_outs, dt, action_delay)
    elif model_name == "latent_ode" and hasattr(model_apply, "predict_diff"):
        # same history-carried planning as training.eval.evaluate_policy:
        # pass the DynamicsModel train_model returns (not .apply), so the
        # deployed controller plans with the trajectory-aware encoder the
        # published evaluation used
        assert params is not None, "learned models need model_apply/params"
        from .models.latent_ode import make_carried_dynamics

        dynamics_carry_init, dynamics = make_carried_dynamics(
            model_apply, params, dt, spec.n_obs, spec.m,
            action_buffer_size=config.action_buffer_size,
        )
    else:
        assert model_apply is not None and params is not None, (
            "learned models need model_apply/params"
        )
        assert callable(model_apply), (
            f"model_apply for {model_name!r} must be callable; for "
            "latent_ode pass the DynamicsModel itself (history-carried "
            "planning), matching evaluate_policy's contract"
        )
        dynamics = build_learned_dynamics(
            env, model_apply, params, roll_outs, dt,
            action_buffer_size=config.action_buffer_size,
        )
    cost_fn = build_running_cost(env, state_constraint=state_constraint)

    A, nu = config.action_buffer_size, spec.m
    encode = mppi_cfg.encode_obs_time

    def reset(key: jax.Array) -> ControllerState:
        k_u0, k_carry = jax.random.split(key)
        return ControllerState(
            U=mppi_reset(k_u0, mppi_cfg, mppi_params),
            action_buffer=jnp.zeros((A, nu), dtype=dtype),
            # flip(arange(A)) * dt, the collector's age init (collector
            # get_action_with_encode_obs_time contract; rollout.py:185)
            ages=jnp.flip(jnp.arange(A, dtype=dtype)) * dt,
            key=k_carry,
        )

    def step(state: ControllerState, obs: jnp.ndarray):
        key, k_noise = jax.random.split(state.key)
        action, U, _ = mppi_command(
            mppi_cfg, mppi_params, dynamics, cost_fn,
            state.U, obs, state.action_buffer, k_noise,
            dynamics_carry_init=dynamics_carry_init,
            time_buffer=state.ages if encode else None,
        )
        buffer = jnp.roll(state.action_buffer, -1, axis=0).at[-1].set(action)
        # serving ticks at the nominal control interval; realized-dt ages are
        # an episode-simulation concern (rollout.py:238-241)
        ages = jnp.roll(state.ages, -1)
        ages = (ages + dt).at[-1].set(0.0)
        return action, ControllerState(U=U, action_buffer=buffer, ages=ages, key=key)

    return Controller(
        reset=jax.jit(reset),
        step=jax.jit(step),
        mppi_cfg=mppi_cfg,
        n_obs=spec.n_obs,
        action_delay=action_delay,
    )


def export_controller(
    controller: Controller,
    path: Optional[str] = None,
    platforms: Optional[tuple] = None,
) -> bytes:
    """Serialize the controller's jitted step to a portable StableHLO
    artifact (jax.export). The result replays without the model's Python
    code; pass ``platforms=("cpu", "tpu")`` to lower for both at once.

    Returns the serialized bytes; also writes them to ``path`` if given.
    """
    state_spec = jax.eval_shape(
        controller.reset, jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    obs_spec = jax.ShapeDtypeStruct((controller.n_obs,), jnp.result_type(float))
    exported = jax.export.export(
        controller.step, platforms=platforms
    )(state_spec, obs_spec)
    blob = exported.serialize()
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_controller_step(path_or_bytes) -> Callable:
    """Rehydrate an exported controller step: returns a callable
    ``(ControllerState, obs) -> (action, ControllerState)``. Wrap in
    ``jax.jit`` at the deployment site to stage it into one XLA call."""
    blob = path_or_bytes
    if isinstance(blob, (str, os.PathLike)):
        with open(blob, "rb") as f:
            blob = f.read()
    return jax.export.deserialize(blob).call


def persistent_compile_cache(cache_dir: str) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` so process
    restarts skip recompilation (first jit of the planner costs 60-120 s on
    this TPU's remote-compile path). Caches every entry regardless of
    compile time or size — planner ticks are small but expensive to build.
    """
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

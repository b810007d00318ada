"""Functional continuous-time environment API.

The reference wraps physics in stateful gym Envs (reference
envs/oderl/envs/base_env.py): mutable ``env.state``, numpy round-trips at
every step (base_env.py:83-89), and torchdiffeq for one-Euler-step
transitions. Here an environment is a frozen spec plus pure functions so
entire episodes stay on-device inside one ``lax.scan``:

    rhs(spec, state, action)        d(state)/dt; shape-dispatches raw/trig
    observe(spec, raw_state)        raw -> trig observation
    obs_to_state(spec, obs)         trig observation -> raw
    reward_state(spec, s)           differentiable state reward (both forms)
    reward_action(spec, a)          differentiable action penalty
    reset(spec, key)                initial raw state

Irregular observation-time sampling follows base_env.build_time_grid:99-134
(``fixed`` / ``uniform`` / ``exp`` grids) with explicit PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EnvSpec:
    """Static environment description (hashable; safe as a jit static arg)."""

    name: str
    n_obs: int  # trig-transformed observation dim
    n_state: int  # raw (angle-form) state dim
    m: int  # action dim
    action_high: float
    dt: float = 0.05
    ts_grid: str = "fixed"  # 'fixed' | 'uniform' | 'exp'
    obs_noise: float = 0.0
    friction: bool = False
    ac_rew_const: float = 0.01
    vel_rew_const: float = 0.01
    n_steps: int = 200


@dataclass(frozen=True)
class Env:
    """Bundle of the spec and the pure physics/reward functions."""

    spec: EnvSpec
    rhs: Callable  # rhs(state, action) -> dstate (closed over spec)
    observe: Callable  # raw -> obs
    obs_to_state: Callable  # obs -> raw
    reward_state: Callable  # state (raw or obs form) -> reward
    reward_action: Callable  # action -> reward
    reset: Callable  # key -> raw state
    state_max: tuple  # synthetic-data sampling box (overlay.py:689-694)
    # Optional variant-aware state reward (s, goal_x, state_constraint) used
    # by the change-goal / state-constraint planner costs
    # (reference ctcartpole.diff_obs_reward_:290-343); None for envs without
    # reward variants.
    reward_state_ext: Optional[Callable] = None

    def diff_reward(self, s, a):
        """reward_state + reward_action (base_env.py:94-97)."""
        return self.reward_state(s) + self.reward_action(a)


def trig_to_angle(cos_t: jnp.ndarray, sin_t: jnp.ndarray) -> jnp.ndarray:
    """Angle from possibly-unnormalized (cos, sin) pairs.

    Mirrors base_env.trigonometric2angle:297-301 including the
    stop-gradient on the normalization constant, which shapes gradients when
    models are trained through trig observations.
    """
    c = jax.lax.stop_gradient(cos_t * cos_t + sin_t * sin_t)
    return jnp.arctan2(sin_t / (c * c), cos_t / (c * c))


def sample_dt(key: jax.Array, ts_grid: str, dt: float, shape=()) -> jnp.ndarray:
    """One observation-interval sample per element of ``shape``.

    fixed:   dt
    uniform: U(0, 2 dt)
    exp:     Exponential with mean dt
    (base_env.build_time_grid:103-123.)
    """
    if ts_grid == "fixed":
        return jnp.full(shape, dt)
    if ts_grid in ("uniform", "random"):
        return jax.random.uniform(key, shape) * (2.0 * dt)
    if ts_grid == "exp":
        return jax.random.exponential(key, shape) * dt
    raise ValueError(f"Unknown ts_grid: {ts_grid}")


def df_du(env: Env, state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Action Jacobian of the dynamics rhs at (state, action).

    The reference hand-derives these per env (ctcartpole.df_du:136-157,
    ctpendulum.df_du:86-89); forward-mode AD over the shared rhs replaces
    the hand-written forms exactly and covers every env.
    """
    return jax.jacfwd(lambda a: env.rhs(state, a))(action)


def env_step(env: Env, raw_state: jnp.ndarray, action: jnp.ndarray, delta_t) -> jnp.ndarray:
    """One environment transition: a single explicit Euler step of the raw
    dynamics under a constant action.

    This is exactly what the reference computes: integrate_system with the
    'euler' solver over the 2-point grid [0, delta_t]
    (base_env.py:136-163 + overlay.create_env solver='euler' at overlay.py:39;
    torchdiffeq euler only steps at the grid points).
    """
    return raw_state + delta_t * env.rhs(raw_state, action)

"""Continuous-time pendulum swing-up (pure JAX).

Physics and rewards match reference envs/oderl/envs/ctpendulum.py:
rhs at :111-137, rewards at :139-155, reset at :92-98, trig transform at
:73-79. Raw state [theta, theta_dot]; trig obs [cos, sin, theta_dot].
g=10, m=1, l=1; action range +-2 (ctor args ctpendulum.py:43-55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Env, EnvSpec, trig_to_angle

_G, _M, _L = 10.0, 1.0, 1.0


def _accel(theta, action0):
    return -3.0 * _G / (2.0 * _L) * jnp.sin(theta + jnp.pi) + 3.0 / (_M * _L**2) * action0


def rhs(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """d(state)/dt; dispatches on raw (2) vs trig (3) last-dim size.

    The action is NOT clamped here (ctpendulum.torch_rhs applies none;
    clamping happens in the oracle step functions, oracle.py:209).
    """
    if state.shape[-1] == 2:
        th, thdot = state[..., 0], state[..., 1]
        return jnp.stack([thdot, _accel(th, action[..., 0])], axis=-1)
    costh, sinth, thdot = state[..., 0], state[..., 1], state[..., 2]
    th = trig_to_angle(costh, sinth)
    return jnp.stack(
        [-sinth * thdot, costh * thdot, _accel(th, action[..., 0])], axis=-1
    )


def observe(raw: jnp.ndarray) -> jnp.ndarray:
    th, thdot = raw[..., 0], raw[..., 1]
    return jnp.stack([jnp.cos(th), jnp.sin(th), thdot], axis=-1)


def obs_to_state(obs: jnp.ndarray) -> jnp.ndarray:
    if obs.shape[-1] == 2:
        return obs
    th = trig_to_angle(obs[..., 0], obs[..., 1])
    return jnp.stack([th, obs[..., 2]], axis=-1)


def make(dt=0.05, ts_grid="fixed", obs_noise=0.0, friction=False) -> Env:
    spec = EnvSpec(
        name="pendulum",
        n_obs=3,
        n_state=2,
        m=1,
        action_high=2.0,
        dt=dt,
        ts_grid=ts_grid,
        obs_noise=obs_noise,
        friction=friction,
    )

    def reward_state(s):
        # ctpendulum.diff_obs_reward_:139-151
        if s.shape[-1] == 2:
            th, thdot = s[..., 0], s[..., 1]
            cos_th, sin_th = jnp.cos(th), jnp.sin(th)
        else:
            cos_th, sin_th, thdot = s[..., 0], s[..., 1], s[..., 2]
        state_reward = -(_L**2) * ((1.0 - cos_th) ** 2 + sin_th**2)
        velocity_reward = -(thdot**2)
        return state_reward + spec.vel_rew_const * velocity_reward

    def reward_action(a):
        return -spec.ac_rew_const * jnp.sum(a**2, axis=-1)

    def reset(key):
        # ctpendulum.reset:92-98 — start near downward
        s = jax.random.uniform(key, (2,), minval=-0.1, maxval=0.1)
        return s.at[0].add(jnp.pi)

    return Env(
        spec=spec,
        rhs=rhs,
        observe=observe,
        obs_to_state=obs_to_state,
        reward_state=reward_state,
        reward_action=reward_action,
        reset=reset,
        state_max=(float(jnp.pi), 5.0),  # overlay.py:692
    )

"""Continuous-time fully-actuated acrobot (pure JAX).

Physics and rewards match reference envs/oderl/envs/ctacrobot.py:
rhs at :168-231 (fully_act=True branch), tip-position reward at :233-255,
reset at :148-151, trig transform at :125-137. Raw state
[theta1, theta2, dtheta1, dtheta2]; trig obs
[cos1, sin1, cos2, sin2, dtheta1, dtheta2]. Action range +-5, m=2;
ac_rew_const=1e-4, vel_rew_const=1e-1 (ctor at :98-112).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Env, EnvSpec, trig_to_angle

_M1 = _M2 = 1.0
_L1 = 1.0
_LC1 = _LC2 = 0.5
_I1 = _I2 = 1.0
_G = 9.8
_LINK1 = 1.0
_LINK2 = 1.0


def _accels(theta1, theta2, dtheta1, dtheta2, a0, a1):
    d1 = _M1 * _LC1**2 + _M2 * (_L1**2 + _LC2**2 + 2 * _L1 * _LC2 * jnp.cos(theta2)) + _I1 + _I2
    d2 = _M2 * (_LC2**2 + _L1 * _LC2 * jnp.cos(theta2)) + _I2
    phi2 = _M2 * _LC2 * _G * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
    phi1 = (
        -_M2 * _L1 * _LC2 * dtheta2**2 * jnp.sin(theta2)
        - 2 * _M2 * _L1 * _LC2 * dtheta2 * dtheta1 * jnp.sin(theta2)
        + (_M1 * _LC1 + _M2 * _L1) * _G * jnp.cos(theta1 - jnp.pi / 2)
        + phi2
    )
    ddtheta2 = (
        a0 + d2 / d1 * phi1 - _M2 * _L1 * _LC2 * dtheta1**2 * jnp.sin(theta2) - phi2
    ) / (_M2 * _LC2**2 + _I2 - d2**2 / d1)
    ddtheta1 = -(a1 + d2 * ddtheta2 + phi1) / d1
    return ddtheta1, ddtheta2


def rhs(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    six_d = state.shape[-1] == 6
    if six_d:
        cos1, sin1 = state[..., 0], state[..., 1]
        cos2, sin2 = state[..., 2], state[..., 3]
        dtheta1, dtheta2 = state[..., 4], state[..., 5]
        c1 = jax.lax.stop_gradient(cos1**2 + sin1**2)
        c2 = jax.lax.stop_gradient(cos2**2 + sin2**2)
        theta1 = trig_to_angle(cos1, sin1)
        theta2 = trig_to_angle(cos2, sin2)
    else:
        theta1, theta2 = state[..., 0], state[..., 1]
        dtheta1, dtheta2 = state[..., 2], state[..., 3]
    ddtheta1, ddtheta2 = _accels(theta1, theta2, dtheta1, dtheta2, action[..., 0], action[..., 1])
    if six_d:
        return jnp.stack(
            [
                -sin1 * dtheta1 / c1,
                cos1 * dtheta1 / c1,
                -sin2 * dtheta2 / c2,
                cos2 * dtheta2 / c2,
                ddtheta1,
                ddtheta2,
            ],
            axis=-1,
        )
    return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2], axis=-1)


def observe(raw: jnp.ndarray) -> jnp.ndarray:
    t1, t2, v1, v2 = raw[..., 0], raw[..., 1], raw[..., 2], raw[..., 3]
    return jnp.stack(
        [jnp.cos(t1), jnp.sin(t1), jnp.cos(t2), jnp.sin(t2), v1, v2], axis=-1
    )


def obs_to_state(obs: jnp.ndarray) -> jnp.ndarray:
    if obs.shape[-1] == 4:
        return obs
    theta1 = trig_to_angle(obs[..., 0], obs[..., 1])
    theta2 = trig_to_angle(obs[..., 2], obs[..., 3])
    return jnp.stack([theta1, theta2, obs[..., 4], obs[..., 5]], axis=-1)


def make(dt=0.05, ts_grid="fixed", obs_noise=0.0, friction=False) -> Env:
    spec = EnvSpec(
        name="acrobot",
        n_obs=6,
        n_state=4,
        m=2,
        action_high=5.0,
        dt=dt,
        ts_grid=ts_grid,
        obs_noise=obs_noise,
        friction=friction,
        ac_rew_const=1e-4,
        vel_rew_const=1e-1,
    )

    def reward_state(s):
        # ctacrobot.diff_obs_reward_:233-252 — tip distance to full extension
        if s.shape[-1] == 6:
            s = obs_to_state(s)
        th1, th2, vel1, vel2 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
        velocity_reward = -(vel1**2) - vel2**2
        p2x = -_LINK1 * jnp.cos(th1) - _LINK2 * jnp.cos(th1 + th2)
        p2y = _LINK1 * jnp.sin(th1) + _LINK2 * jnp.sin(th1 + th2)
        state_reward = -((p2x - _LINK1 - _LINK2) ** 2) - p2y**2
        return state_reward + spec.vel_rew_const * velocity_reward

    def reward_action(a):
        return -spec.ac_rew_const * jnp.sum(a**2, axis=-1)

    def reset(key):
        # ctacrobot.reset:148-151
        return jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)

    return Env(
        spec=spec,
        rhs=rhs,
        observe=observe,
        obs_to_state=obs_to_state,
        reward_state=reward_state,
        reward_action=reward_action,
        reset=reset,
        state_max=(float(jnp.pi), float(jnp.pi), 5.0, 5.0),  # overlay.py:694
    )

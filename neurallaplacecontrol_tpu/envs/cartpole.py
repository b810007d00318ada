"""Continuous-time cartpole swing-up (pure JAX).

Physics and rewards match reference envs/oderl/envs/ctcartpole.py:
rhs (incl. optional cart/pole friction) at :185-237, end-effector reward at
:289-343, reset at :160-170, trig transform at :107-127. Raw state
[x, x_dot, theta, theta_dot]; trig obs [x, x_dot, l cos, l sin, theta_dot].
Constants at :76-92; action range +-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Env, EnvSpec, trig_to_angle

_GRAVITY = 9.8
_MASSCART = 1.0
_MASSPOLE = 0.1
_LENGTH = 1.0  # actually half the pole's length
_TOTAL_MASS = _MASSPOLE + _MASSCART
_POLEMASS_LENGTH = _MASSPOLE * _LENGTH
_FORCE_MAG = 3.0
_FRICTION_CART = 5e-4
_FRICTION_POLE = 2e-6


def _accels(x_dot, costheta, sintheta, theta_dot, action0, friction: bool):
    # torch_rhs clamps the action to +-force_mag before scaling (:210-211)
    action0 = jnp.clip(action0, -_FORCE_MAG, _FORCE_MAG)
    force = action0 * _FORCE_MAG
    if friction:
        temp = (
            force
            + _POLEMASS_LENGTH * theta_dot * theta_dot * sintheta
            - _FRICTION_CART * jnp.sign(x_dot)
        ) / _TOTAL_MASS
        thetaacc = (
            _GRAVITY * sintheta
            - costheta * temp
            - _FRICTION_POLE * theta_dot / _POLEMASS_LENGTH
        ) / (_LENGTH * (4.0 / 3.0 - _MASSPOLE * costheta * costheta / _TOTAL_MASS))
    else:
        temp = (force + _POLEMASS_LENGTH * theta_dot * theta_dot * sintheta) / _TOTAL_MASS
        thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
            _LENGTH * (4.0 / 3.0 - _MASSPOLE * costheta * costheta / _TOTAL_MASS)
        )
    xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS
    return xacc, thetaacc


def make_rhs(friction: bool):
    def rhs(state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        five_d = state.shape[-1] == 5
        if five_d:
            x_dot = state[..., 1]
            costheta, sintheta, theta_dot = state[..., 2], state[..., 3], state[..., 4]
            c = jax.lax.stop_gradient(costheta**2 + sintheta**2)
        else:
            x_dot, theta, theta_dot = state[..., 1], state[..., 2], state[..., 3]
            costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
        xacc, thetaacc = _accels(x_dot, costheta, sintheta, theta_dot, action[..., 0], friction)
        if five_d:
            return jnp.stack(
                [x_dot, xacc, -sintheta * theta_dot / c, costheta * theta_dot / c, thetaacc],
                axis=-1,
            )
        return jnp.stack([x_dot, xacc, theta_dot, thetaacc], axis=-1)

    return rhs


def observe(raw: jnp.ndarray) -> jnp.ndarray:
    x, x_dot, theta, theta_dot = raw[..., 0], raw[..., 1], raw[..., 2], raw[..., 3]
    return jnp.stack(
        [x, x_dot, _LENGTH * jnp.cos(theta), _LENGTH * jnp.sin(theta), theta_dot], axis=-1
    )


def obs_to_state(obs: jnp.ndarray) -> jnp.ndarray:
    if obs.shape[-1] == 4:
        return obs
    theta = trig_to_angle(obs[..., 2], obs[..., 3])
    return jnp.stack([obs[..., 0], obs[..., 1], theta, obs[..., 4]], axis=-1)


def end_effector_reward(
    s,
    goal_x=0.0,
    state_constraint: bool = False,
    exp_reward: bool = False,
    vel_rew_const: float = 0.01,
):
    """Variant-aware end-effector state reward
    (ctcartpole.diff_obs_reward_:290-343, swing_up branch).

    goal_x moves the target end-effector x (change_goal uses -2 / +2 after
    the mid-episode flip); state_constraint adds the one-sided exponential
    barrier exp(10 err_x + 7) that keeps the cart left of the constraint.
    """
    if s.shape[-1] == 4:
        x, xdot, theta, thetadot = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
        cos_len, sin_len = _LENGTH * jnp.cos(theta), _LENGTH * jnp.sin(theta)
    else:
        x, xdot = s[..., 0], s[..., 1]
        cos_len, sin_len, thetadot = s[..., 2], s[..., 3], s[..., 4]
    err_x = (x + sin_len) - goal_x
    err_y = cos_len - _LENGTH
    if state_constraint:
        position_error = err_x**2 + jnp.exp(err_x * 10.0 + 7.0)
    else:
        position_error = err_x**2
    state_reward = -(position_error + err_y**2)
    velocity_reward = -(xdot**2) - thetadot**2
    out = state_reward + vel_rew_const * velocity_reward
    return jnp.exp(out) if exp_reward else out


def end_effector_reward_reduced(s, goal_x=0.0, state_constraint: bool = False,
                                exp_reward: bool = False):
    """Reduced-state (x, l cos, l sin) variant without velocity terms
    (ctcartpole.diff_obs_reward_reduced_state:239-288)."""
    x, cos_len, sin_len = s[..., 0], s[..., 1], s[..., 2]
    err_x = (x + sin_len) - goal_x
    err_y = cos_len - _LENGTH
    if state_constraint:
        position_error = err_x**2 + jnp.exp(err_x * 10.0 + 7.0)
    else:
        position_error = err_x**2
    out = -(position_error + err_y**2)
    return jnp.exp(out) if exp_reward else out


def make(dt=0.05, ts_grid="fixed", obs_noise=0.0, friction=False) -> Env:
    spec = EnvSpec(
        name="cartpole",
        n_obs=5,
        n_state=4,
        m=1,
        action_high=3.0,
        dt=dt,
        ts_grid=ts_grid,
        obs_noise=obs_noise,
        friction=friction,
    )

    def reward_state(s):
        # ctcartpole.diff_obs_reward_:289-339 (swing_up branch, default goal)
        return end_effector_reward(s, vel_rew_const=spec.vel_rew_const)

    def reward_state_ext(s, goal_x, state_constraint=False):
        return end_effector_reward(
            s, goal_x=goal_x, state_constraint=state_constraint,
            vel_rew_const=spec.vel_rew_const,
        )

    def reward_action(a):
        return -spec.ac_rew_const * jnp.sum(a**2, axis=-1)

    def reset(key):
        # ctcartpole.reset:160-170 (swing_up: pole starts downward)
        s = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        return s.at[2].add(jnp.pi)

    return Env(
        spec=spec,
        rhs=make_rhs(friction),
        observe=observe,
        obs_to_state=obs_to_state,
        reward_state=reward_state,
        reward_action=reward_action,
        reset=reset,
        state_max=(5.0, 20.0, float(jnp.pi), 30.0),  # overlay.py:690
        reward_state_ext=reward_state_ext,
    )

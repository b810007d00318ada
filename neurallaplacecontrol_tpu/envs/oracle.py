"""Closed-form one-Euler-step oracle dynamics with action delay.

Functional equivalents of reference oracle.py:11-224
({cartpole,acrobot,pendulum}_dynamics_dt_delay): each selects the delayed
action ``buffer[..., -(delay+1), :nu]`` from the action-history buffer,
clamps it to the env's action bounds, advances the raw (angle-form) state by
one explicit Euler step of the physics rhs, and returns the state in the same
form (raw or trig) it was given.

Because the reference's update order — velocities advanced with the new
acceleration, positions advanced with the OLD velocity (e.g. oracle.py:73-79)
— is exactly one Euler step of the continuous rhs, these functions are
implemented as ``decode -> clamp -> euler(rhs) -> encode`` over the env
physics modules, guaranteeing oracle == env-transition parity by
construction (the property overlay.py's validation helpers check manually).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from . import acrobot as _acrobot
from . import cartpole as _cartpole
from . import pendulum as _pendulum


def _delayed_action(action_buffer: jnp.ndarray, delay: int, nu: int) -> jnp.ndarray:
    """Pick the action executed ``delay`` steps ago (oracle.py:23,99,187).

    ``action_buffer``: [..., A, m(+time-channel)]; returns [..., nu].
    """
    return action_buffer[..., -(delay + 1), :nu]


def pendulum_dynamics_dt_delay(
    state, action_buffer, ts, delay, action_low=-2.0, action_high=2.0, friction=False
):
    """oracle.pendulum_dynamics_dt_delay:177-224. state [...,2] or [...,3]."""
    u = jnp.clip(_delayed_action(action_buffer, delay, 1), action_low, action_high)
    ts = jnp.reshape(ts, ts.shape[:1] + (1,))[..., 0] if ts.ndim > 1 else ts
    raw = _pendulum.obs_to_state(state)
    new_raw = raw + ts[..., None] * _pendulum.rhs(raw, u)
    if state.shape[-1] == 2:
        return new_raw
    return _pendulum.observe(new_raw)


def cartpole_dynamics_dt_delay(
    state, action_buffer, ts, delay, action_low=-3.0, action_high=3.0, friction=False
):
    """oracle.cartpole_dynamics_dt_delay:11-86. state [...,4] or [...,5]."""
    u = jnp.clip(_delayed_action(action_buffer, delay, 1), action_low, action_high)
    ts = jnp.reshape(ts, ts.shape[:1] + (1,))[..., 0] if ts.ndim > 1 else ts
    raw = _cartpole.obs_to_state(state)
    rhs = _cartpole.make_rhs(friction)
    new_raw = raw + ts[..., None] * rhs(raw, u)
    if state.shape[-1] == 4:
        return new_raw
    return _cartpole.observe(new_raw)


def acrobot_dynamics_dt_delay(
    state, action_buffer, ts, delay, action_low=-5.0, action_high=5.0, friction=False
):
    """oracle.acrobot_dynamics_dt_delay:89-174. state [...,4] or [...,6]."""
    u = jnp.clip(_delayed_action(action_buffer, delay, 2), action_low, action_high)
    ts = jnp.reshape(ts, ts.shape[:1] + (1,))[..., 0] if ts.ndim > 1 else ts
    raw = _acrobot.obs_to_state(state)
    new_raw = raw + ts[..., None] * _acrobot.rhs(raw, u)
    if state.shape[-1] == 4:
        return new_raw
    return _acrobot.observe(new_raw)


def _finite_diff_angles(cos_t, sin_t, cos_p, sin_p, ts):
    """theta, theta_dot from two trig frames (oracle.py:240-253, 312-325)."""
    from .base import trig_to_angle

    theta = trig_to_angle(cos_t, sin_t)
    theta_p = trig_to_angle(cos_p, sin_p)
    return theta, (theta - theta_p) / ts


def cartpole_dynamics_dt_latent(
    state, prev_state, action, ts, action_low=-3.0, action_high=3.0
):
    """Two-frame cartpole step (oracle.cartpole_dynamics_dt_latent:299-375).

    Velocities are reconstructed by finite differences of the current and
    previous frame; the update is SEMI-IMPLICIT Euler (the new velocity
    advances the position, oracle.py:355-366), unlike the explicit-Euler
    delay oracle. state/prev_state: [..., 5] trig form
    (x, x_dot, l cos, l sin, theta_dot; stored velocities are ignored) or
    [..., 4] raw (x, x_dot, theta, theta_dot).
    """
    u = jnp.clip(action[..., 0], action_low, action_high)
    ts = ts[..., 0] if ts.ndim > 1 else ts
    x, xp = state[..., 0], prev_state[..., 0]
    x_dot = (x - xp) / ts
    if state.shape[-1] == 5:
        theta, theta_dot = _finite_diff_angles(
            state[..., 2], state[..., 3], prev_state[..., 2], prev_state[..., 3], ts
        )
    else:
        theta = state[..., 2]
        theta_dot = (theta - prev_state[..., 2]) / ts
    costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
    xacc, thetaacc = _cartpole._accels(x_dot, costheta, sintheta, theta_dot, u, False)

    new_theta_dot = theta_dot + thetaacc * ts
    new_theta = theta + new_theta_dot * ts
    new_x_dot = x_dot + xacc * ts
    new_x = x + new_x_dot * ts
    if state.shape[-1] == 5:
        return jnp.stack(
            [new_x, new_x_dot, jnp.cos(new_theta), jnp.sin(new_theta), new_theta_dot],
            axis=-1,
        )
    return jnp.stack([new_x, new_x_dot, new_theta, new_theta_dot], axis=-1)


def cartpole_dynamics_dt_latent_reduced(
    state, prev_state, action, ts, action_low=-3.0, action_high=3.0
):
    """Position-only two-frame cartpole step
    (oracle.cartpole_dynamics_dt_latent_reduced:227-296): state [..., 3] is
    (x, l cos, l sin); velocities come entirely from finite differences and
    the returned frame is position-only again.
    """
    u = jnp.clip(action[..., 0], action_low, action_high)
    ts = ts[..., 0] if ts.ndim > 1 else ts
    x, xp = state[..., 0], prev_state[..., 0]
    x_dot = (x - xp) / ts
    theta, theta_dot = _finite_diff_angles(
        state[..., 1], state[..., 2], prev_state[..., 1], prev_state[..., 2], ts
    )
    costheta, sintheta = jnp.cos(theta), jnp.sin(theta)
    xacc, thetaacc = _cartpole._accels(x_dot, costheta, sintheta, theta_dot, u, False)

    new_theta_dot = theta_dot + thetaacc * ts
    new_theta = theta + new_theta_dot * ts
    new_x = x + (x_dot + xacc * ts) * ts
    return jnp.stack([new_x, jnp.cos(new_theta), jnp.sin(new_theta)], axis=-1)


# Non-delayed single-action variants (oracle.py:378-552): delay 0 with the
# action viewed as a one-entry buffer.
def pendulum_dynamics_dt(state, action, ts, **kw):
    return pendulum_dynamics_dt_delay(state, action[..., None, :], ts, 0, **kw)


def cartpole_dynamics_dt(state, action, ts, **kw):
    return cartpole_dynamics_dt_delay(state, action[..., None, :], ts, 0, **kw)


def acrobot_dynamics_dt(state, action, ts, **kw):
    return acrobot_dynamics_dt_delay(state, action[..., None, :], ts, 0, **kw)


ORACLES = {
    "pendulum": pendulum_dynamics_dt_delay,
    "cartpole": cartpole_dynamics_dt_delay,
    "acrobot": acrobot_dynamics_dt_delay,
    "oderl-pendulum": pendulum_dynamics_dt_delay,
    "oderl-cartpole": cartpole_dynamics_dt_delay,
    "oderl-acrobot": acrobot_dynamics_dt_delay,
}


def oracle_for(env_name: str, ts, delay: int, friction: bool = False):
    """Partial out (ts, delay, friction) the way mppi_with_model.py:129-143
    wires the oracle planner dynamics."""
    fn = ORACLES[env_name]
    return partial(fn, ts=ts, delay=delay, friction=friction)

"""Neural ODE baseline dynamics model.

Reference: train_utils.py:637-738 (xOdeFuncInXAndU + NODE). The state
(normalized, optionally augmented with extra zero channels) is integrated
through a learned vector field f(x, u) with the LAST buffered action held
constant, from 0 to the (normalized) prediction horizon, with an explicit
Euler solver of step size 0.05 (train_utils.py:731-737).

The reference's torchdiffeq call takes a data-dependent number of Euler
substeps; under jit we run a static number of masked substeps with per-step
sizes h_i = clip(t - i*h, 0, h), which reproduces torchdiffeq's
grid-plus-partial-final-step semantics exactly for any t < max_substeps*h.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import DynamicsModel, NormStats
from .common import mlp_apply_tanh, mlp_init

_STEP_SIZE = 0.05  # train_utils.py:736
_MAX_SUBSTEPS = 16  # covers normalized horizons up to 0.8 (exp grid tail)


def make_node_model(
    state_dim: int,
    action_dim: int,
    norm: NormStats,
    hidden_units: int = 270,
    augment_dim: int = 1,
    method: str = "euler",
    encode_obs_time: bool = False,
    normalize: bool = True,
    normalize_time: bool = True,
    dt: float = 0.05,
    dtype=jnp.float32,
) -> DynamicsModel:
    del method  # only euler is used by the reference config (config.py:40)
    state_mean = jnp.asarray(norm.state_mean, dtype)
    state_std = jnp.asarray(norm.state_std, dtype)

    def init(key):
        return {
            "ode_func": mlp_init(
                key,
                [
                    state_dim + action_dim + augment_dim,
                    hidden_units,
                    hidden_units,
                    state_dim + augment_dim,
                ],
                dtype=dtype,
            )
        }

    def apply(params, obs, action_buffer, ts):
        if normalize:
            x = (obs - state_mean) / state_std
        else:
            x = obs
        if ts.ndim == 2:
            ts = ts[..., 0]
        if normalize_time:
            ts = ts / (dt * 8.0)
        if action_buffer.ndim == 2:
            action_buffer = action_buffer[:, None, :]
        # last action, unnormalized (:730); slice off any time-age channel
        # (encode_obs_time appends one — the ODE func input is sized for
        # action_dim)
        u = action_buffer[:, -1, :action_dim]
        if augment_dim > 0:
            aug = jnp.zeros(x.shape[:-1] + (augment_dim,), dtype=x.dtype)
            x = jnp.concatenate([x, aug], axis=-1)

        def f(x_):
            return mlp_apply_tanh(params["ode_func"], jnp.concatenate([x_, u], axis=-1))

        t_remaining = ts.astype(x.dtype)
        for _ in range(_MAX_SUBSTEPS):
            h = jnp.clip(t_remaining, 0.0, _STEP_SIZE)
            x = x + h[:, None] * f(x)
            t_remaining = t_remaining - h
        return x[..., :state_dim]

    return DynamicsModel(name="node", init=init, apply=apply)

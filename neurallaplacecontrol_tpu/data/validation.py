"""Oracle-as-ground-truth model validation.

Rebuild of the reference's de-facto unit tests (overlay.py:86-219):
synthetic (state, action-buffer) pairs are generated, the "true" next state
is recomputed with the closed-form oracle at a fixed horizon ts=dt, and the
model's predicted state-difference is scored with MSE against the oracle's.
Everything is one jitted computation over the full validation set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..envs import Env, ORACLES
from .synthetic import generate_irregular_data_delay_time_multi


def compute_val_data_delay(
    env: Env,
    delay: int,
    key: jax.Array,
    samples_per_dim: int = 5,
    action_buffer_size: int = 4,
    encode_obs_time: bool = False,
):
    """(s0, a0, sn, ts) with sn REPLACED by the oracle one-step prediction at
    ts = dt (overlay.compute_val_data_delay:118-134 /
    get_val_loss_delay_time_multi:137-177)."""
    s0, a0, sn, _ = generate_irregular_data_delay_time_multi(
        env, key, delay,
        samples_per_dim=samples_per_dim,
        action_buffer_size=action_buffer_size,
        encode_obs_time=encode_obs_time,
    )
    ts = jnp.full((s0.shape[0], 1), env.spec.dt, dtype=s0.dtype)
    oracle = ORACLES[env.spec.name]
    sn = oracle(s0, a0, ts, delay, friction=env.spec.friction)
    return s0, a0, sn, ts


def get_val_loss_delay_time_multi(
    model_apply,
    params,
    env: Env,
    delay: int,
    key: Optional[jax.Array] = None,
    samples_per_dim: int = 5,
    action_buffer_size: int = 4,
    encode_obs_time: bool = False,
) -> float:
    """MSE(model state-diff, oracle state-diff) on fresh synthetic data
    (overlay.get_val_loss_delay_time_multi:137-177)."""
    key = jax.random.PRNGKey(0) if key is None else key
    s0, a0, sn, ts = compute_val_data_delay(
        env, delay, key,
        samples_per_dim=samples_per_dim,
        action_buffer_size=action_buffer_size,
        encode_obs_time=encode_obs_time,
    )
    return get_val_loss_delay_precomputed(model_apply, params, s0, a0, sn, ts)


def get_val_loss_delay_precomputed(model_apply, params, s0, a0, sn, ts) -> float:
    """MSE on a fixed validation set (overlay.get_val_loss_delay_precomputed
    :112-116)."""
    pred_sd = model_apply(params, s0, a0, ts)
    return float(jnp.mean((pred_sd - (sn - s0)) ** 2))

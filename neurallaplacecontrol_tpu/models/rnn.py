"""RNN and DeltaT-RNN baseline dynamics models.

Reference: train_utils.py:552-586 (RNN) and :589-631 (DeltaTRNN). Both run a
single-layer GRU over the action buffer and decode from [h_last, obs] — the
DeltaT variant additionally feeds the (normalized) prediction horizon into
the head, making it the only time-aware discrete baseline.

Note: the reference DeltaTRNN.forward has a dangling else (train_utils.py:
621-629) that would clobber normalized inputs when normalize_time=False;
since the shipped config always sets normalize=normalize_time=True
(config.py:31-32) we implement the sane semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import DynamicsModel, NormStats
from .common import gru_apply, gru_init, linear_apply, linear_init


def _make(
    state_dim: int,
    action_dim: int,
    norm: NormStats,
    hidden_units: int,
    with_dt: bool,
    encode_obs_time: bool = False,
    normalize: bool = True,
    normalize_time: bool = True,
    dt: float = 0.05,
    dtype=jnp.float32,
) -> DynamicsModel:
    # the time-age channel feeds the GRU un-normalized; the reference's
    # plain RNN crashes outright on encode_obs_time buffers and its
    # DeltaTRNN normalizes the age channel with the action std by broadcast
    # accident — both models here take the extra channel cleanly
    gru_in = action_dim + (1 if encode_obs_time else 0)
    head_in = hidden_units + state_dim + (1 if with_dt else 0)

    state_mean = jnp.asarray(norm.state_mean, dtype)
    state_std = jnp.asarray(norm.state_std, dtype)
    action_mean = jnp.asarray(norm.action_mean, dtype)
    action_std = jnp.asarray(norm.action_std, dtype)

    def init(key):
        k_gru, k_out = jax.random.split(key)
        return {
            "gru": gru_init(k_gru, gru_in, hidden_units, num_layers=1, dtype=dtype),
            "out": linear_init(k_out, head_in, state_dim, xavier=False, dtype=dtype),
        }

    def _norm_actions(action_buffer):
        acts = action_buffer[..., :action_dim]
        acts = (acts - action_mean) / action_std if normalize else acts / 3.0
        return jnp.concatenate([acts, action_buffer[..., action_dim:]], axis=-1)

    def apply(params, obs, action_buffer, ts):
        if normalize:
            obs_n = (obs - state_mean) / state_std
        else:
            obs_n = obs
        act_n = _norm_actions(action_buffer)
        h = gru_apply(params["gru"], act_n)
        if with_dt:
            if ts.ndim == 1:
                ts = ts[:, None]
            if normalize_time:
                ts = ts / (dt * 8.0)
            feats = jnp.concatenate([h, obs_n, ts.astype(h.dtype)], axis=-1)
        else:
            feats = jnp.concatenate([h, obs_n], axis=-1)
        return linear_apply(params["out"], feats)

    return DynamicsModel(name="delta_t_rnn" if with_dt else "rnn", init=init, apply=apply)


def make_rnn_model(state_dim, action_dim, norm, hidden_units=160, **kw) -> DynamicsModel:
    kw.pop("normalize_time", None)  # RNN ignores time (train_utils.py:578-586)
    return _make(state_dim, action_dim, norm, hidden_units, with_dt=False, **kw)


def make_delta_t_rnn_model(state_dim, action_dim, norm, hidden_units=160, **kw) -> DynamicsModel:
    return _make(state_dim, action_dim, norm, hidden_units, with_dt=True, **kw)

"""Irregular-time sequence baselines: standalone ODE-RNN and GRU-D-style
classic RNNs.

Rebuild of the latent-ODE library extras (reference baseline_models/
latent_ode_lib/ode_rnn.py:14-109 and rnn_baselines.py:33-345): sequence
models that consume irregularly-sampled trajectories [B, T, D] with
timestamps [T] and reconstruct/extrapolate the signal. The reference's
per-timestep Python loops become ``lax.scan``; the ODE evolution between
observations uses fixed Euler substeps (static shapes).

API (both families):
    params = model.init(key)
    y_hat  = model.reconstruct(params, x_seq, ts)   # [B,T,D] causal recon
    h_T    = model.encode(params, x_seq, ts)        # [B, latent]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .common import linear_apply, linear_init, mlp_apply_tanh, mlp_init


@dataclass(frozen=True)
class SequenceModel:
    name: str
    init: Callable
    encode: Callable  # (params, x_seq [B,T,D], ts [T]) -> [B, latent]
    reconstruct: Callable  # (params, x_seq, ts) -> [B,T,D]


def _gru_cell_init(key, in_dim, hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "ih": linear_init(k1, in_dim, 3 * hidden, dtype=dtype),
        "hh": linear_init(k2, hidden, 3 * hidden, dtype=dtype),
    }


def _gru_cell(params, x, h):
    gi = linear_apply(params["ih"], x)
    gh = linear_apply(params["hh"], h)
    i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
    reset = jax.nn.sigmoid(i_r + h_r)
    update = jax.nn.sigmoid(i_i + h_i)
    new = jnp.tanh(i_n + reset * h_n)
    return new + update * (h - new)


def make_ode_rnn(
    input_dim: int,
    latent_dim: int = 10,
    n_gru_units: int = 100,
    n_units: int = 100,
    rhs_units: int = 100,
    substeps: int = 4,
    dtype=jnp.float64,
) -> SequenceModel:
    """Standalone ODE-RNN (ode_rnn.py:14-109): between observations the
    hidden state evolves under a learned ODE dh/dt = f(h); at each
    observation a GRU cell updates it; a tanh-MLP decodes per-step outputs.
    """

    def init(key):
        k_rhs, k_gru, k_dec = jax.random.split(key, 3)
        return {
            "rhs": mlp_init(k_rhs, [latent_dim, rhs_units, latent_dim], dtype=dtype),
            "gru": _gru_cell_init(k_gru, input_dim, latent_dim, dtype),
            "dec": mlp_init(k_dec, [latent_dim, n_units, input_dim], dtype=dtype),
        }

    def _evolve(params, h, dt):
        step = dt / substeps

        def body(h, _):
            return h + step[..., None] * mlp_apply_tanh(params["rhs"], h), None

        h, _ = lax.scan(body, h, None, length=substeps)
        return h

    def _scan_hidden(params, x_seq, ts):
        B = x_seq.shape[0]
        h0 = jnp.zeros((B, latent_dim), x_seq.dtype)
        dts = jnp.diff(jnp.concatenate([ts[:1] * 0.0, ts]))

        def step(h, inp):
            x_t, dt = inp
            h = _evolve(params, h, jnp.broadcast_to(dt, (B,)))
            h = _gru_cell(params["gru"], x_t, h)
            return h, h

        x_tmajor = jnp.swapaxes(x_seq, 0, 1)  # [T,B,D]
        h_last, hs = lax.scan(step, h0, (x_tmajor, dts))
        return h_last, hs

    def encode(params, x_seq, ts):
        h_last, _ = _scan_hidden(params, x_seq, ts)
        return h_last

    def reconstruct(params, x_seq, ts):
        _, hs = _scan_hidden(params, x_seq, ts)
        out = mlp_apply_tanh(params["dec"], hs)  # tanh hidden, linear out
        return jnp.swapaxes(out, 0, 1)

    return SequenceModel("ode_rnn", init, encode, reconstruct)


def make_classic_rnn(
    input_dim: int,
    latent_dim: int = 100,
    cell: str = "gru",  # 'gru' | 'expdecay' (GRU-D style)
    n_units: int = 100,
    dtype=jnp.float64,
) -> SequenceModel:
    """Classic RNN over irregular samples (rnn_baselines.py Classic_RNN
    :217-345). cell='expdecay' multiplies the hidden state by
    exp(-clip(decay_net(delta_t), 0, 1000)) before each update — the GRU-D
    mechanism of GRUCellExpDecay (:33-70), with the time gap as the decay
    feature.
    """
    assert cell in ("gru", "expdecay"), cell

    def init(key):
        k_gru, k_dec, k_decay = jax.random.split(key, 3)
        params = {
            "gru": _gru_cell_init(k_gru, input_dim, latent_dim, dtype),
            "dec": mlp_init(k_dec, [latent_dim, n_units, input_dim], dtype=dtype),
        }
        if cell == "expdecay":
            params["decay"] = linear_init(k_decay, 1, 1, dtype=dtype)
        return params

    def _scan_hidden(params, x_seq, ts):
        B = x_seq.shape[0]
        h0 = jnp.zeros((B, latent_dim), x_seq.dtype)
        dts = jnp.diff(jnp.concatenate([ts[:1] * 0.0, ts]))

        def step(h, inp):
            x_t, dt = inp
            if cell == "expdecay":
                d = linear_apply(params["decay"], jnp.full((B, 1), dt, x_seq.dtype))
                h = h * jnp.exp(-jnp.clip(d, 0.0, 1000.0))
            h = _gru_cell(params["gru"], x_t, h)
            return h, h

        h_last, hs = lax.scan(step, h0, (jnp.swapaxes(x_seq, 0, 1), dts))
        return h_last, hs

    def encode(params, x_seq, ts):
        return _scan_hidden(params, x_seq, ts)[0]

    def reconstruct(params, x_seq, ts):
        _, hs = _scan_hidden(params, x_seq, ts)
        return jnp.swapaxes(mlp_apply_tanh(params["dec"], hs), 0, 1)

    return SequenceModel(f"classic_rnn_{cell}", init, encode, reconstruct)

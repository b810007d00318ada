"""Dynamics model families with the uniform (obs, action_buffer, ts) -> Δs
interface: Neural Laplace (flagship), RNN, DeltaT-RNN, NODE, latent-ODE."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from .base import DynamicsModel, NormStats, norm_stats_for  # noqa: F401
from .common import count_params, cast_params  # noqa: F401
from .nl import make_nl_model  # noqa: F401
from .rnn import make_rnn_model, make_delta_t_rnn_model  # noqa: F401
from .node import make_node_model  # noqa: F401

MODEL_NAMES = ("nl", "rnn", "delta_t_rnn", "node", "latent_ode")


def make_model(
    model_name: str,
    env_name: str,
    state_dim: int,
    action_dim: int,
    action_high: float,
    config: Config = Config(),
    dtype=jnp.float32,
) -> DynamicsModel:
    """Model factory mirroring the get_*_model helpers at reference
    train_utils.py:29-156 (latent dims, hidden sizes, normalization stats)."""
    norm = norm_stats_for(env_name, action_high, action_dim)
    common = dict(
        encode_obs_time=config.encode_obs_time,
        normalize=config.normalize,
        normalize_time=config.normalize_time,
        dt=config.dt,
        dtype=dtype,
    )
    if model_name == "nl":
        return make_nl_model(
            state_dim,
            action_dim,
            norm,
            hidden_units=config.nl_hidden_units,
            s_recon_terms=config.nl_s_recon_terms,
            ilt_algorithm=config.nl_ilt_algorithm,
            compute_dtype=config.nl_compute_dtype,
            **common,
        )
    if model_name == "rnn":
        common.pop("normalize_time")
        return make_rnn_model(state_dim, action_dim, norm, hidden_units=config.rnn_hidden_units, **common)
    if model_name == "delta_t_rnn":
        return make_delta_t_rnn_model(
            state_dim, action_dim, norm, hidden_units=config.rnn_hidden_units, **common
        )
    if model_name == "node":
        return make_node_model(
            state_dim,
            action_dim,
            norm,
            hidden_units=config.node_hidden_units,
            augment_dim=config.node_augment_dim,
            method=config.node_method,
            **common,
        )
    if model_name == "latent_ode":
        from .latent_ode import make_latent_ode_model

        return make_latent_ode_model(
            state_dim,
            action_dim,
            norm,
            hidden_units=config.latent_ode_hidden_units,
            obsrv_std=config.latent_ode_obsrv_std,
            action_buffer_size=config.action_buffer_size,
            **common,
        )
    if model_name == "latent_ode_ref":
        # reference-layout twin for `.pt` checkpoint transplants (see
        # models/latent_ode_ref.py; import weights via
        # interop.latent_ode_params_from_state_dict). Planner-usable through
        # the uniform apply; training this family stays with "latent_ode".
        from .latent_ode_ref import make_ref_latent_ode_model

        return make_ref_latent_ode_model(
            state_dim,
            action_dim,
            norm,
            hidden_units=config.latent_ode_hidden_units,
            action_buffer_size=config.action_buffer_size,
            **common,
        )
    raise ValueError(f"Unknown model: {model_name}")

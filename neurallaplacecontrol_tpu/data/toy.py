"""Toy trajectory datasets for sequence-model experiments.

Rebuild of reference baseline_models/latent_ode_lib/parse_datasets.py:14-43
(sine and delayed-ramp-loading DDE solutions) with the same grids and
scaling; subsampling helpers replace the torch DataLoader collate path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sine(trajectories_to_sample: int = 100, t_end: float = 20.0,
         t_nsamples: int = 200):
    """(trajectories [N,T,1], t [T]) — parse_datasets.sine:14-22."""
    t = jnp.linspace(t_end / t_nsamples, t_end, t_nsamples)
    y = jnp.sin(t)
    return jnp.broadcast_to(y[None, :, None], (trajectories_to_sample, t_nsamples, 1)), t


def dde_ramp_loading_time_sol(trajectories_to_sample: int = 100,
                              t_end: float = 20.0, t_nsamples: int = 200):
    """Closed-form solution of the delayed ramp-loading problem
    (parse_datasets.dde_ramp_loading_time_sol:25-42)."""
    t = jnp.linspace(t_end / t_nsamples, t_end, t_nsamples)
    seg1 = 0.25 * ((t - 5) - 0.5 * jnp.sin(2 * (t - 5)))
    seg2 = 0.25 * (
        (t - 5) - (t - 10) - 0.5 * jnp.sin(2 * (t - 5)) + 0.5 * jnp.sin(2 * (t - 10))
    )
    y = jnp.where(t < 5, 0.0, jnp.where(t < 10, seg1, seg2)) / 5.0
    return jnp.broadcast_to(y[None, :, None], (trajectories_to_sample, t_nsamples, 1)), t


TOY_DATASETS = {"sine": sine, "dde_ramp": dde_ramp_loading_time_sol}


def subsample_irregular(key: jax.Array, trajectories: jnp.ndarray, t: jnp.ndarray,
                        n_points: int):
    """Pick a sorted random subset of time points per call (the irregular
    sampling the latent-ODE pipeline trains on)."""
    idx = jnp.sort(jax.random.choice(key, t.shape[0], (n_points,), replace=False))
    return trajectories[:, idx], t[idx]

"""Replay-buffer artifacts: write-once .npz caches keyed by every collection
hyperparameter (same cache-key discipline as the reference's .pt files,
mppi_dataset_collector.py:354-363,441)."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np


def replay_buffer_filename(
    env_name: str,
    delay: int,
    model_name: str = "oracle",
    encode_obs_time: bool = False,
    action_buffer_size: int = 4,
    ts_grid: str = "exp",
    random_action_noise=1.0,
    observation_noise=0.0,
    friction: bool = False,
) -> str:
    """Mirrors the reference cache key (mppi_dataset_collector.py:354-359)."""
    return (
        f"replay_buffer_env-name-{env_name}_delay-{delay}_model-name-{model_name}"
        f"_encode-obs-time-{encode_obs_time}_action-buffer-size-{action_buffer_size}"
        f"_ts-grid-{ts_grid}_random-action-noise-{random_action_noise}"
        f"_observation-noise-{observation_noise}_friction-{friction}.npz"
    )


def save_replay_buffer(path, s0, a0, sn, ts) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        s0=np.asarray(s0),
        a0=np.asarray(a0),
        sn=np.asarray(sn),
        ts=np.asarray(ts),
    )


def load_replay_buffer(path):
    with np.load(path) as z:
        return (
            jnp.asarray(z["s0"]),
            jnp.asarray(z["a0"]),
            jnp.asarray(z["sn"]),
            jnp.asarray(z["ts"]),
        )

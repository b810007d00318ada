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


def _rbuf_path(path) -> str:
    return str(path).replace(".npz", "") + ".rbuf"


def save_replay_buffer(path, s0, a0, sn, ts) -> None:
    """Write the portable .npz plus, when the native runtime is available,
    the mmap-able .rbuf sibling (runtime/replaybuf.cc) that loads O(1)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        s0=np.asarray(s0),
        a0=np.asarray(a0),
        sn=np.asarray(sn),
        ts=np.asarray(ts),
    )
    from .. import runtime

    runtime.write_buffer(_rbuf_path(path), s0, a0, sn, ts)


def load_replay_buffer(path):
    """Prefer the zero-copy native mapping; fall back to .npz."""
    from .. import runtime

    rb_path = _rbuf_path(path)
    if Path(rb_path).exists() and runtime.get_lib() is not None:
        with np.load(path) as z:  # shapes come from the portable sibling
            shapes = {k: z[k].shape[1:] for k in ("s0", "a0", "sn", "ts")}
            f32 = all(z[k].dtype == np.float32 for k in ("s0", "a0", "sn", "ts"))
        if f32:  # the native store is float32; fall through for f64 data
            rb = runtime.open_buffer(rb_path, shapes)
            out = tuple(jnp.asarray(rb.arrays[k]) for k in ("s0", "a0", "sn", "ts"))
            rb.close()
            return out
    with np.load(path) as z:
        return (
            jnp.asarray(z["s0"]),
            jnp.asarray(z["a0"]),
            jnp.asarray(z["sn"]),
            jnp.asarray(z["ts"]),
        )

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
    the mmap-able .rbuf sibling (runtime/replaybuf.cc) that loads O(1).

    A pre-existing .rbuf is removed FIRST so that a failed (or unavailable)
    native write can never leave a stale sibling silently shadowing the
    fresh .npz on the next load."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rb_path = Path(_rbuf_path(path))
    rb_path.unlink(missing_ok=True)
    np.savez_compressed(
        path,
        s0=np.asarray(s0),
        a0=np.asarray(a0),
        sn=np.asarray(sn),
        ts=np.asarray(ts),
    )
    from .. import runtime

    ok = runtime.write_buffer(str(rb_path), s0, a0, sn, ts)
    if not ok:
        rb_path.unlink(missing_ok=True)


def _npz_metadata(path):
    """(shapes, dtypes) per array WITHOUT decompressing any payload: reads
    only each member's .npy header from the zip."""
    import zipfile

    shapes, dtypes = {}, {}
    with zipfile.ZipFile(path) as zf:
        for name in zf.namelist():
            key = name[:-4] if name.endswith(".npy") else name
            with zf.open(name) as f:
                version = np.lib.format.read_magic(f)
                shape, _, dtype = np.lib.format._read_array_header(f, version)
            shapes[key] = shape
            dtypes[key] = dtype
    return shapes, dtypes


def load_replay_buffer(path):
    """Prefer the zero-copy native mapping; fall back to .npz."""
    from .. import runtime

    rb_path = _rbuf_path(path)
    if Path(rb_path).exists() and runtime.get_lib() is not None:
        # header-only metadata read — no payload decompression
        try:
            shapes_full, dtypes = _npz_metadata(path)
        except Exception:
            shapes_full, dtypes = None, None
        if shapes_full is not None and all(
            dtypes[k] == np.float32 for k in ("s0", "a0", "sn", "ts")
        ):  # the native store is float32; fall through for f64 data
            shapes = {k: shapes_full[k][1:] for k in ("s0", "a0", "sn", "ts")}
            try:
                rb = runtime.open_buffer(rb_path, shapes)
            except IOError:
                rb = None  # corrupt/truncated sibling: use the .npz
            if rb is not None and rb.arrays["s0"].shape[0] == shapes_full["s0"][0]:
                # copy BEFORE close: jnp.asarray zero-copies aligned numpy
                # buffers on the CPU backend, and close() munmaps the pages
                # under such aliases (use-after-free)
                host = rb.copy_arrays()
                rb.close()
                return tuple(jnp.asarray(host[k]) for k in ("s0", "a0", "sn", "ts"))
            if rb is not None:
                rb.close()  # row-count mismatch: stale sibling, use the .npz
    with np.load(path) as z:
        return (
            jnp.asarray(z["s0"]),
            jnp.asarray(z["a0"]),
            jnp.asarray(z["sn"]),
            jnp.asarray(z["ts"]),
        )

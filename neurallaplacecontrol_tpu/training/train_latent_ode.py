"""Latent-ODE training path.

The latent-ODE trains on history windows built from consecutive dataset
rows (reference train_utils.py:371-378 via tensor.unfold): for window i the
encoder sees observations/actions from rows [i .. i+A-1] and regresses the
reference's (quirky) target sn[i] - s0[i+A-1] at horizon ts[i] — see
build_history_windows. Loss is the IWAE bound from
models.latent_ode.train_step (reference w_latent_ode.py:97-131 ->
compute_all_losses).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..utils.checkpoint import save_pytree
from ..utils.timing import Timer
from .train import get_epoch_data, make_optimizer

logger = logging.getLogger(__name__)


def build_history_windows(s0, a0, sn, ts, window: int):
    """[N, ...] rows -> ([N-A+1, A, n], [N-A+1, A, m], targets, horizons).

    REFERENCE-QUIRK alignment preserved for parity (train_utils.py:373-378,
    :391-398): window i is paired with the FIRST M rows of (sn, ts), i.e.
    target = sn[i] - history_s0[i, -1] at horizon ts[i] — the target state
    precedes the window's newest frame rather than following it. The
    uniform-signature models never see this path; it only shapes the
    latent-ODE baseline exactly as the reference shaped it.
    """
    N = s0.shape[0]
    M = N - window + 1
    idx = jnp.arange(M)[:, None] + jnp.arange(window)[None, :]  # [M, A]
    hist_s = s0[idx]  # [M, A, n]
    current_a = a0[:, -1, :]  # newest action per row (train_utils.py:372)
    hist_a = current_a[idx]  # [M, A, m]
    sn_m, ts_m = sn[:M], ts[:M]
    target = sn_m - hist_s[:, -1, :]
    return hist_s, hist_a, target, ts_m


def train_latent_ode(
    model, params, env, env_name, config: Config, delay, ckpt_path,
    end_training_after_seconds=None,
):
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    batch_size = config.training_batch_size
    A = config.action_buffer_size

    @partial(jax.jit, donate_argnums=(0, 1))
    def segment_fn(params, opt_state, key, hist_s, hist_a, target, ts, batch_idx):
        def update(carry, inp):
            params, opt_state, key = carry
            idx = inp
            key, k = jax.random.split(key)

            def loss_fn(p):
                return model.train_step(p, k, hist_s[idx], hist_a[idx], ts[idx], target[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            update, (params, opt_state, key), batch_idx
        )
        return params, opt_state, losses

    budget = (
        end_training_after_seconds
        if end_training_after_seconds is not None
        else config.end_training_after_seconds
    )
    timer = Timer()
    best_loss = float("inf")
    epoch_losses = []
    data_key = jax.random.PRNGKey(1)
    compiled = set()
    stop = False
    last_loss = float("nan")

    for epoch_i in range(config.training_epochs):
        # epoch-level budget guard: tiny datasets can yield zero segments,
        # in which case the per-segment cutoff below never runs (train.py
        # has the same guard)
        if budget is not None and timer.elapsed() > budget:
            break
        data_key, k_data, k_perm, k_train = jax.random.split(data_key, 4)
        with timer.exclude():
            s0, a0, sn, ts = get_epoch_data(env, env_name, delay, config, k_data)
            hist_s, hist_a, target, ts_m = build_history_windows(s0, a0, sn, ts, A)
        perm = jax.random.permutation(k_perm, hist_s.shape[0])
        n_batches = perm.shape[0] // batch_size
        seg_len = max(1, min(config.iters_per_log, n_batches))
        n_segments = n_batches // seg_len
        batches = perm[: n_segments * seg_len * batch_size].reshape(
            n_segments, seg_len, batch_size
        )
        seg_losses = []
        for seg_i in range(n_segments):
            k_seg = jax.random.fold_in(k_train, seg_i)  # fresh IWAE noise per segment
            shape_key = (seg_len, batch_size, hist_s.shape[0])
            if shape_key not in compiled:
                with timer.exclude():
                    params, opt_state, losses = segment_fn(
                        params, opt_state, k_seg, hist_s, hist_a, target, ts_m, batches[seg_i]
                    )
                    jax.block_until_ready(losses)
                compiled.add(shape_key)
            else:
                params, opt_state, losses = segment_fn(
                    params, opt_state, k_seg, hist_s, hist_a, target, ts_m, batches[seg_i]
                )
            track = float(jnp.mean(losses))
            last_loss = float(losses[-1])
            seg_losses.append(track)
            elapsed = timer.elapsed()
            logger.info(
                "[%s latent_ode d=%d][epoch=%04d|seg=%03d|t=%.0f/%s] loss=%g",
                env_name, delay, epoch_i + 1, seg_i + 1, elapsed, budget, track,
            )
            if track < best_loss:
                best_loss = track
                with timer.exclude():
                    save_pytree(ckpt_path, params)
            if budget is not None and elapsed > budget:
                stop = True
                break
        epoch_losses.append(sum(seg_losses) / max(len(seg_losses), 1))
        if stop:
            break

    save_pytree(ckpt_path, params)
    results = {
        "train_loss": last_loss,
        "best_val_loss": best_loss,
        "epoch_losses": epoch_losses,
        "total_reward": None,
        "train_seconds": timer.elapsed(),
    }
    return model, params, results

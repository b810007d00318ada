"""Delay-ensemble training: train one model family on several action-delay
variants SIMULTANEOUSLY as a vmapped parameter ensemble.

The reference trains the experiment grid's delay axis sequentially — one
`train_model` process per (model, env, delay) cell fanned over a CPU pool
(run_exp_multi.py:103-132). On TPU these dynamics models are tiny (<100k
params, batch 16), so one chip stepping a single model is launch-bound, not
FLOP-bound; stacking the per-delay parameter trees on a leading axis and
``jax.vmap``-ing the optimizer step trains all delays in one device launch
at nearly the cost of one.

Semantics per delay are identical to training.train.train_model: same
objective MSE(model(s0, a0, ts), sn - s0), same optimizer chain, same
key stream (PRNGKey(model_seed + 10_000), split per epoch), same batch
permutations (shared across delays — each delay has its own dataset, the
index stream is common), same per-segment best-loss checkpointing to the
same per-delay checkpoint names. A 1-delay ensemble reproduces
train_model's parameter trajectory exactly (tested).

CAVEAT (measured, round 2; root cause CLOSED, round 4): semantic
equivalence is not numerical equivalence. The vmapped update's batched
GEMMs accumulate in a different order, so after ~10^6 f32 updates the
ensemble walks a different SGD trajectory than individual training —
equivalent to a different random draw. For loss-plateaued baseline
families this is immaterial, but for the NL flagship one such draw
(pendulum, delay 3) reached the same train MSE (8e-4) while losing action
sensitivity from the hanging state, and MPPI through it never swung up
(-799 vs -140 episode reward). Individual training on the same data/seed
reproduced the good model (artifacts/run_nl_d3_diag.log).

Round-4 probe (scripts/ensemble_numerics_probe.py,
artifacts/ensemble_numerics_probe_r4.jsonl) pinpointed and closed the root
cause: the perturbation enters through the vmapped f32 forward/backward
GEMMs themselves — a same-data two-member ensemble is BIT-IDENTICAL to the
real one (members don't interact), while f64 optimizer state and
Kahan-compensated parameter updates both diverge from the individual
trajectory at the same ~5e-3 relative distance as plain f32. Nothing the
optimizer computes can undo a 1-ulp gradient difference amplified by SGD
chaos, and full-f64 training is unsupported on TPU. The PERMANENT answer
is operational: use the ensemble for cheap baselines; train the
control-critical flagship per delay (--ensemble_exclude nl, the default),
or gate ensemble output with a post-training control eval
(--ensemble_gate).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..envs import make_env
from ..models import count_params, make_model
from ..utils.checkpoint import load_pytree, model_checkpoint_name, save_pytree
from ..utils.timing import Timer
from .train import get_epoch_data, make_optimizer

logger = logging.getLogger(__name__)


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _slice_tree(tree, d):
    return jax.tree_util.tree_map(lambda x: x[d], tree)


def _make_ensemble_segment_fn(model_apply, optimizer):
    """Vmapped twin of train.make_train_segment_fn: leading axis = delay."""

    def one_delay(params, opt_state, s0, a0, sn, ts, batch_idx):
        def update(carry, idx):
            params, opt_state = carry

            def loss_fn(p):
                pred = model_apply(p, s0[idx], a0[idx], ts[idx])
                target = sn[idx] - s0[idx]
                return jnp.mean((jnp.squeeze(pred) - jnp.squeeze(target)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(update, (params, opt_state), batch_idx)
        return params, opt_state, losses

    # batch_idx is shared across delays (in_axes=None); data and state are
    # stacked on the delay axis
    vm = jax.vmap(one_delay, in_axes=(0, 0, 0, 0, 0, 0, None))
    return jax.jit(vm, donate_argnums=(0, 1))


def _make_latent_ode_segment_fn(train_step, optimizer):
    def one_delay(params, opt_state, key, hist_s, hist_a, target, ts, batch_idx):
        def update(carry, idx):
            params, opt_state, key = carry
            key, k = jax.random.split(key)

            def loss_fn(p):
                return train_step(p, k, hist_s[idx], hist_a[idx], ts[idx], target[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            update, (params, opt_state, key), batch_idx
        )
        return params, opt_state, losses

    vm = jax.vmap(one_delay, in_axes=(0, 0, 0, 0, 0, 0, 0, None))
    return jax.jit(vm, donate_argnums=(0, 1))


def train_model_ensemble(
    model_name: str,
    env_name: str,
    config: Config = Config(),
    delays: Sequence[int] = (0, 1, 2, 3),
    retrain: bool = True,
    force_retrain: bool = False,
    model_seed: int = 0,
    start_from_checkpoint: bool = True,
    end_training_after_seconds: Optional[float] = None,
) -> dict:
    """Train one model family on all ``delays`` at once.

    Returns {delay: (model, params, results)} — checkpoints land under the
    same names train_model uses, so evaluate_policy / train_model(
    retrain=False) load them transparently.
    """
    delays = list(delays)
    env = make_env(env_name, ts_grid=config.ts_grid, dt=config.dt * config.train_dt_multiple)
    spec = env.spec
    model = make_model(
        model_name, env_name, spec.n_obs, spec.m, spec.action_high, config,
        dtype=jnp.result_type(float),
    )
    ckpt_paths = {
        d: os.path.join(
            config.saved_models_path,
            model_checkpoint_name(
                model_name, env_name, d, config.ts_grid, model_seed,
                config.train_with_expert_trajectories,
                training_epochs=None if config.end_training_after_seconds else config.training_epochs,
                samples_used=config.training_use_only_samples,
            ),
        )
        for d in delays
    }

    # same-seed init per delay = the reference's per-cell seed_all(seed)
    params0 = model.init(jax.random.PRNGKey(model_seed))
    per_delay_params = []
    for d in delays:
        p = params0
        if not force_retrain and start_from_checkpoint and os.path.isfile(ckpt_paths[d]):
            p = load_pytree(ckpt_paths[d], params0)
        per_delay_params.append(p)
    params_e = _stack_trees(per_delay_params)
    logger.info(
        "[%s %s delays=%s] ensemble params=%d x %d delays",
        env_name, model_name, delays, count_params(params0), len(delays),
    )

    optimizer = make_optimizer(config)
    opt_state_e = jax.vmap(optimizer.init)(params_e)

    is_latent = model_name == "latent_ode"
    if is_latent:
        from .train_latent_ode import build_history_windows

        segment_fn = _make_latent_ode_segment_fn(model.train_step, optimizer)
        batch_size = config.training_batch_size
        data_key = jax.random.PRNGKey(1)  # train_latent_ode key stream
    else:
        segment_fn = _make_ensemble_segment_fn(model.apply, optimizer)
        # node's reference-side batch_size=1 is a torchdiffeq limitation
        # (shared time grid per odeint call, train_utils.py:319-322); our
        # integrator takes per-sample horizons, so the ensemble trains node
        # at the standard batch size — documented deviation
        batch_size = config.training_batch_size
        data_key = jax.random.PRNGKey(model_seed + 10_000)  # train.py stream

    budget = (
        end_training_after_seconds
        if end_training_after_seconds is not None
        else config.end_training_after_seconds
    )
    timer = Timer()
    D = len(delays)
    best_loss = [float("inf")] * D
    last_loss = [float("nan")] * D
    epoch_losses = []
    compiled = set()
    stop = False

    for epoch_i in range(config.training_epochs):
        if budget is not None and timer.elapsed() > budget:
            break
        data_key, k_data, k_perm, k_sub = jax.random.split(data_key, 4)
        with timer.exclude():  # dataset build/load outside the budget
            per_delay = [get_epoch_data(env, env_name, d, config, k_data) for d in delays]
            n_min = min(x[0].shape[0] for x in per_delay)
            per_delay = [tuple(arr[:n_min] for arr in x) for x in per_delay]
            if config.training_use_only_samples is not None:
                idx = jax.random.permutation(k_sub, n_min)
                idx = idx[: config.training_use_only_samples]
                per_delay = [tuple(arr[idx] for arr in x) for x in per_delay]
                n_min = min(config.training_use_only_samples, n_min)
            if is_latent:
                A = config.action_buffer_size
                per_delay = [build_history_windows(*x, A) for x in per_delay]
                n_min = per_delay[0][0].shape[0]
            data_e = tuple(
                jnp.stack([x[i] for x in per_delay]) for i in range(len(per_delay[0]))
            )
        batch_size_eff = min(batch_size, n_min)
        perm = jax.random.permutation(k_perm, n_min)
        n_batches = n_min // batch_size_eff
        seg_len = max(1, min(config.iters_per_log, n_batches))
        n_segments = n_batches // seg_len
        batches = perm[: n_segments * seg_len * batch_size_eff].reshape(
            n_segments, seg_len, batch_size_eff
        )

        if is_latent:
            data_key, k_train = jax.random.split(data_key)

        seg_losses = []
        for seg_i in range(n_segments):
            args = (params_e, opt_state_e)
            if is_latent:
                k_seg = jax.random.fold_in(k_train, seg_i)
                keys = jnp.stack([jax.random.fold_in(k_seg, i) for i in range(D)])
                args += (keys,)
            args += data_e + (batches[seg_i],)
            shape_key = (seg_len, batch_size_eff, n_min)
            if shape_key not in compiled:
                with timer.exclude():  # jit compile excluded from budget
                    params_e, opt_state_e, losses = segment_fn(*args)
                    jax.block_until_ready(losses)
                compiled.add(shape_key)
            else:
                params_e, opt_state_e, losses = segment_fn(*args)
            mean_losses = jnp.mean(losses, axis=1)  # [D]
            seg_losses.append([float(x) for x in mean_losses])
            last_loss = [float(x) for x in losses[:, -1]]
            elapsed = timer.elapsed()
            logger.info(
                "[%s %s delays=%s][epoch=%04d|seg=%03d/%03d|t=%.0f/%s] train_loss=%s",
                env_name, model_name, delays, epoch_i + 1, seg_i + 1, n_segments,
                elapsed, budget,
                "/".join(f"{float(x):g}" for x in mean_losses),
            )
            with timer.exclude():
                for i, d in enumerate(delays):
                    if float(mean_losses[i]) < best_loss[i]:
                        best_loss[i] = float(mean_losses[i])
                        save_pytree(ckpt_paths[d], _slice_tree(params_e, i))
            if budget is not None and elapsed > budget:
                logger.info(
                    "[%s %s delays=%s] Ending training (budget)",
                    env_name, model_name, delays,
                )
                stop = True
                break
        if seg_losses:
            epoch_losses.append(
                [sum(col) / len(seg_losses) for col in zip(*seg_losses)]
            )
        if stop:
            break

    out = {}
    train_seconds = timer.elapsed()
    for i, d in enumerate(delays):
        params_d = _slice_tree(params_e, i)
        save_pytree(ckpt_paths[d], params_d)
        out[d] = (
            model,
            params_d,
            {
                "train_loss": last_loss[i],
                "best_val_loss": best_loss[i],
                "epoch_losses": [row[i] for row in epoch_losses],
                "train_seconds": train_seconds,
                "ensemble_delays": delays,
            },
        )
    return out

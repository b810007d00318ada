"""Training harness: jitted optax steps, epoch-fresh data, wall-clock budget,
best-loss checkpointing.

Rebuild of reference train_utils.train_model (:159-492):
- per-epoch fresh dataset (expert replay or synthetic regeneration,
  :353-370)
- minibatch loop, loss = MSE(model(s0, a0, ts), sn - s0) (:388-408)
- Adam + global-norm grad clip 0.1 (:297-301, :406), optional StepLR
- best-loss checkpointing every iters_per_log (:440-448)
- wall-clock cutoff (:415-425) — compile time is excluded from the budget so
  TPU jit warmup doesn't eat training time (SURVEY.md §7 hard part 6)
- reject-don't-clip guard (beyond reference): non-finite or exploding
  batches (Config.training_loss_skip_factor x previous segment median)
  are skipped without touching params or Adam moments — the reference's
  f64 torch path never overflows, our railed f32 ILT heads can

TPU notes: the update step is one jit with donated (params, opt_state); the
whole epoch's minibatch loop runs as a ``lax.scan`` over pre-shuffled batch
indices, so an epoch is a single device launch (no per-batch host round
trips — the reference pays one python iteration per batch).
"""

from __future__ import annotations

import logging
import math
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..envs import make_env
from ..models import DynamicsModel, count_params, make_model
from ..utils.checkpoint import (
    load_pytree,
    model_checkpoint_name,
    resolve_checkpoint,
    save_pytree,
)
from ..utils.timing import Timer

logger = logging.getLogger(__name__)


def _zap_nonfinite() -> optax.GradientTransformation:
    """Replace non-finite gradient ELEMENTS (NaN and +/-Inf) with zero.

    optax.zero_nans only zaps NaN: an Inf gradient element — one railed
    f32 overflow step on the dehoog/cme ILT paths is enough — passes
    through, clip_by_global_norm then computes an inf norm, inf * 0 = NaN
    in the rescale, and the params are poisoned permanently (observed:
    dehoog pendulum-d1 training died at t=799/900 s with train_loss=nan
    for every step after, logs/run_ilt_dehoog_r5.log:2676). Zapping all
    non-finite elements makes such a step a one-batch hiccup instead.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: Config):
    # zap non-finite grads first: a rare f32 overflow step (huge ILT
    # prefactor x saturated sphere output) must not poison the adam moments
    steps = [_zap_nonfinite(), optax.clip_by_global_norm(config.clip_grad_norm)]
    if config.weight_decay:
        steps.append(optax.add_decayed_weights(config.weight_decay))
    lr = config.learning_rate
    if config.use_lr_scheduler:
        lr = optax.exponential_decay(
            config.learning_rate,
            transition_steps=config.lr_scheduler_step_size,
            decay_rate=config.lr_scheduler_gamma,
            staircase=True,
        )
    steps.append(optax.adam(lr))
    return optax.chain(*steps)


def make_train_segment_fn(model: DynamicsModel, optimizer):
    """One jitted training segment: scan the update step over a [S, bs] block
    of batch indices (S = iters_per_log batches per device launch, matching
    the reference's logging/checkpoint cadence at train_utils.py:410-448)."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def segment_fn(params, opt_state, s0, a0, sn, ts, batch_idx, loss_cap=jnp.inf):
        def update(carry, idx):
            params, opt_state = carry

            def loss_fn(p):
                pred = model.apply(p, s0[idx], a0[idx], ts[idx])
                target = sn[idx] - s0[idx]
                return jnp.mean((jnp.squeeze(pred) - jnp.squeeze(target)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            # reject-don't-clip: a non-finite or exploding batch (loss above
            # ``loss_cap``, which train_model derives from the previous
            # segment's median via Config.training_loss_skip_factor) must
            # move NEITHER params NOR the Adam moments. Clipping alone
            # bounds the step size but still walks a converged model in a
            # garbage direction and poisons the moments — observed as
            # recurring 4e-4 -> 1e18 loss kicks on the dehoog ILT head
            # (artifacts/ilt_train_r5/). The loss is still reported so
            # skipped batches stay visible in the training log.
            ok = jnp.isfinite(loss) & (loss <= loss_cap)
            params = optax.apply_updates(
                params,
                jax.tree_util.tree_map(
                    lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
                ),
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(update, (params, opt_state), batch_idx)
        return params, opt_state, losses

    return segment_fn


def get_epoch_data(env, env_name, delay, config: Config, key):
    # local import: data.collector itself builds on training.rollout
    from ..data import collect_expert_data, generate_irregular_data_delay_time_multi

    if config.train_with_expert_trajectories:
        return collect_expert_data(env_name, delay, config=config)
    return generate_irregular_data_delay_time_multi(
        env,
        key,
        delay=delay,
        samples_per_dim=config.train_samples_per_dim,
        rand=config.rand_sample,
        action_buffer_size=config.action_buffer_size,
        encode_obs_time=config.encode_obs_time,
        reuse_state_actions_when_sampling_times=config.reuse_state_actions_when_sampling_times,
    )


def _checkpoint_read_path(
    ckpt_name: str, config: Config, retrain: bool, force_retrain: bool
) -> str:
    """Where a checkpoint LOAD may come from (never where saves go).

    Eval-only runs (retrain=False, the reference's load-if-exists path,
    train_utils.py:282-284) fall back to the tracked artifacts/checkpoints/
    when saved_models/ has no file, so a fresh clone evaluates out of the
    box. STRICTLY eval-only: a training run (retrain/force_retrain) must
    never warm-start from the shipped weights via start_from_checkpoint, or
    "trained in N seconds" results would silently be fine-tunes of the
    distributed checkpoints. And only when the caller left
    saved_models_path at its default: a custom path (tests, isolation)
    stays strict.
    """
    ckpt_path = os.path.join(config.saved_models_path, ckpt_name)
    # path comparison is normalized: './saved_models/', 'saved_models' and
    # an absolute spelling of the default all engage the fallback (advisor
    # r4: exact string equality silently disabled it for equivalent paths)
    if (
        not retrain
        and not force_retrain
        and not os.path.isfile(ckpt_path)
        and os.path.realpath(config.saved_models_path)
        == os.path.realpath(Config.saved_models_path)
    ):
        return resolve_checkpoint(ckpt_name)
    return ckpt_path


def train_model(
    model_name: str,
    env_name: str,
    config: Config = Config(),
    delay: int = 0,
    retrain: bool = False,
    force_retrain: bool = False,
    model_seed: int = 0,
    start_from_checkpoint: bool = True,
    end_training_after_seconds: Optional[float] = None,
) -> Tuple[DynamicsModel, dict, dict]:
    """Train (or load) a dynamics model. Returns (model, params, results)."""
    ckpt_name = model_checkpoint_name(
        model_name,
        env_name,
        delay,
        config.ts_grid,
        model_seed,
        config.train_with_expert_trajectories,
        training_epochs=None if config.end_training_after_seconds else config.training_epochs,
        samples_used=config.training_use_only_samples,
    )
    ckpt_path = os.path.join(config.saved_models_path, ckpt_name)
    ckpt_read_path = _checkpoint_read_path(ckpt_name, config, retrain, force_retrain)

    env = make_env(env_name, ts_grid=config.ts_grid, dt=config.dt * config.train_dt_multiple)
    spec = env.spec
    model = make_model(
        model_name, env_name, spec.n_obs, spec.m, spec.action_high, config,
        dtype=jnp.result_type(float),
    )
    key = jax.random.PRNGKey(model_seed)
    params = model.init(key)
    n_params = count_params(params)
    logger.info("[%s %s d=%d] params=%d", env_name, model_name, delay, n_params)

    if not force_retrain:
        if not retrain and os.path.isfile(ckpt_read_path):
            return model, load_pytree(ckpt_read_path, params), {"total_reward": None}
        if not retrain:
            raise ValueError(f"No checkpoint at {ckpt_path} and retrain=False")
        # warm-start only from the working dir, never the tracked fallback
        if start_from_checkpoint and os.path.isfile(ckpt_path):
            params = load_pytree(ckpt_path, params)

    if model_name == "latent_ode":
        from .train_latent_ode import train_latent_ode

        # forward the caller's budget override — before r3 this was dropped,
        # silently capping latent_ode at config.end_training_after_seconds
        # (180 s) regardless of the driver's --train_seconds
        return train_latent_ode(
            model, params, env, env_name, config, delay, ckpt_path,
            end_training_after_seconds=end_training_after_seconds,
        )

    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    batch_size = 1 if model_name == "node" else config.training_batch_size
    segment_fn = make_train_segment_fn(model, optimizer)

    budget = (
        end_training_after_seconds
        if end_training_after_seconds is not None
        else config.end_training_after_seconds
    )
    timer = Timer()
    best_loss = float("inf")
    last_loss = float("nan")
    # reject-don't-clip cap for exploding batches; the first segment runs
    # unguarded (untrained models legitimately start at pole-scale losses)
    loss_cap = float("inf")
    data_key = jax.random.PRNGKey(model_seed + 10_000)
    epoch_losses = []
    compiled = set()
    stop = False
    total_iters = 0
    next_eval = config.iters_per_evaluation
    eval_rewards = []

    for epoch_i in range(config.training_epochs):
        # budget also guards the epoch loop: tiny datasets can yield zero
        # full batches, in which case the per-segment cutoff below never runs
        if budget is not None and timer.elapsed() > budget:
            break
        data_key, k_data, k_perm, k_sub = jax.random.split(data_key, 4)
        with timer.exclude():  # dataset build/load is outside the budget
            s0, a0, sn, ts = get_epoch_data(env, env_name, delay, config, k_data)
            if config.training_use_only_samples is not None:
                # a RANDOM N-subset like the reference (train_utils.py:
                # 340-344 randperm[:N]) — expert data is episode-ordered, so
                # a head slice would be a few contiguous episodes
                idx = jax.random.permutation(k_sub, s0.shape[0])
                idx = idx[: config.training_use_only_samples]
                s0, a0, sn, ts = s0[idx], a0[idx], sn[idx], ts[idx]
        batch_size_eff = min(batch_size, s0.shape[0])
        perm = jax.random.permutation(k_perm, s0.shape[0])
        n_batches = perm.shape[0] // batch_size_eff
        seg_len = max(1, min(config.iters_per_log, n_batches))
        n_segments = n_batches // seg_len
        batches = perm[: n_segments * seg_len * batch_size_eff].reshape(
            n_segments, seg_len, batch_size_eff
        )

        seg_losses = []
        for seg_i in range(n_segments):
            shape_key = (seg_len, batch_size_eff, s0.shape[0])
            if shape_key not in compiled:
                with timer.exclude():  # jit compile excluded from budget
                    params, opt_state, losses = segment_fn(
                        params, opt_state, s0, a0, sn, ts, batches[seg_i],
                        loss_cap,
                    )
                    jax.block_until_ready(losses)
                compiled.add(shape_key)
            else:
                params, opt_state, losses = segment_fn(
                    params, opt_state, s0, a0, sn, ts, batches[seg_i], loss_cap
                )
            track_loss = float(jnp.mean(losses))
            last_loss = float(losses[-1])
            seg_losses.append(track_loss)
            if config.training_loss_skip_factor:
                # the MEDIAN is robust to the very spikes the cap rejects;
                # a mean-based cap would inflate after each spike segment
                seg_median = float(jnp.median(losses))
                if math.isfinite(seg_median) and seg_median > 0:
                    loss_cap = config.training_loss_skip_factor * seg_median
            elapsed = timer.elapsed()
            logger.info(
                "[%s %s d=%d][epoch=%04d|seg=%03d/%03d|t=%.0f/%s] train_loss=%g",
                env_name, model_name, delay, epoch_i + 1, seg_i + 1, n_segments,
                elapsed, budget, track_loss,
            )
            # best-loss checkpointing per log window (train_utils.py:440-443)
            if track_loss < best_loss:
                best_loss = track_loss
                with timer.exclude():
                    save_pytree(ckpt_path, params)
            # mid-training policy evaluation every iters_per_evaluation
            # update steps (train_utils.py:450-459; default never fires),
            # excluded from the wall-clock budget like compile time
            total_iters += seg_len
            if total_iters >= next_eval:
                next_eval += config.iters_per_evaluation
                with timer.exclude():
                    from .eval import evaluate_policy

                    r = evaluate_policy(
                        model_name, env_name, delay, seeds=[0], config=config,
                        model_apply=model.apply, params=params,
                    )
                eval_rewards.append(r["total_reward"])
                logger.info(
                    "[%s %s d=%d] mid-train eval total_reward=%.1f",
                    env_name, model_name, delay, r["total_reward"],
                )
            if budget is not None and elapsed > budget:
                logger.info("[%s %s d=%d] Ending training (budget)", env_name, model_name, delay)
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
        "n_params": n_params,
        "total_reward": eval_rewards[-1] if eval_rewards else None,
        "eval_rewards": eval_rewards,
        "train_seconds": timer.elapsed(),
    }
    return model, params, results

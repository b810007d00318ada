"""On-chip TRAINING throughput: update steps/s (and the reference's s/it
framing, train_utils.py:414,432) for the nl flagship and the latent_ode
baseline, plus the one obvious lever — batch size — measured as an ablation.

The measured unit is the real deployed training path: the SAME jitted
segment functions training/train.py and train_latent_ode.py run (a
``lax.scan`` of ``iters_per_log`` Adam updates per device launch), driven
over a synthetic data table with the exact expert-replay shapes (throughput
is shape-determined; values don't matter). Compile is excluded — the
training harness excludes it from wall-clock budgets too.

Emits one JSON line per measurement:
    {"model", "batch_size", "steps_per_sec", "sec_per_iter",
     "samples_per_sec", "table_rows", "seg_len", "segments_timed"}

Usage:
    python scripts/bench_train.py [--models nl,latent_ode]
        [--batches 16,64,256] [--rows 1000000] [--segments 4]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.training.train import (  # noqa: E402
    make_optimizer,
    make_train_segment_fn,
)


def synth_table(key, rows, n_obs, m, buf):
    """Random arrays with collect_expert_data's shapes (data/collector.py):
    s0 [N, n], a0 [N, A, m], sn [N, n], ts [N, 1]."""
    ks = jax.random.split(key, 4)
    dt = 0.05
    return (
        jax.random.normal(ks[0], (rows, n_obs), jnp.float32),
        jax.random.uniform(ks[1], (rows, buf, m), jnp.float32, -1.0, 1.0),
        jax.random.normal(ks[2], (rows, n_obs), jnp.float32),
        jnp.full((rows, 1), dt, jnp.float32)
        + 0.01 * jax.random.uniform(ks[3], (rows, 1), jnp.float32),
    )


def bench_nl(config, rows, batch_size, segments, env_name="oderl-cartpole"):
    spec = make_env(env_name, dt=config.dt).spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    segment_fn = make_train_segment_fn(model, optimizer)
    s0, a0, sn, ts = synth_table(
        jax.random.PRNGKey(1), rows, spec.n_obs, spec.m, config.action_buffer_size
    )
    seg_len = config.iters_per_log
    batches = (
        jax.random.permutation(jax.random.PRNGKey(2), rows)[
            : (segments + 1) * seg_len * batch_size
        ].reshape(segments + 1, seg_len, batch_size)
    )
    # warmup segment = compile (excluded, as in the training harness)
    params, opt_state, losses = segment_fn(params, opt_state, s0, a0, sn, ts, batches[0])
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for i in range(1, segments + 1):
        params, opt_state, losses = segment_fn(params, opt_state, s0, a0, sn, ts, batches[i])
    jax.block_until_ready(losses)
    elapsed = time.perf_counter() - t0
    return seg_len * segments / elapsed, seg_len


def bench_latent_ode(config, rows, batch_size, segments, env_name="oderl-cartpole"):
    from functools import partial

    import optax

    spec = make_env(env_name, dt=config.dt).spec
    model = make_model(
        "latent_ode", env_name, spec.n_obs, spec.m, spec.action_high, config
    )
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    A = config.action_buffer_size

    # the exact segment body train_latent_ode.py:59-77 jits
    @partial(jax.jit, donate_argnums=(0, 1))
    def segment_fn(params, opt_state, key, hist_s, hist_a, target, ts, batch_idx):
        def update(carry, idx):
            params, opt_state, key = carry
            key, k = jax.random.split(key)

            def loss_fn(p):
                return model.train_step(
                    p, k, hist_s[idx], hist_a[idx], ts[idx], target[idx]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            update, (params, opt_state, key), batch_idx
        )
        return params, opt_state, losses

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    hist_s = jax.random.normal(ks[0], (rows, A, spec.n_obs), jnp.float32)
    hist_a = jax.random.uniform(ks[1], (rows, A, spec.m), jnp.float32, -1.0, 1.0)
    target = jax.random.normal(ks[2], (rows, spec.n_obs), jnp.float32)
    ts = jnp.full((rows, 1), config.dt, jnp.float32)
    seg_len = config.iters_per_log
    batches = (
        jax.random.permutation(jax.random.PRNGKey(2), rows)[
            : (segments + 1) * seg_len * batch_size
        ].reshape(segments + 1, seg_len, batch_size)
    )
    key = jax.random.PRNGKey(3)
    params, opt_state, losses = segment_fn(
        params, opt_state, key, hist_s, hist_a, target, ts, batches[0]
    )
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for i in range(1, segments + 1):
        params, opt_state, losses = segment_fn(
            params, opt_state, jax.random.fold_in(key, i), hist_s, hist_a, target,
            ts, batches[i],
        )
    jax.block_until_ready(losses)
    elapsed = time.perf_counter() - t0
    return seg_len * segments / elapsed, seg_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default="nl,latent_ode")
    ap.add_argument("--batches", type=str, default="16,64,256")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument(
        "--platform", type=str, default=None,
        help="force a JAX platform (e.g. 'cpu' for smoke tests) — the env "
        "var is overridden by this image's shell profile (CLAUDE.md)",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    for model_name in args.models.split(","):
        for bs in (int(b) for b in args.batches.split(",")):
            config = Config(training_batch_size=bs)
            fn = {"nl": bench_nl, "latent_ode": bench_latent_ode}[model_name]
            # enough table rows for (segments+1) disjoint index blocks
            rows = max(args.rows, (args.segments + 1) * config.iters_per_log * bs)
            steps_per_sec, seg_len = fn(config, rows, bs, args.segments)
            print(
                json.dumps(
                    {
                        "model": model_name,
                        "batch_size": bs,
                        "steps_per_sec": round(steps_per_sec, 1),
                        "sec_per_iter": round(1.0 / steps_per_sec, 6),
                        "samples_per_sec": round(steps_per_sec * bs),
                        "table_rows": rows,
                        "seg_len": seg_len,
                        "segments_timed": args.segments,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

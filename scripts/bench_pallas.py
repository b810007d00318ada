"""Pallas-vs-XLA measurements on real TPU for the NL planner path.

Three levels, each timed steady-state after AOT warmup:
  1. head-only: the fused theta/phi head + Fourier-ILT combine kernel
     (ops.pallas_ilt.nl_head_fused) vs the XLA ops it replaces.
  2. full forward: the single-kernel planner-path NL forward
     (ops.pallas_nl.nl_forward_fused: GRU + trunk + head) vs model.apply.
  3. planner loop: one mppi_command (K rollouts x T=40 horizon) with the
     fused dynamics closure vs the XLA dynamics closure — the number that
     moves the headline bench.

Writes the results as JSON to artifacts/bench_pallas_r2.json (and prints).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.ops.ilt import ilt_combine  # noqa: E402
from neurallaplacecontrol_tpu.ops.pallas_ilt import (  # noqa: E402
    nl_head_fused,
    pack_head_weights,
)
from neurallaplacecontrol_tpu.ops.sphere import spherical_to_complex  # noqa: E402
from neurallaplacecontrol_tpu.planners import (  # noqa: E402
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
    mppi_command,
    mppi_reset,
)
from neurallaplacecontrol_tpu.training.rollout import (  # noqa: E402
    build_learned_dynamics,
    build_running_cost,
)


def timeit(fn, *args, reps=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_head(results):
    D, terms, H, t = 5, 17, 128, 0.125
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (H, 2 * D * terms), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 1), (2 * D * terms,), jnp.float32) * 0.05
    packed = pack_head_weights(np.asarray(w), np.asarray(b), D, terms, t)

    @jax.jit
    def xla_head(x):
        out = x @ w + b
        out = out.reshape(x.shape[0], 2 * D, terms)
        theta = jnp.tanh(out[:, :D, :]) * jnp.pi
        phi = jnp.tanh(out[:, D:, :]) * (jnp.pi / 2)
        F = spherical_to_complex(theta, phi)
        return ilt_combine(F, jnp.full((x.shape[0],), t, jnp.float32), terms, "fourier")

    fused = jax.jit(lambda x: nl_head_fused(x, packed, D))
    for B in (1024, 16384, 131072):
        x = jax.random.normal(jax.random.fold_in(key, 2), (B, H), jnp.float32)
        xla_t, pal_t = timeit(xla_head, x), timeit(fused, x)
        err = float(jnp.max(jnp.abs(xla_head(x) - fused(x))))
        rec = dict(level="head", B=B, xla_us=xla_t * 1e6, pallas_us=pal_t * 1e6,
                   speedup=xla_t / pal_t, maxdiff=err)
        results.append(rec)
        print(rec)


def bench_forward_and_planner(results):
    config = Config()
    env = make_env("oderl-cartpole")
    spec = env.spec
    model = make_model("nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high,
                       config, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    t = config.dt
    fused_apply = model.make_fused_planner_apply(params, t)
    xla_apply = jax.jit(model.apply)
    fused_j = jax.jit(fused_apply)

    key = jax.random.PRNGKey(5)
    for B in (1000, 16384, 131072):
        obs = jax.random.normal(key, (B, spec.n_obs), jnp.float32)
        abuf = jax.random.uniform(jax.random.fold_in(key, 1), (B, 4, spec.m),
                                  jnp.float32, minval=-3, maxval=3)
        ts = jnp.full((B, 1), t, jnp.float32)
        xla_t = timeit(xla_apply, params, obs, abuf, ts)
        pal_t = timeit(fused_j, params, obs, abuf, ts)
        a, c = xla_apply(params, obs, abuf, ts), fused_j(params, obs, abuf, ts)
        rel = float(jnp.max(jnp.abs(a - c) / (1.0 + jnp.abs(a))))
        rec = dict(level="forward", B=B, xla_us=xla_t * 1e6, pallas_us=pal_t * 1e6,
                   speedup=xla_t / pal_t, max_rel_diff=rel)
        results.append(rec)
        print(rec)

    cost = build_running_cost(env)
    obs1 = env.observe(env.reset(jax.random.PRNGKey(1)))
    buf = jnp.zeros((4, spec.m))
    for K in (1000, 16384, 65536):
        cfg = MPPIConfig(num_samples=K, horizon=40, nu=spec.m,
                         u_scale=spec.action_high, u_min=-spec.action_high,
                         u_max=spec.action_high)
        mppi_params = make_mppi_params(default_noise_sigma(spec.m, config.mppi_sigma))
        dyn_xla = build_learned_dynamics(env, model.apply, params, K, t)
        dyn_fused = build_learned_dynamics(env, fused_apply, params, K, t)

        def cmd(dyn):
            @jax.jit
            def f(U, k):
                a, U2, _ = mppi_command(cfg, mppi_params, dyn, cost, U, obs1, buf, k)
                return a, U2
            return f

        U = mppi_reset(jax.random.PRNGKey(2), cfg, mppi_params)
        k = jax.random.PRNGKey(3)
        reps = 50 if K <= 16384 else 20
        xla_t = timeit(cmd(dyn_xla), U, k, reps=reps)
        pal_t = timeit(cmd(dyn_fused), U, k, reps=reps)
        a_x, _ = cmd(dyn_xla)(U, k)
        a_p, _ = cmd(dyn_fused)(U, k)
        rec = dict(level="planner", K=K, T=40,
                   xla_ms=xla_t * 1e3, pallas_ms=pal_t * 1e3,
                   xla_rollouts_per_s=K / xla_t, pallas_rollouts_per_s=K / pal_t,
                   speedup=xla_t / pal_t,
                   action_diff=float(jnp.max(jnp.abs(a_x - a_p))))
        results.append(rec)
        print(rec)


def main():
    results = []
    bench_head(results)
    bench_forward_and_planner(results)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "bench_pallas_r2.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

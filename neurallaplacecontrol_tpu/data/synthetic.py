"""Synthetic training-data generation from batched env integration.

Rebuild of reference overlay.generate_irregular_data_delay_time_multi
(overlay.py:664-737) + compute_state_actions (:603-661): sample raw states
in the per-env box and actions in the action box, integrate every
(state, action) pair one Euler step over a shared per-round sampled
interval, emit trig-form (s0, action-buffer, sn, dt) tuples with the
executed action embedded at buffer index -(delay+1) inside an otherwise
random buffer (:718-721).

The reference's Python loop over actions with torchdiffeq inside
(base_env.py:249-263) becomes a single broadcasted Euler step over the
[rounds, S, actions] cross-product — one XLA kernel for the whole dataset.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..envs import Env, sample_dt

_TIME_MULTIPLIER = 10  # overlay.py:682
_DEFAULT_SPD = {"pendulum": 33, "cartpole": 20, "acrobot": 15}  # overlay.py:675-681


def default_samples_per_dim(env_name: str) -> int:
    for k, v in _DEFAULT_SPD.items():
        if k in env_name:
            return v
    raise ValueError(env_name)


@partial(jax.jit, static_argnames=("env", "samples_per_dim", "rounds", "rand",
                                   "delay", "action_buffer_size", "encode_obs_time",
                                   "reuse_state_actions"))
def _generate(env: Env, key: jax.Array, samples_per_dim: int, rounds: int,
              rand: bool, delay: int, action_buffer_size: int,
              encode_obs_time: bool, reuse_state_actions: bool):
    spec = env.spec
    n_state, m = spec.n_state, spec.m
    state_max = jnp.asarray(env.state_max)
    S = samples_per_dim**n_state
    n_act = samples_per_dim ** (1 if m == 1 else m) if not rand else samples_per_dim
    a_high = spec.action_high

    def sample_round(k):
        k_s, k_a = jax.random.split(k)
        if rand:
            s0s = (jax.random.uniform(k_s, (S, n_state)) - 0.5) * 2.0 * state_max
            actions = (jax.random.uniform(k_a, (samples_per_dim, m)) - 0.5) * 2.0 * a_high
        else:
            grids = [
                jnp.linspace(-state_max[i], state_max[i], samples_per_dim)
                for i in range(n_state)
            ]
            mesh = jnp.meshgrid(*grids, indexing="ij")
            s0s = jnp.stack([g.reshape(-1) for g in mesh], axis=-1)
            if m == 1:
                actions = jnp.linspace(-a_high, a_high, samples_per_dim)[:, None]
            else:
                ag = [jnp.linspace(-a_high, a_high, samples_per_dim) for _ in range(m)]
                am = jnp.meshgrid(*ag, indexing="ij")
                actions = jnp.stack([g.reshape(-1) for g in am], axis=-1)
        return s0s, actions

    keys = jax.random.split(key, rounds + 2)
    round_keys, k_dt, k_buf = keys[:rounds], keys[rounds], keys[rounds + 1]

    if reuse_state_actions:
        # one (state, action) draw shared by all rounds (overlay.py:695-702)
        s0s, actions = sample_round(round_keys[0])
        s0s = jnp.broadcast_to(s0s[None], (rounds,) + s0s.shape)
        actions = jnp.broadcast_to(actions[None], (rounds,) + actions.shape)
    else:
        s0s, actions = jax.vmap(sample_round)(round_keys)

    # one sampled interval per round, shared across the round's pairs
    # (base_env.batch_integrate_system:246 uses a single build_time_grid call)
    dts = sample_dt(k_dt, spec.ts_grid, spec.dt, (rounds,))

    def integrate_round(s0s_r, actions_r, dt_r):
        # cross product [S, n_act]: euler step per pair
        s = s0s_r[:, None, :]  # [S, 1, n]
        a = actions_r[None, :, :]  # [1, n_act, m]
        s_b = jnp.broadcast_to(s, (S, actions_r.shape[0], n_state))
        a_b = jnp.broadcast_to(a, (S, actions_r.shape[0], m))
        sn = s_b + dt_r * env.rhs(s_b, a_b)
        # layout parity with the reference: action-major flattening
        # (s0s repeated per action, base_env.py:270-276)
        s0_flat = jnp.swapaxes(s_b, 0, 1).reshape(-1, n_state)
        a_flat = jnp.swapaxes(a_b, 0, 1).reshape(-1, m)
        sn_flat = jnp.swapaxes(sn, 0, 1).reshape(-1, n_state)
        return s0_flat, a_flat, sn_flat

    s0_r, a_r, sn_r = jax.vmap(integrate_round)(s0s, actions, dts)
    N_round = s0_r.shape[1]
    s0 = env.observe(s0_r.reshape(-1, n_state))
    sn = env.observe(sn_r.reshape(-1, n_state))
    a0 = a_r.reshape(-1, m)
    ts = jnp.repeat(dts, N_round)[:, None]

    if spec.obs_noise != 0.0:
        sn = sn + jax.random.normal(k_buf, sn.shape) * spec.obs_noise

    # embed executed action at -(delay+1) in a random buffer (overlay.py:718-721)
    N = a0.shape[0]
    buf = (jax.random.uniform(k_buf, (N, action_buffer_size, m)) - 0.5) * 2.0 * a_high
    buf = buf.at[:, -(delay + 1)].set(a0)
    if encode_obs_time:
        ages = jnp.flip(jnp.arange(action_buffer_size, dtype=buf.dtype))
        ages = jnp.broadcast_to(ages[None, :, None], (N, action_buffer_size, 1))
        buf = jnp.concatenate([buf, ages], axis=2)

    return s0, buf, sn, ts


def generate_irregular_data_delay_time_multi(
    env: Env,
    key: jax.Array,
    delay: int,
    samples_per_dim: Optional[int] = None,
    rand: bool = True,
    action_buffer_size: int = 4,
    encode_obs_time: bool = False,
    reuse_state_actions_when_sampling_times: bool = False,
):
    """Returns (s0 [N,n_obs], a0 [N,A,m], sn [N,n_obs], ts [N,1])."""
    spd = samples_per_dim or default_samples_per_dim(env.spec.name)
    rounds = int(spd * _TIME_MULTIPLIER)
    return _generate(
        env, key, spd, rounds, rand, delay, action_buffer_size,
        encode_obs_time, reuse_state_actions_when_sampling_times,
    )

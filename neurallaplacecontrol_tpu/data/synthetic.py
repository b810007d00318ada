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

    keys = jax.random.split(key, rounds + 3)
    round_keys = keys[:rounds]
    k_dt, k_buf, k_obs = keys[rounds], keys[rounds + 1], keys[rounds + 2]

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
        # independent key — reusing k_buf would correlate the observation
        # noise with the distractor buffer actions drawn below
        sn = sn + jax.random.normal(k_obs, sn.shape) * spec.obs_noise

    # embed executed action at -(delay+1) in a random buffer (overlay.py:718-721)
    N = a0.shape[0]
    buf = (jax.random.uniform(k_buf, (N, action_buffer_size, m)) - 0.5) * 2.0 * a_high
    buf = buf.at[:, -(delay + 1)].set(a0)
    if encode_obs_time:
        # REFERENCE QUIRK preserved for parity: synthetic ages are integer
        # step counts flip(arange(A)) (overlay.py:722-731), while the
        # collector and planner encode ages in SECONDS (flip(arange(A))*dt,
        # advanced by the realized interval; mppi_dataset_collector.py:
        # 231-233, mppi_delay.py:279-281). encode_obs_time models should
        # therefore train on expert trajectories (the default), whose age
        # units match the planner's.
        ages = jnp.flip(jnp.arange(action_buffer_size, dtype=buf.dtype))
        ages = jnp.broadcast_to(ages[None, :, None], (N, action_buffer_size, 1))
        buf = jnp.concatenate([buf, ages], axis=2)

    return s0, buf, sn, ts


def generate_irregular_data_delay_latent(
    env: Env,
    key: jax.Array,
    delay: int,
    samples_per_dim: Optional[int] = None,
    rand: bool = False,
    latent: bool = False,
):
    """Two-frame synthetic data for latent (finite-difference) models
    (reference overlay.generate_irregular_data_delay_latent:222-397 +
    base_env.batch_integrate_system_double_time:175-229).

    Each sample integrates TWO consecutive observation intervals from a
    sampled 3-point time grid: sb = frame after the first interval, sn =
    frame after the second. Returns (s0, a0, sb, sn, ts) in trig form, with
    ``delay`` extra random actions appended to the buffer (overlay :378-384)
    and — mirroring a reference quirk — ts equal to the second ABSOLUTE grid
    point (overlay uses ts[1], not the interval; they agree on the 'fixed'
    grid). With latent=True (cartpole only) sn is replaced by the two-frame
    latent oracle's prediction and all frames reduce to position dims
    [x, l cos, l sin] (overlay :385-391).
    """
    spec = env.spec
    spd = samples_per_dim or default_samples_per_dim(spec.name)
    n_state, m = spec.n_state, spec.m
    state_max = jnp.asarray(env.state_max)
    a_high = spec.action_high

    keys = jax.random.split(key, spd)
    s0_l, a0_l, sb_l, sn_l, ts_l = [], [], [], [], []
    for k in keys:
        k_s, k_a, k_t = jax.random.split(k, 3)
        if rand:
            s0s = (jax.random.uniform(k_s, (spd**n_state, n_state)) - 0.5) * 2.0 * state_max
            actions = (jax.random.uniform(k_a, (spd, m)) - 0.5) * 2.0 * a_high
        else:
            grids = [jnp.linspace(-state_max[i], state_max[i], spd) for i in range(n_state)]
            mesh = jnp.meshgrid(*grids, indexing="ij")
            s0s = jnp.stack([g.reshape(-1) for g in mesh], axis=-1)
            if m == 1:
                actions = jnp.linspace(-a_high, a_high, spd)[:, None]
            else:
                ag = [jnp.linspace(-a_high, a_high, spd) for _ in range(m)]
                am = jnp.meshgrid(*ag, indexing="ij")
                actions = jnp.stack([g.reshape(-1) for g in am], axis=-1)
        # 3-point grid (build_time_grid only_one_step=False, T=3)
        pts = sample_dt(k_t, spec.ts_grid, spec.dt, (3,))
        grid = jnp.cumsum(pts) if spec.ts_grid != "fixed" else spec.dt * jnp.arange(3.0)
        d1, d2 = grid[1] - grid[0], grid[2] - grid[1]

        s = s0s[:, None, :]
        a = actions[None, :, :]
        S, A = s0s.shape[0], actions.shape[0]
        s_b = jnp.broadcast_to(s, (S, A, n_state))
        a_b = jnp.broadcast_to(a, (S, A, m))
        sb = s_b + d1 * env.rhs(s_b, a_b)
        sn = sb + d2 * env.rhs(sb, a_b)
        # action-major flattening (batch_integrate_system layout)
        flat = lambda x: jnp.swapaxes(x, 0, 1).reshape(-1, x.shape[-1])  # noqa: E731
        s0_l.append(env.observe(flat(s_b)))
        sb_l.append(env.observe(flat(sb)))
        sn_l.append(env.observe(flat(sn)))
        a0_l.append(flat(a_b))
        ts_l.append(jnp.full((S * A, 1), grid[1]))

    s0 = jnp.concatenate(s0_l)
    a0 = jnp.concatenate(a0_l)
    sb = jnp.concatenate(sb_l)
    sn = jnp.concatenate(sn_l)
    ts = jnp.concatenate(ts_l)

    if delay > 0:
        extra = (
            jax.random.uniform(jax.random.fold_in(key, 7), (a0.shape[0], delay, m)) - 0.5
        ) * 2.0 * a_high
        a0 = jnp.concatenate([a0[:, None, :], extra], axis=1)

    if latent:
        from ..envs.oracle import cartpole_dynamics_dt_latent

        assert "cartpole" in spec.name, "latent reduction is cartpole-only"
        act = a0[:, 0] if a0.ndim == 3 else a0
        sn = cartpole_dynamics_dt_latent(sb, s0, act, ts)
        s0 = s0[:, [0, 2, 3]]
        sb = sb[:, [0, 2, 3]]
        sn = sn[:, [0, 2, 3]]
    return s0, a0, sb, sn, ts


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


def generate_irregular_data_delay(env: Env, key: jax.Array, delay: int,
                                  samples_per_dim: Optional[int] = None,
                                  rand: bool = False):
    """Legacy single-step variant (overlay.generate_irregular_data_delay
    :400-557): the buffer holds the executed action at index 0 followed by
    ``delay`` random actions — i.e. a (delay+1)-long buffer with the
    executed action at -(delay+1), which is the multi generator with
    action_buffer_size = delay + 1."""
    return generate_irregular_data_delay_time_multi(
        env, key, delay, samples_per_dim=samples_per_dim, rand=rand,
        action_buffer_size=delay + 1,
    )


def generate_irregular_data(env: Env, key: jax.Array,
                            samples_per_dim: Optional[int] = None,
                            rand: bool = False):
    """Legacy non-delayed variant (overlay.generate_irregular_data:781-927):
    single executed action, flat [N, m] action layout."""
    s0, a0, sn, ts = generate_irregular_data_delay(
        env, key, 0, samples_per_dim=samples_per_dim, rand=rand
    )
    return s0, a0[:, 0], sn, ts

"""On-device control episodes: env + delay buffer + MPPI in one jitted scan.

The reference episode loop (mppi_with_model.py:244-317) round-trips through
numpy every step: env.get_obs() -> planner on device -> action to cpu ->
torchdiffeq env step -> set_state_. Here the entire episode — 200 env steps,
each containing a full MPPI plan (K rollouts x T horizon model calls) and the
one-Euler-step env transition — is a single compiled ``lax.scan``, so an
episode is one device launch and the host only sees the final results.

The same scan serves evaluation (training.eval) and expert data collection
(data.collector): collection adds exploration noise to the planned action
(mppi_dataset_collector.py:250-254) and the per-step transition records are
always emitted (cheap relative to the planning compute).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..envs import Env, sample_dt
from ..envs.oracle import ORACLES
from ..planners import MPPIConfig, MPPIParams, mppi_command, mppi_reset


class EpisodeRecords(NamedTuple):
    """Per-step transition tuples (mppi_dataset_collector.py:245-268)."""

    s0: jnp.ndarray  # [n_steps, n_obs] observation before the step
    a0: jnp.ndarray  # [n_steps, A, m] action buffer after the step
    sn: jnp.ndarray  # [n_steps, n_obs] observation after the step
    ts: jnp.ndarray  # [n_steps] realized step duration
    reward: jnp.ndarray  # [n_steps]


@dataclass(frozen=True)
class EpisodeSettings:
    delay: int
    n_steps: int = 200
    action_buffer_size: int = 4
    observation_noise: float = 0.0
    explore_noise: Optional[float] = None  # expert-collection action noise
    random_policy: bool = False
    encode_obs_time: bool = False
    # planner-cost variants (mppi_with_model.py:145-163); the recorded episode
    # reward stays the standard diff reward like the reference (the variants
    # only shape the planner's running cost)
    state_constraint: bool = False
    change_goal: bool = False


def build_learned_dynamics(env: Env, model_apply: Callable, params, roll_outs: int,
                           dt: float, action_buffer_size: int = 4) -> Callable:
    """Wrap a learned model as the planner dynamics closure
    (mppi_with_model.py:103-122): next = state + model(state, window, dt).

    Batch size is taken from the incoming state so the same closure works
    single-chip (batch K) and inside a K-sharded shard_map (batch K/n);
    ``roll_outs`` is kept for signature parity only. With encode_obs_time the
    planner itself appends the time-age channel to the window
    (planners.mppi_delay, reference mppi_delay.py:279-287), so the window
    arrives here already augmented.
    """
    del roll_outs, action_buffer_size

    def dynamics(state, window):
        ts_pred = jnp.full((state.shape[0], 1), dt, dtype=state.dtype)
        return state + model_apply(params, state, window, ts_pred)

    return dynamics


def build_learned_dynamics_encoded(model, params, dt: float):
    """Planner dynamics with the model's action-window encoding hoisted out
    of the horizon scan (planners.mppi_delay ``window_encoder``).

    For the NL flagship the window encoding (reverse-GRU, w_nl.py:117-127)
    depends only on the candidate actions, which MPPI samples in full BEFORE
    the rollout — so all K x T windows encode in one batched call and the
    per-step dynamics is just the Laplace decode. Returns
    ``(window_encoder, dynamics)``; semantics match build_learned_dynamics
    exactly (next = state + model(state, window, dt)), the split only
    changes GEMM batching.
    """
    encode = model.make_planner_window_encoder(params)

    def dynamics(state, p_action_t):
        ts_pred = jnp.full((state.shape[0], 1), dt, dtype=state.dtype)
        return state + model.apply_encoded(params, state, p_action_t, ts_pred)

    return encode, dynamics


def build_oracle_dynamics(env: Env, roll_outs: int, dt: float, delay: int) -> Callable:
    """Closed-form oracle dynamics closure (mppi_with_model.py:129-143)."""
    del roll_outs  # batch inferred from state (see build_learned_dynamics)
    oracle = ORACLES[env.spec.name]

    def dynamics(state, window):
        ts = jnp.full((state.shape[0], 1), dt, dtype=state.dtype)
        return oracle(state, window, ts, delay, friction=env.spec.friction)

    return dynamics


def build_running_cost(env: Env, state_constraint: bool = False) -> Callable:
    """cost = -(diff_obs_reward_ + diff_ac_reward_) (mppi_with_model.py:145-171).

    With ``state_constraint`` the cartpole cost adds the exponential position
    barrier (mppi_with_model.py:146-151)."""
    if state_constraint:
        assert env.reward_state_ext is not None, env.spec.name

        def running_cost(state, action):
            return -(
                env.reward_state_ext(state, 0.0, state_constraint=True)
                + env.reward_action(action)
            )

        return running_cost

    def running_cost(state, action):
        return -(env.reward_state(state) + env.reward_action(action))

    return running_cost


def build_goal_running_cost(env: Env) -> Callable:
    """change_goal planner cost: (state, action, goal_x) -> cost
    (mppi_with_model.py:152-162; goal flips -2 -> +2 mid-episode)."""
    assert env.reward_state_ext is not None, env.spec.name

    def running_cost(state, action, goal_x):
        return -(env.reward_state_ext(state, goal_x) + env.reward_action(action))

    return running_cost


def initial_state(env: Env, key: jax.Array) -> jnp.ndarray:
    """Episode start state; pendulum starts downward-spinning
    (mppi_with_model.py:188-189 overrides reset with [pi, 1])."""
    if env.spec.name == "pendulum":
        return jnp.asarray([jnp.pi, 1.0])
    return env.reset(key)


def make_episode_fn(
    env: Env,
    dynamics_fn: Optional[Callable],
    mppi_cfg: MPPIConfig,
    mppi_params: MPPIParams,
    settings: EpisodeSettings,
    dynamics_carry_init: Optional[Callable] = None,
    command_fn: Optional[Callable] = None,
    window_encoder: Optional[Callable] = None,
    vary_axis=None,
):
    """Build the jittable episode function: key -> (total_reward, records).

    total_reward is the raw episode return (sum of per-step diff rewards,
    reference mppi_with_model.py:272,288); callers rescale by 200/n_steps.

    ``command_fn`` swaps the planner implementation — e.g. the K-sharded
    planner from parallel.sharding.make_k_sharded_mppi_command. It must have
    signature ``(U, obs, action_buffer, key, time_buffer=None,
    cost_args=()) -> (action, U_new, aux)`` with the running cost (and its
    extra ``cost_args``, used by change_goal) baked in at build time.

    ``vary_axis`` promotes the episode carry to device-varying over the
    named mesh axis — required when the episode itself runs INSIDE a
    ``shard_map`` (parallel.sharding.make_grid_sharded_episodes shards
    seed-episodes over a mesh axis): carries built from constants
    (zero action buffer, initial ages) start replicated, but the scan
    makes them varying, and ``lax.scan`` demands a consistent carry type.
    """
    spec = env.spec
    running_cost = build_running_cost(env, state_constraint=settings.state_constraint)
    goal_cost = build_goal_running_cost(env) if settings.change_goal else None
    A, nu = settings.action_buffer_size, spec.m
    delay = settings.delay

    def episode(key: jax.Array):
        k_reset, k_u0, k_scan = jax.random.split(key, 3)
        raw0 = initial_state(env, k_reset)
        U0 = mppi_reset(k_u0, mppi_cfg, mppi_params)
        buffer0 = jnp.zeros((A, nu))
        # entry ages for encode_obs_time (collector :231-233 initializes
        # flip(arange(A)) * dt)
        ages0 = jnp.flip(jnp.arange(A, dtype=buffer0.dtype)) * spec.dt
        carry0 = (raw0, buffer0, ages0, U0, k_scan)
        if vary_axis is not None:
            from ..planners.mppi_delay import _pvary

            carry0 = jax.tree_util.tree_map(
                lambda x: _pvary(x, vary_axis), carry0
            )

        def step(carry, it):
            raw, buffer, ages, U, key = carry
            key, k_noise, k_rand, k_dt, k_obs, k_explore = jax.random.split(key, 6)
            obs = env.observe(raw)

            if goal_cost is not None:
                # goal flips -2 -> +2 once half the episode has elapsed
                # (mppi_with_model.py:236-253)
                goal_x = jnp.where(it > settings.n_steps / 2.0, 2.0, -2.0)
                cost_fn = lambda s, a: goal_cost(s, a, goal_x)  # noqa: E731
            else:
                cost_fn = running_cost

            if settings.random_policy:
                action = jax.random.uniform(
                    k_rand, (nu,), minval=-spec.action_high, maxval=spec.action_high
                )
            elif command_fn is not None:
                action, U, _ = command_fn(
                    U, obs, buffer, k_noise,
                    time_buffer=ages if settings.encode_obs_time else None,
                    cost_args=(goal_x,) if goal_cost is not None else (),
                )
            else:
                action, U, _ = mppi_command(
                    mppi_cfg, mppi_params, dynamics_fn, cost_fn,
                    U, obs, buffer, k_noise,
                    dynamics_carry_init=dynamics_carry_init,
                    time_buffer=ages if settings.encode_obs_time else None,
                    window_encoder=window_encoder,
                )
            if settings.explore_noise is not None and not settings.random_policy:
                # expert-collection exploration on top of the planner action
                # (collector :250-254); applies to the sharded command_fn
                # path too, should a sharded planner ever collect data
                action = action + (
                    (jax.random.uniform(k_explore, (nu,)) - 0.5)
                    * 2.0 * spec.action_high * settings.explore_noise
                )
                action = jnp.clip(action, -spec.action_high, spec.action_high)

            # delay buffer roll; delayed action executes (get_action :25-28)
            buffer = jnp.roll(buffer, -1, axis=0).at[-1].set(action)
            executed = buffer[-(delay + 1)]

            # env transition: one Euler step over a sampled interval
            delta_t = sample_dt(k_dt, spec.ts_grid, spec.dt)
            raw_next = raw + delta_t * env.rhs(raw, executed)
            reward = env.reward_state(raw_next) + env.reward_action(executed)

            # entry ages advance by the REALIZED interval; newest entry is 0
            # (collector get_action_with_encode_obs_time :20-24, :206-208)
            ages = jnp.roll(ages, -1)
            ages = (ages + delta_t).at[-1].set(0.0)

            # observation noise persisted into env state
            # (mppi_with_model.py:203-204)
            if settings.observation_noise > 0.0:
                raw_next = raw_next + (
                    jax.random.normal(k_obs, raw_next.shape) * settings.observation_noise
                )

            rec_buffer = buffer
            if settings.encode_obs_time:
                rec_buffer = jnp.concatenate([buffer, ages[:, None]], axis=1)
            rec = EpisodeRecords(
                s0=obs, a0=rec_buffer, sn=env.observe(raw_next),
                ts=delta_t, reward=reward,
            )
            return (raw_next, buffer, ages, U, key), rec

        _, records = lax.scan(step, carry0, jnp.arange(settings.n_steps))
        total_reward = jnp.sum(records.reward)
        return total_reward, records

    return episode


def make_batched_episode_fn(env, dynamics_fn, mppi_cfg, mppi_params, settings,
                            dynamics_carry_init=None, command_fn=None,
                            window_encoder=None):
    """vmap the episode over a batch of PRNG keys — replaces the process
    pools at run_exp_multi.py:145 / mppi_dataset_collector.py:411."""
    episode = make_episode_fn(env, dynamics_fn, mppi_cfg, mppi_params, settings,
                              dynamics_carry_init=dynamics_carry_init,
                              command_fn=command_fn,
                              window_encoder=window_encoder)
    return jax.jit(jax.vmap(episode))

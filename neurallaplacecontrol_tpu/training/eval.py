"""Policy evaluation: model + delay-aware MPPI on a real env episode.

Equivalent of reference mppi_with_model.mppi_with_model_evaluate_single_step
(:31-325), with the whole episode compiled on-device. Multi-seed evaluation
is a vmap over PRNG keys instead of a 12-worker process pool
(run_exp_multi.py:144-165).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..envs import make_env
from ..planners import MPPIConfig, default_noise_sigma, make_mppi_params
from ..utils.timing import profile_trace
from .rollout import (
    EpisodeSettings,
    build_learned_dynamics,
    build_oracle_dynamics,
    make_batched_episode_fn,
)

EVAL_MODELS = (
    "nl", "oracle", "random", "delta_t_rnn", "rnn", "node", "latent_ode",
    # reference-layout latent-ODE twin for transplanted `.pt` checkpoints
    # (models/latent_ode_ref.py); plans through the generic learned path
    "latent_ode_ref",
)


def evaluate_policy(
    model_name: str,
    env_name: str,
    action_delay: int,
    seeds,
    config: Config = Config(),
    model_apply=None,
    params=None,
    roll_outs: Optional[int] = None,
    time_steps: Optional[int] = None,
    state_constraint: bool = False,
    change_goal: bool = False,
    save_video: Optional[bool] = None,
    profile_trace_dir: Optional[str] = None,
    shard_seeds: bool = False,
    shard_rollouts: bool = False,
    shard_grid: Optional[tuple] = None,
    devices: Optional[list] = None,
) -> dict:
    """Run one episode per seed; returns the reference's result dict fields
    plus per-seed returns.

    total_reward is rescaled by 200/n_steps (mppi_with_model.py:301).

    ``shard_rollouts`` runs the planner K-sharded over ALL devices
    (parallel.sharding.make_k_sharded_mppi_command inside the episode scan)
    — the big-K regime of the reference's sweep (mppi_optim.yaml:12, K up
    to 262144). Episodes then run sequentially per seed (the rollout batch
    already owns every device). Mutually exclusive with shard_seeds.

    ``shard_grid=(n_seeds_axis, n_k_axis)`` composes both on a 2-D mesh:
    seed-episodes spread over one axis while each episode's K rollouts
    shard over the other (parallel.sharding.make_grid_sharded_episodes).
    Mutually exclusive with the other two flags.

    ``devices`` restricts every shard mesh above to an explicit device
    list. Default is ``jax.devices()`` — the whole (possibly multi-host)
    platform, which requires every process to enter this call together.
    Pass ``jax.local_devices()`` on a pod where each host evaluates its
    OWN cells (the driver's --multihost x --shard composition: DCN splits
    the grid by cell, each host's cells shard over its local ICI mesh).
    """
    assert model_name in EVAL_MODELS, model_name
    if devices is None and (shard_seeds or shard_rollouts or shard_grid):
        devices = jax.devices()
    seeds = list(seeds)  # consumed more than once below
    roll_outs = roll_outs or config.mppi_roll_outs
    time_steps = time_steps or config.mppi_time_steps
    dt = config.dt
    env = make_env(env_name, dt=dt, friction=config.friction)
    spec = env.spec

    mppi_cfg = MPPIConfig(
        num_samples=roll_outs,
        horizon=time_steps,
        nu=spec.m,
        # the reference hardcodes lambda=1.0 at mppi_with_model.py:72,
        # ignoring the configured mppi_lambda; we honour the config.
        lambda_=config.mppi_lambda,
        u_scale=spec.action_high,
        u_min=-spec.action_high,
        u_max=spec.action_high,
        # latent_ode ignores the age channel (models.latent_ode), so keep the
        # window un-augmented for it; all other models are built to expect it
        # when config.encode_obs_time is on (models.__init__).
        encode_obs_time=config.encode_obs_time and model_name != "latent_ode",
        dt=dt,
        scan_unroll=config.mppi_scan_unroll,
    )
    dtype = jnp.result_type(float)  # f64 under jax_enable_x64, else f32
    mppi_params = make_mppi_params(default_noise_sigma(spec.m, config.mppi_sigma, dtype=dtype))

    dynamics_carry_init = None
    window_encoder = None
    if model_name == "oracle":
        dynamics = build_oracle_dynamics(env, roll_outs, dt, action_delay)
    elif model_name == "random":
        dynamics = None
    elif model_name == "latent_ode" and hasattr(model_apply, "predict_diff"):
        # pass the DynamicsModel itself for history-carried planning
        from ..models.latent_ode import make_carried_dynamics

        dynamics_carry_init, dynamics = make_carried_dynamics(
            model_apply, params, dt, spec.n_obs, spec.m,
            action_buffer_size=config.action_buffer_size,
        )
    else:
        assert model_apply is not None and params is not None, (
            "learned models need model_apply/params (train first; "
            "training.train.train_model returns them)"
        )
        if (
            model_name == "nl"
            and config.fused_nl_planner
            and config.nl_ilt_algorithm == "fourier"
        ):
            # swap the planner-path forward for the single fused Pallas
            # kernel (ops.pallas_nl). The model structure is rebuilt from
            # config (same factory => same param tree) to reach the
            # specializer; planner queries share the fixed horizon dt.
            from ..models import make_model

            m = make_model(
                "nl", env_name, spec.n_obs, spec.m, spec.action_high, config,
                dtype=jnp.float32,
            )
            f32_params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), params
            )
            model_apply = m.make_fused_planner_apply(f32_params, dt)
        if (
            model_name == "nl"
            and config.nl_planner_precompute
            and not config.fused_nl_planner
        ):
            # hoist the reverse-GRU window encoding out of the horizon scan
            # (planners.mppi_delay window_encoder): rebuild the model from
            # config (same factory => same param tree) to reach the
            # encoder/decoder split, then pre-encode all K x T windows per
            # planning step in one batched call
            from ..models import make_model
            from .rollout import build_learned_dynamics_encoded

            m = make_model(
                "nl", env_name, spec.n_obs, spec.m, spec.action_high, config,
            )
            window_encoder, dynamics = build_learned_dynamics_encoded(
                m, params, dt
            )
        else:
            dynamics = build_learned_dynamics(
                env, model_apply, params, roll_outs, dt,
                action_buffer_size=config.action_buffer_size,
            )

    settings = EpisodeSettings(
        delay=action_delay,
        n_steps=int(10.0 / dt),  # 10-second episodes (mppi_with_model.py:235-238)
        action_buffer_size=config.action_buffer_size,
        observation_noise=config.observation_noise,
        random_policy=model_name == "random",
        encode_obs_time=mppi_cfg.encode_obs_time,
        state_constraint=state_constraint,
        change_goal=change_goal,
    )

    command_fn = None
    if shard_rollouts and model_name != "random":
        assert not shard_seeds, "shard_rollouts and shard_seeds are exclusive"
        from jax.sharding import Mesh

        from ..parallel import make_k_sharded_mppi_command
        from .rollout import build_goal_running_cost, build_running_cost

        mesh = Mesh(np.asarray(devices), axis_names=("k",))
        cost_fn = (
            build_goal_running_cost(env)
            if change_goal
            else build_running_cost(env, state_constraint=state_constraint)
        )
        command_fn = make_k_sharded_mppi_command(
            mppi_cfg, mppi_params, dynamics, cost_fn, mesh,
            dynamics_carry_init=dynamics_carry_init,
            window_encoder=window_encoder,
        )

    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    if shard_grid is not None and model_name == "random":
        shard_grid = None  # no rollout batch to shard — same graceful
        # fallback shard_rollouts gets above, so grid callers (e.g. the
        # driver's --shard grid) need no per-model special-casing
    if shard_grid is not None:
        assert not (shard_seeds or shard_rollouts), (
            "shard_grid is exclusive with shard_seeds/shard_rollouts"
        )
        assert window_encoder is None, (
            "nl_planner_precompute is not supported on the 2-D grid mesh"
        )
        from jax.sharding import Mesh

        from ..parallel import make_grid_sharded_episodes

        n_s, n_k = shard_grid
        assert len(seeds) % n_s == 0, (len(seeds), n_s)
        assert len(devices) >= n_s * n_k, (
            f"shard_grid={shard_grid} needs {n_s * n_k} devices, "
            f"only {len(devices)} available"
        )
        devs = np.asarray(devices[: n_s * n_k]).reshape(n_s, n_k)
        mesh = Mesh(devs, axis_names=("seeds", "k"))
        episodes = make_grid_sharded_episodes(
            env, dynamics, mppi_cfg, mppi_params, settings, mesh,
            dynamics_carry_init=dynamics_carry_init,
        )
        compiled = episodes.lower(keys).compile()
        t0 = time.perf_counter()
        with profile_trace(profile_trace_dir):
            totals, records = compiled(keys)
            totals.block_until_ready()
        elapsed = time.perf_counter() - t0
    elif command_fn is not None:
        # K-sharded planner: the rollout batch spans every device, so seed
        # episodes run sequentially (each one saturates the mesh). A vmap
        # over the embedded shard_map would nest batching over manual
        # collectives — sequential is the supported composition.
        from .rollout import make_episode_fn

        episode = jax.jit(make_episode_fn(
            env, dynamics, mppi_cfg, mppi_params, settings,
            dynamics_carry_init=dynamics_carry_init, command_fn=command_fn,
        ))  # the sharded command_fn already owns its window_encoder
        compiled = episode.lower(keys[0]).compile()
        t0 = time.perf_counter()
        with profile_trace(profile_trace_dir):
            outs = []
            for i in range(keys.shape[0]):
                outs.append(compiled(keys[i]))
            jax.block_until_ready(outs)
        elapsed = time.perf_counter() - t0
        totals = jnp.stack([o[0] for o in outs])
        records = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[o[1] for o in outs])
    else:
        episode_batch = make_batched_episode_fn(
            env, dynamics, mppi_cfg, mppi_params, settings,
            dynamics_carry_init=dynamics_carry_init,
            window_encoder=window_encoder,
        )
        if shard_seeds and len(devices) > 1 and keys.shape[0] % len(devices) == 0:
            # spread independent seed-episodes across the chip mesh — the
            # multi-chip replacement for the reference's 12-worker eval pool
            # (run_exp_multi.py:144-165); XLA partitions the vmapped episode
            # batch along the sharded key axis, no collectives needed.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.asarray(devices), axis_names=("seeds",))
            keys = jax.device_put(keys, NamedSharding(mesh, P("seeds")))

        # AOT-compile outside the timed region so the reported throughput
        # measures execution, not the (60-120 s on this TPU) first compile —
        # otherwise sweep trials with fresh shapes are incomparable
        compiled = episode_batch.lower(keys).compile()
        t0 = time.perf_counter()
        with profile_trace(profile_trace_dir):
            totals, records = compiled(keys)
            totals.block_until_ready()
        elapsed = time.perf_counter() - t0

    video_path = None
    if config.save_video if save_video is None else save_video:
        # first seed's episode only (mppi_with_model.py:282-285)
        import os

        from ..envs.render import render_episode, save_video as _save

        os.makedirs(config.log_folder, exist_ok=True)
        first = jax.tree_util.tree_map(lambda x: x[0], records)
        frames = render_episode(env, first, delay=action_delay)
        video_path = _save(
            frames,
            f"{config.log_folder}/{model_name}_{env_name}_d{action_delay}.gif",
            fps=int(1.0 / dt),
        )

    scale = 200.0 / settings.n_steps
    totals = jnp.asarray(totals) * scale
    n = len(seeds)
    return {
        "model_name": model_name,
        "env_name": env_name,
        "roll_outs": roll_outs,
        "time_steps": time_steps,
        "dt": dt,
        "delay": action_delay,
        "planner": "mpc",
        "seeds": list(map(int, seeds)),
        "total_rewards": [float(x) for x in totals],
        "total_reward": float(jnp.mean(totals)),
        "total_reward_std": float(jnp.std(totals)),
        "episode_elapsed_time": elapsed,
        "episode_elapsed_time_per_it": elapsed / (settings.n_steps * n),
        "mppi_rollouts_per_sec": roll_outs * settings.n_steps * n / elapsed,
        "video_path": video_path,
    }

"""Rendering/video export and the MPPI hyperparameter sweep driver."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.envs.render import (
    render_episode,
    render_frame,
    save_video,
)
from neurallaplacecontrol_tpu.planners import (
    MPPIConfig,
    default_noise_sigma,
    make_mppi_params,
)
from neurallaplacecontrol_tpu.training.rollout import (
    EpisodeSettings,
    make_episode_fn,
)
from neurallaplacecontrol_tpu.training.sweep import SweepSpec, run_mppi_sweep


def test_render_frames_all_envs():
    for env_name, raw in {
        "oderl-cartpole": [0.3, 0.0, 0.7, 0.0],
        "oderl-pendulum": [2.0, 0.1],
        "oderl-acrobot": [0.5, -0.3, 0.0, 0.0],
    }.items():
        frame = render_frame(env_name, np.asarray(raw), last_act=np.asarray([1.0]))
        assert frame.ndim == 3 and frame.shape[-1] == 3
        assert frame.std() > 0  # something was drawn


def test_render_episode_and_save_video(key, tmp_path):
    env = make_env("oderl-pendulum")
    cfg = MPPIConfig(num_samples=4, horizon=3, nu=1, u_scale=2.0, u_min=-2.0, u_max=2.0)
    params = make_mppi_params(default_noise_sigma(1, 1.0, dtype=jnp.float64))
    settings = EpisodeSettings(delay=0, n_steps=6, random_policy=True)
    _, rec = jax.jit(make_episode_fn(env, None, cfg, params, settings))(key)
    frames = render_episode(env, rec)
    assert len(frames) == 6
    path = save_video(frames, str(tmp_path / "ep.gif"), fps=10)
    assert os.path.getsize(path) > 1000


def test_mppi_sweep_halving(tmp_path):
    """3-trial sweep on a short-episode config: halving keeps the best trial
    and every rung logs a JSONL record."""
    spec = SweepSpec(
        roll_outs=(8, 16), time_steps=(3, 5), lambdas=(1.0,), sigmas=(1.0,),
        n_trials=3, base_seeds=1, max_seeds=2,
    )
    results_path = str(tmp_path / "sweep.jsonl")
    best = run_mppi_sweep(
        "oracle", "oderl-pendulum", 0,
        config=Config(dt=0.5),  # 20-step episodes for CPU speed
        spec=spec, results_path=results_path,
    )
    assert best["mppi_roll_outs"] in (8, 16)
    assert np.isfinite(best["total_reward"])
    with open(results_path) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) >= 3  # one record per trial-rung evaluation
    assert len(best["trials"]) == len(lines)

"""End-to-end experiment driver test (run_exp_multi.main) on a miniature
grid: train -> evaluate -> JSONL results -> normalized table."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_exp_multi  # noqa: E402


def test_driver_mini_grid(tmp_path):
    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0",
        "--models", "nl,random",
        "--results", results,
        "--train_seconds", "15",
        "--retrain", "true",
        "--force_retrain", "true",
        "--seed_runs", "2",
        "--dt", "0.5",
        "--mppi_roll_outs", "8",
        "--mppi_time_steps", "3",
        "--train_with_expert_trajectories", "false",
        "--train_samples_per_dim", "3",
        "--iters_per_log", "50",
        "--saved_models_path", str(tmp_path) + "/",
        "--log_folder", str(tmp_path),
    ]
    run_exp_multi.main(argv)
    with open(results) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    by_model = {r["model_name"]: r for r in recs}
    assert set(by_model) == {"nl", "random"}
    for r in recs:
        assert not r["errored"]
        assert len(r["total_rewards"]) == 2
        assert np.isfinite(r["total_reward"])
    # the trained checkpoint landed under the configured path
    assert any(f.startswith("nl_") for f in os.listdir(tmp_path))


def test_driver_ensemble_with_gate(tmp_path):
    """Delay-ensemble training path + the worse-than-random control gate:
    both delays must come out trained, gated, and evaluated."""
    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0,1",
        "--models", "rnn,random",
        "--results", results,
        "--train_seconds", "10",
        "--retrain", "true",
        "--force_retrain", "true",
        "--ensemble_delays", "true",
        "--ensemble_gate", "rnn",
        "--seed_runs", "2",
        "--dt", "0.5",
        "--mppi_roll_outs", "8",
        "--mppi_time_steps", "3",
        "--train_with_expert_trajectories", "false",
        "--train_samples_per_dim", "3",
        "--iters_per_log", "50",
        "--saved_models_path", str(tmp_path) + "/",
        "--log_folder", str(tmp_path),
    ]
    run_exp_multi.main(argv)
    with open(results) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    cells = {(r["model_name"], r["delay"]) for r in recs if not r.get("errored")}
    assert cells == {("rnn", 0), ("rnn", 1), ("random", 0), ("random", 1)}

"""End-to-end experiment driver test (run_exp_multi.main) on a miniature
grid: train -> evaluate -> JSONL results -> normalized table."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_exp_multi  # noqa: E402


@pytest.mark.slow
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
        "--train_gate", "none",  # a 15 s draw needn't clear the margin
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


@pytest.mark.slow
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
        "--ensemble_gate_seeds", "2",
        "--ensemble_gate_margin", "0",  # 10s-budget rnn needn't clear +1 std
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


@pytest.mark.slow
def test_driver_gate_catches_planted_bad_ensemble_draw(tmp_path, monkeypatch):
    """VERDICT r2 item 5: a planted bad ensemble draw (model eval sabotaged
    to -1e9 until the first individual retrain) must trip the gate, trigger a
    per-delay retrain, and leave honestly-evaluated results behind."""
    retrains = []
    real_train = run_exp_multi.train_model

    def counting_train(model_name, env_name, config, **kw):
        # the gate's retrain path uses force_retrain + no checkpoint resume
        if kw.get("force_retrain") and not kw.get("start_from_checkpoint", True):
            retrains.append((model_name, env_name, kw.get("delay")))
        return real_train(model_name, env_name, config, **kw)

    real_eval = run_exp_multi.evaluate_policy

    def sabotaged_eval(model_name, env_name, delay, **kw):
        r = real_eval(model_name, env_name, delay, **kw)
        if model_name == "rnn" and "params" in kw and not retrains:
            r = dict(r, total_reward=-1e9)  # planted bad ensemble draw
        return r

    monkeypatch.setattr(run_exp_multi, "train_model", counting_train)
    monkeypatch.setattr(run_exp_multi, "evaluate_policy", sabotaged_eval)

    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0,1",
        "--models", "rnn",
        "--results", results,
        "--train_seconds", "8",
        "--retrain", "true",
        "--force_retrain", "true",
        "--ensemble_delays", "true",
        "--ensemble_gate", "rnn",
        "--ensemble_gate_seeds", "2",
        "--ensemble_gate_margin", "0",
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
    assert retrains and retrains[0][:2] == ("rnn", "oderl-pendulum")
    with open(results) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert {(r["model_name"], r["delay"]) for r in recs if not r.get("errored")} == {
        ("rnn", 0), ("rnn", 1),
    }


@pytest.mark.slow
def test_driver_ensemble_excludes_flagship_by_default(tmp_path, monkeypatch):
    """--ensemble_exclude defaults to 'nl': under --ensemble_delays the
    flagship must go through per-delay train_model, never the ensemble
    trainer (the r2 lesson of artifacts/run_nl_d3_diag.log)."""
    individual, ensembled = [], []
    real_train = run_exp_multi.train_model

    def spy_train(model_name, env_name, config, **kw):
        individual.append((model_name, kw.get("delay")))
        return real_train(model_name, env_name, config, **kw)

    def spy_ensemble(model_name, *a, **kw):
        ensembled.append(model_name)
        raise AssertionError("flagship must not reach the ensemble trainer")

    monkeypatch.setattr(run_exp_multi, "train_model", spy_train)
    monkeypatch.setattr(run_exp_multi, "train_model_ensemble", spy_ensemble)

    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0,1",
        "--models", "nl",
        "--results", results,
        "--train_seconds", "8",
        "--retrain", "true",
        "--force_retrain", "true",
        "--train_gate", "none",  # an 8 s draw needn't clear the margin
        "--ensemble_delays", "true",
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
    assert not ensembled
    assert {(m, d) for m, d in individual if m == "nl"} >= {("nl", 0), ("nl", 1)}


def test_driver_shard_grid_flag(tmp_path):
    """--shard grid:2x4 evaluates on the 2-D (seeds x k) mesh end-to-end
    through the driver (8 virtual CPU devices from conftest); the random
    policy cell falls back to unsharded instead of tripping the grid's
    no-rollout-batch assert."""
    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0",
        "--models", "oracle,random",
        "--results", results,
        "--seed_runs", "2",
        "--dt", "0.5",
        "--mppi_roll_outs", "8",
        "--mppi_time_steps", "3",
        "--saved_models_path", str(tmp_path) + "/",
        "--log_folder", str(tmp_path),
        "--shard", "grid:2x4",
    ]
    run_exp_multi.main(argv)
    with open(results) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    by_model = {r["model_name"]: r for r in recs}
    assert set(by_model) == {"oracle", "random"}
    for r in recs:
        assert not r["errored"], r
        assert np.isfinite(r["total_reward"])


def test_driver_profile_trace_flag(tmp_path):
    """--profile_trace_dir captures a per-cell jax.profiler trace during
    evaluation (the first-class tracing switch SURVEY.md §5 calls for)."""
    results = str(tmp_path / "results.jsonl")
    trace_root = str(tmp_path / "traces")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0",
        "--models", "random",
        "--results", results,
        "--seed_runs", "2",
        "--dt", "0.5",
        "--mppi_roll_outs", "8",
        "--mppi_time_steps", "3",
        "--saved_models_path", str(tmp_path) + "/",
        "--log_folder", str(tmp_path),
        "--profile_trace_dir", trace_root,
    ]
    run_exp_multi.main(argv)
    cell_dir = os.path.join(trace_root, "oderl-pendulum_random_d0")
    assert os.path.isdir(cell_dir)
    # the profiler writes under plugins/profile/<ts>/; any file suffices
    found = [
        os.path.join(dp, f) for dp, _, fs in os.walk(cell_dir) for f in fs
    ]
    assert found, "trace directory is empty"


@pytest.mark.slow
def test_driver_train_gate_reseeds_planted_bad_individual_draw(
    tmp_path, monkeypatch
):
    """--train_gate (default-on for nl; here rnn for a 10 s budget): a
    planted bad INDIVIDUAL draw — the first gate-check eval sabotaged to
    -1e9, the second forced to +1e9 so the outcome never depends on what
    an 8 s rnn draw actually learns — must trip the gate, trigger exactly
    one retrain with model_seed+1 (force_retrain, no checkpoint resume),
    and leave honest final results. Guards the landmine that hit the cme
    pendulum-d1 cell (artifacts/ilt_train_r5/: train loss 5.5e-4 yet
    -793 < random) on the main per-delay training path, which the r2-era
    gate only covered for ensemble training. Gate evals are distinguished
    from the final per-cell eval by seed count (gate 2 vs seed_runs 3)."""
    reseeded = []
    real_train = run_exp_multi.train_model

    def counting_train(model_name, env_name, config, **kw):
        if kw.get("force_retrain") and not kw.get("start_from_checkpoint", True):
            reseeded.append((model_name, kw.get("delay"), kw.get("model_seed")))
        return real_train(model_name, env_name, config, **kw)

    real_eval = run_exp_multi.evaluate_policy
    gate_evals = []

    def sabotaged_eval(model_name, env_name, delay, **kw):
        r = real_eval(model_name, env_name, delay, **kw)
        if model_name == "rnn" and "params" in kw and len(kw["seeds"]) == 2:
            gate_evals.append(kw["seeds"])
            # planted bad draw on the first gate check; forced pass on the
            # second so the test never hinges on real 8 s training quality
            forced = -1e9 if len(gate_evals) == 1 else 1e9
            r = dict(r, total_reward=forced)
        return r

    monkeypatch.setattr(run_exp_multi, "train_model", counting_train)
    monkeypatch.setattr(run_exp_multi, "evaluate_policy", sabotaged_eval)

    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0",
        "--models", "rnn,random",
        "--results", results,
        "--train_seconds", "8",
        "--retrain", "true",
        "--force_retrain", "true",
        "--train_gate", "rnn",
        "--train_gate_retries", "2",
        "--ensemble_gate_seeds", "2",
        "--ensemble_gate_margin", "0",
        "--model_seed", "7",
        "--seed_runs", "3",
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
    # exactly one reseeded retrain: gate check 1 fails (forced), gate
    # check 2 on the reseeded draw passes (forced)
    assert reseeded == [("rnn", 0, 8)]
    assert len(gate_evals) == 2
    with open(results) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    by_model = {r["model_name"]: r for r in recs if not r.get("errored")}
    assert set(by_model) == {"rnn", "random"}
    assert by_model["rnn"]["total_reward"] > -1e8  # final eval is honest


def test_driver_train_gate_none_skips_control_eval(tmp_path, monkeypatch):
    """--train_gate none must not spend any control evals: the only
    evaluate_policy calls are the final per-cell evaluations."""
    calls = []
    real_eval = run_exp_multi.evaluate_policy

    def spying_eval(model_name, env_name, delay, **kw):
        calls.append(model_name)
        return real_eval(model_name, env_name, delay, **kw)

    monkeypatch.setattr(run_exp_multi, "evaluate_policy", spying_eval)

    results = str(tmp_path / "results.jsonl")
    argv = [
        "--envs", "oderl-pendulum",
        "--delays", "0",
        "--models", "rnn",
        "--results", results,
        "--train_seconds", "5",
        "--retrain", "true",
        "--force_retrain", "true",
        "--train_gate", "none",
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
    assert calls == ["rnn"]

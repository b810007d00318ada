"""Autotuning: the measured PERF.md decision boundaries as an API.

recommend() must reproduce the shipped v5e verdicts exactly (the thresholds
cite their measuring artifacts); autotune() must pick the fastest candidate
that does not regress episode return, through both an injected evaluator
(deterministic decision-logic tests) and one real tiny CPU run (the live
evaluate_policy path).
"""

import json

from neurallaplacecontrol_tpu import tune
from neurallaplacecontrol_tpu.config import Config


def test_recommend_reference_shape_stays_f32():
    """K=1000, hidden=128 is the measured latency-bound regime: bf16 was
    0.99x there (artifacts/bench_bf16_r3.json) — no dtype change."""
    rec = tune.recommend(Config())
    assert rec.config.nl_compute_dtype == "float32"
    assert rec.config is not None and not rec.shard_rollouts
    assert "0.99x" in rec.rationale["nl_compute_dtype"]


def test_recommend_bigk_flips_bf16():
    """K >= 16384 is the measured bandwidth-bound regime (1.17-1.97x)."""
    rec = tune.recommend(Config(mppi_roll_outs=65536))
    assert rec.config.nl_compute_dtype == "bfloat16"
    rec2 = tune.recommend(Config(), roll_outs=tune.BF16_MIN_ROLLOUTS)
    assert rec2.config.nl_compute_dtype == "bfloat16"
    rec3 = tune.recommend(Config(), roll_outs=tune.BF16_MIN_ROLLOUTS - 1)
    assert rec3.config.nl_compute_dtype == "float32"


def test_recommend_wide_model_flips_bf16():
    """hidden >= 512 is MXU-bound (1.32-1.54x, bench_mxu_sweep_r3)."""
    rec = tune.recommend(Config(nl_hidden_units=1024))
    assert rec.config.nl_compute_dtype == "bfloat16"


def test_recommend_never_keeps_losing_flags():
    """The two measured-losing flags are corrected even if a caller turned
    them on (pallas 0.50-0.93x in-scan; precompute 0.35x)."""
    rec = tune.recommend(Config(fused_nl_planner=True, nl_planner_precompute=True))
    assert rec.config.fused_nl_planner is False
    assert rec.config.nl_planner_precompute is False
    assert "XLA" in rec.rationale["fused_nl_planner"]


def test_recommend_sharding_boundary():
    base = Config(mppi_roll_outs=16384)
    assert tune.recommend(base, n_devices=8).shard_rollouts  # 2048/device
    assert not tune.recommend(base, n_devices=1).shard_rollouts
    # below the per-device floor: 4096/64 = 64 < 512
    assert not tune.recommend(Config(mppi_roll_outs=4096), n_devices=64).shard_rollouts
    # indivisible K never shards
    assert not tune.recommend(Config(mppi_roll_outs=1000), n_devices=3).shard_rollouts


def _fake_evaluate(table):
    """Evaluator keyed by the overrides the trial config differs in."""

    def evaluate(model_name, env_name, delay, seeds, config, **kw):
        key = (config.nl_compute_dtype, config.mppi_scan_unroll)
        rps, reward = table[key]
        return {
            "mppi_rollouts_per_sec": rps,
            "total_reward": reward,
            "episode_elapsed_time": 1.0,
        }

    return evaluate


def test_autotune_picks_fastest_nonregressing(tmp_path):
    """The 2x-faster candidate wins only while its return holds; when it
    regresses past tolerance the baseline wins despite the speed."""
    candidates = [{}, {"nl_compute_dtype": "bfloat16"}, {"mppi_scan_unroll": 2}]
    good = {
        ("float32", 1): (1000.0, -150.0),
        ("bfloat16", 1): (2000.0, -155.0),  # faster, within 15% of -150
        ("float32", 2): (1100.0, -150.0),
    }
    path = str(tmp_path / "trials.jsonl")
    best, trials = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(), candidates=candidates,
        evaluate=_fake_evaluate(good), results_path=path,
    )
    assert best.nl_compute_dtype == "bfloat16"
    assert [t["best"] for t in trials] == [False, True, False]
    logged = [json.loads(line) for line in open(path)]
    assert len(logged) == 3 and logged[1]["best"]

    bad = dict(good)
    bad[("bfloat16", 1)] = (2000.0, -400.0)  # fast but plans much worse
    best2, trials2 = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(), candidates=candidates,
        evaluate=_fake_evaluate(bad),
    )
    assert best2.nl_compute_dtype == "float32"
    assert best2.mppi_scan_unroll == 2  # next-fastest eligible
    assert not trials2[1]["eligible"]


def test_autotune_baseline_always_first_and_eligible():
    """A candidate list without {} gets the baseline prepended, and the
    baseline is always return-eligible by construction."""
    table = {("float32", 1): (500.0, -100.0), ("bfloat16", 1): (400.0, -100.0)}
    best, trials = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(),
        candidates=[{"nl_compute_dtype": "bfloat16"}],
        evaluate=_fake_evaluate(table),
    )
    assert trials[0]["overrides"] == {} and trials[0]["eligible"]
    assert best.nl_compute_dtype == "float32"  # slower candidate loses


def test_autotune_default_candidates():
    """candidates=None derives the trial list from recommend(): baseline,
    the recommended dtype flip when the shape warrants one, and an unroll
    probe."""
    table = {
        ("float32", 1): (1000.0, -100.0),
        ("float32", 2): (900.0, -100.0),
        ("bfloat16", 1): (1800.0, -101.0),
    }
    best, trials = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(mppi_roll_outs=65536),
        evaluate=_fake_evaluate(table),
    )
    assert [t["overrides"] for t in trials] == [
        {}, {"nl_compute_dtype": "bfloat16"}, {"mppi_scan_unroll": 2}
    ]
    assert best.nl_compute_dtype == "bfloat16"

    # reference shape: nothing recommended, so just baseline + unroll probe
    _, trials2 = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(),
        evaluate=_fake_evaluate(table),
    )
    assert [t["overrides"] for t in trials2] == [{}, {"mppi_scan_unroll": 2}]

    # a base already at unroll=2 probes unroll=1, never itself
    table2 = dict(table)
    table2[("float32", 2)] = (1000.0, -100.0)
    _, trials3 = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(mppi_scan_unroll=2),
        evaluate=_fake_evaluate(table2),
    )
    assert [t["overrides"] for t in trials3] == [{}, {"mppi_scan_unroll": 1}]


def test_autotune_dedupes_and_drops_noop_candidates():
    """Duplicate candidates and overrides equal to the base are never
    measured twice — each duplicate costs a full episode batch (and a
    60-120 s remote compile per fresh shape on this TPU)."""
    calls = []

    def counting_evaluate(model_name, env_name, delay, seeds, config, **kw):
        calls.append(config.mppi_scan_unroll)
        return {
            "mppi_rollouts_per_sec": 1.0,
            "total_reward": -1.0,
            "episode_elapsed_time": 1.0,
        }

    _, trials = tune.autotune(
        "nl", "oderl-cartpole", 1, base=Config(),
        candidates=[{}, {"mppi_scan_unroll": 1},  # == base, a no-op
                    {"mppi_scan_unroll": 2}, {"mppi_scan_unroll": 2}],
        evaluate=counting_evaluate,
    )
    assert calls == [1, 2]
    assert [t["overrides"] for t in trials] == [{}, {"mppi_scan_unroll": 2}]


def test_autotune_rebuilds_model_for_compute_dtype():
    """An nl_compute_dtype candidate must NOT silently measure the caller's
    frozen-dtype apply: the dtype is baked into the closure at make_model
    time, so autotune rebuilds the model from the trial config (same
    factory => same param tree, so the caller's params load unchanged)."""
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model

    env = make_env("oderl-cartpole")
    base = Config()
    model = make_model("nl", "oderl-cartpole", env.spec.n_obs, env.spec.m,
                       env.spec.action_high, base)
    seen_applies = []

    def recording_evaluate(model_name, env_name, delay, seeds, config, **kw):
        seen_applies.append((config.nl_compute_dtype, kw["model_apply"]))
        return {
            "mppi_rollouts_per_sec": 1.0,
            "total_reward": -1.0,
            "episode_elapsed_time": 1.0,
        }

    tune.autotune(
        "nl", "oderl-cartpole", 1, base=base,
        candidates=[{}, {"nl_compute_dtype": "bfloat16"}],
        model_apply=model.apply, params=model.init(__import__("jax").random.PRNGKey(0)),
        evaluate=recording_evaluate,
    )
    assert seen_applies[0] == ("float32", model.apply)  # baseline: caller's
    dt_trial, apply_trial = seen_applies[1]
    assert dt_trial == "bfloat16"
    assert apply_trial is not model.apply  # rebuilt for the trial dtype


def test_autotune_live_tiny_oracle():
    """End-to-end through the real evaluate_policy on CPU: tiny oracle
    workload, two unroll candidates — asserts the full plumbing (timing,
    eligibility, JSONL fields) works outside the injected-evaluator path."""
    base = Config(mppi_roll_outs=16, mppi_time_steps=4)
    best, trials = tune.autotune(
        "oracle", "oderl-pendulum", 0, base=base,
        candidates=[{}, {"mppi_scan_unroll": 2}], seeds=(0,),
    )
    assert len(trials) == 2
    assert all(t["rollouts_per_sec"] > 0 for t in trials)
    # unroll changes scheduling, not math: both candidates plan identically
    assert abs(trials[0]["total_reward"] - trials[1]["total_reward"]) < 1e-6
    assert sum(t["best"] for t in trials) == 1
    assert isinstance(best, Config)

"""Results processing: normalized scores, LaTeX table, confidence interval
(reference process_results/process_logs.py:145-233, plot_util.py)."""

import numpy as np

from neurallaplacecontrol_tpu.results.process import (
    REFERENCE_BASELINES,
    latex_table,
    mean_confidence_interval,
    normalized_scores,
)


def _records():
    return [
        {"env_name": "oderl-pendulum", "model_name": "random", "delay": 0,
         "seeds": [0, 1], "total_rewards": [-600.0, -620.0]},
        {"env_name": "oderl-pendulum", "model_name": "oracle", "delay": 0,
         "seeds": [0, 1], "total_rewards": [-120.0, -122.0]},
        {"env_name": "oderl-pendulum", "model_name": "nl", "delay": 0,
         "seeds": [0, 1], "total_rewards": [-140.0, -900.0]},
    ]


def test_normalized_scores_definition():
    scores = normalized_scores(_records())
    # oracle normalizes to 100; random to ~0 — but clipping is per-seed
    # (process_logs.py:188), so the below-mean random seed clips to 0 and
    # the mean is half the above-mean seed's score
    assert abs(scores[(0, "oderl-pendulum", "oracle")][0] - 100.0) < 1e-9
    r_rand_score = 100.0 * (-600.0 - (-610.0)) / (-121.0 - (-610.0))
    assert abs(scores[(0, "oderl-pendulum", "random")][0] - r_rand_score / 2.0) < 1e-9
    # nl seed 1 (-900) is below random -> clipped to 0 (process_logs.py:188)
    mean_clip = scores[(0, "oderl-pendulum", "nl")][0]
    r_rand, r_orac = -610.0, -121.0
    s0 = 100.0 * (-140.0 - r_rand) / (r_orac - r_rand)
    assert abs(mean_clip - (s0 + 0.0) / 2.0) < 1e-9
    unclipped = normalized_scores(_records(), clip=False)
    assert unclipped[(0, "oderl-pendulum", "nl")][0] < mean_clip


def test_reference_baseline_fallback():
    recs = [{"env_name": "oderl-cartpole", "model_name": "nl", "delay": 1,
             "seeds": [0], "total_rewards": [-146.26]}]
    scores = normalized_scores(recs)
    # exactly the reference oracle return -> 100 against plot_util constants
    r_rand, r_orac = REFERENCE_BASELINES[1]["oderl-cartpole"]
    expect = 100.0 * (-146.26 - r_rand) / (r_orac - r_rand)
    assert abs(scores[(1, "oderl-cartpole", "nl")][0] - expect) < 1e-9


def test_latex_table_renders():
    tex = latex_table(_records())
    assert "\\begin{tabular}" in tex and "nl" in tex and "\\pm" in tex


def test_normalized_scores_ci95_agg():
    """agg='ci95' swaps the spread column for the Student-t half-width —
    the statistic every quality CLAIM quotes (VERDICT r4 item 4). The mean
    and n must be identical to the std aggregation; the half-width must
    equal mean_confidence_interval over the same per-seed scores."""
    std_scores = normalized_scores(_records())
    ci_scores = normalized_scores(_records(), agg="ci95")
    key = (0, "oderl-pendulum", "nl")
    assert ci_scores[key][0] == std_scores[key][0]
    assert ci_scores[key][2] == std_scores[key][2] == 2
    # recompute the per-seed normalized scores by hand for the CI check
    r_rand, r_orac = -610.0, -121.0
    s = [max(0.0, 100.0 * (v - r_rand) / (r_orac - r_rand)) for v in (-140.0, -900.0)]
    assert abs(ci_scores[key][1] - mean_confidence_interval(s)[1]) < 1e-9
    # n=2 Student-t is much wider than the population std
    assert ci_scores[key][1] > std_scores[key][1]


def test_summarize_ci_flag(tmp_path, capsys):
    """--ci end-to-end through the CLI entry point."""
    import json

    from neurallaplacecontrol_tpu.results.summarize import main

    path = tmp_path / "r.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in _records()))
    main([str(path), "--ci"])
    out = capsys.readouterr().out
    assert "ci95, n=2" in out and "\\begin{tabular}" in out


def test_mean_confidence_interval():
    m, h = mean_confidence_interval([1.0, 2.0, 3.0, 4.0])
    assert abs(m - 2.5) < 1e-12
    assert 1.5 < h < 2.5  # t-interval for n=4, std 1.29
    m1, h1 = mean_confidence_interval([5.0])
    assert m1 == 5.0 and h1 == 0.0


def test_parse_log_file(tmp_path):
    from neurallaplacecontrol_tpu.results.process import parse_log_file

    log = tmp_path / "run.log"
    log.write_text(
        "08:00:00 INFO training stuff\n"
        "08:01:00 INFO [Model Completed evaluation mppi] "
        "{'model_name': 'nl', 'env_name': 'oderl-pendulum', 'delay': 0, "
        "'total_reward': -130.0, 'total_reward_std': 4.0}\n"
        "08:02:00 INFO [Model Completed evaluation mppi] not-a-dict\n"
    )
    recs = parse_log_file(log)
    assert len(recs) == 1 and recs[0]["total_reward"] == -130.0


def test_parse_log_file_keeps_nan_records(tmp_path):
    """Diverged runs (nan rewards) must still be parsed, not dropped."""
    from neurallaplacecontrol_tpu.results.process import parse_log_file

    log = tmp_path / "run.log"
    log.write_text(
        "08:01:00 INFO [Model Completed evaluation mppi] "
        "{'model_name': 'nl', 'env_name': 'oderl-pendulum', 'delay': 0, "
        "'total_reward': nan, 'total_reward_std': inf}\n"
    )
    recs = parse_log_file(log)
    assert len(recs) == 1
    assert np.isnan(recs[0]["total_reward"]) and np.isinf(recs[0]["total_reward_std"])


def test_plot_matrix_scores_renders(tmp_path):
    """The matrix figure renders from result records: one panel per env,
    the model color map fixed by identity (colors never follow rank), and
    an unknown family folds to the overflow gray instead of a new hue."""
    from neurallaplacecontrol_tpu.results.plotting import (
        _MODEL_COLORS,
        plot_matrix_scores,
    )

    recs = []
    for env in ("oderl-pendulum", "oderl-cartpole"):
        for delay in (0, 1):
            for model, reward in (("nl", -130.0), ("oracle", -121.0),
                                  ("random", -616.0), ("mystery", -300.0)):
                recs.append({
                    "model_name": model, "env_name": env, "delay": delay,
                    "total_reward": reward, "total_rewards": [reward] * 3,
                })
    out = plot_matrix_scores(recs, path=str(tmp_path / "m.png"))
    import os

    assert os.path.getsize(out) > 10_000
    # identity encoding contract: known families own fixed hues
    assert _MODEL_COLORS["nl"] != _MODEL_COLORS["oracle"]
    assert "mystery" not in _MODEL_COLORS  # folds to overflow gray

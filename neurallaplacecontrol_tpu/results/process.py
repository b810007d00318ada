"""Results processing: normalized-return tables.

Rebuild of reference process_results/process_logs.py — but reading JSONL
records written by the driver instead of re-parsing log prose with
ast.literal_eval (process_logs.py:145-157).

Headline score (process_logs.py:183-190):
    normalized = 100 * (R - R_random) / (R_oracle - R_random), clipped >= 0
aggregated as mean +/- std over seeds.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterable, Optional

import numpy as np

# reference normalization constants for delays 0/1 (plot_util.py:1-26);
# used as fallback when a run lacks its own oracle/random baselines
REFERENCE_BASELINES = {
    0: {
        "oderl-acrobot": (-2948.64, -571.11),  # (random, oracle)
        "oderl-cartpole": (-14246.30, -139.69),
        "oderl-pendulum": (-616.77, -121.05),
    },
    1: {
        "oderl-acrobot": (-2910.50, -558.76),
        "oderl-cartpole": (-9713.19, -146.26),
        "oderl-pendulum": (-575.98, -123.44),
    },
}


def parse_log_file(path) -> list:
    """Extract result dicts from '[Model Completed evaluation mppi] {...}'
    log lines (the reference's log-as-database flow,
    process_logs.py:145-157). Works on logs from this driver and from the
    reference's run_exp_multi."""
    import ast

    marker = "[Model Completed evaluation mppi]"
    records = []
    with open(path) as f:
        for line in f:
            if marker not in line:
                continue
            payload = line.split(marker, 1)[1].strip()
            try:
                rec = ast.literal_eval(payload)
            except (ValueError, SyntaxError):
                # literal_eval rejects nan/inf reprs — a DIVERGED run must
                # still appear in the results, not silently vanish. Token
                # substitution keeps this pure literal_eval (NEVER eval():
                # log files are untrusted input).
                import re

                sub = re.sub(r"\b(nan|inf)\b", r"'__\1__'", payload)
                sub = sub.replace("-'__inf__'", "'__ninf__'")
                try:
                    rec = ast.literal_eval(sub)
                except (ValueError, SyntaxError):
                    continue
                sentinels = {
                    "__nan__": float("nan"),
                    "__inf__": float("inf"),
                    "__ninf__": float("-inf"),
                }
                rec = {
                    k: sentinels.get(v, v) if isinstance(v, str) else v
                    for k, v in rec.items()
                } if isinstance(rec, dict) else rec
            if isinstance(rec, dict):
                records.append(rec)
    return records


def mean_confidence_interval(data, confidence: float = 0.95):
    """(mean, half-width) Student-t interval
    (process_logs.mean_confidence_interval)."""
    a = np.asarray(data, dtype=float)
    n = a.size
    m = float(np.mean(a))
    if n < 2:
        return m, 0.0
    se = float(np.std(a, ddof=1)) / np.sqrt(n)
    try:
        from scipy import stats

        h = se * float(stats.t.ppf((1 + confidence) / 2.0, n - 1))
    except ImportError:  # normal approximation fallback
        h = se * 1.96
    return m, h


def expand_records(records: Iterable[dict]) -> list:
    """evaluate_policy returns one record per task with per-seed rewards;
    expand to one row per (task, seed)."""
    rows = []
    for r in records:
        rewards = r.get("total_rewards", [r.get("total_reward")])
        seeds = r.get("seeds") or [None] * len(rewards)
        for s, tr in zip(seeds, rewards):
            rows.append(
                {
                    "env_name": r["env_name"],
                    "model_name": r["model_name"],
                    "delay": r["delay"],
                    "seed": s,
                    "total_reward": tr,
                }
            )
    return rows


def normalized_scores(
    records: Iterable[dict], clip: bool = True, agg: str = "std"
) -> dict:
    """{(delay, env, model): (mean, spread, n)} of normalized returns.

    ``agg`` picks the spread statistic: "std" (population std over seeds,
    the reference's table convention, process_logs.py:183-190) or "ci95"
    (Student-t 95% half-width via mean_confidence_interval — what any
    parity/quality CLAIM should quote; seed noise at n<=20 makes bare
    mean-vs-mean comparisons unreliable, PERF.md r4 int8 lesson)."""
    rows = expand_records(records)
    by_task = defaultdict(list)
    for r in rows:
        by_task[(r["delay"], r["env_name"], r["model_name"])].append(r["total_reward"])

    def baseline(delay, env):
        rand = by_task.get((delay, env, "random"))
        orac = by_task.get((delay, env, "oracle"))
        if rand and orac:
            return float(np.mean(rand)), float(np.mean(orac))
        # reference constants cover delays 0/1 only; cells with no usable
        # baseline are SKIPPED (returning None) rather than crashing the
        # whole summary after a long run
        return REFERENCE_BASELINES.get(delay, {}).get(env)

    assert agg in ("std", "ci95"), agg
    out = {}
    for (delay, env, model), vals in by_task.items():
        ref = baseline(delay, env)
        if ref is None:
            continue
        r_rand, r_orac = ref
        denom = r_orac - r_rand
        scores = [100.0 * (v - r_rand) / denom for v in vals]
        if clip:
            scores = [max(0.0, s) for s in scores]
        if agg == "ci95":
            mean, spread = mean_confidence_interval(scores)
        else:
            mean, spread = float(np.mean(scores)), float(np.std(scores))
        out[(delay, env, model)] = (mean, spread, len(scores))
    return out


def latex_table(records: Iterable[dict], models: Optional[list] = None,
                envs: Optional[list] = None, delays: Optional[list] = None,
                agg: str = "std") -> str:
    """Emit the paper-style LaTeX table (process_logs.py:196-233):
    rows = models, column groups = delays x envs, cells mean +/- spread
    (``agg`` as in normalized_scores: "std" reference convention, "ci95"
    Student-t half-width)."""
    scores = normalized_scores(records, agg=agg)
    delays = delays or sorted({k[0] for k in scores})
    envs = envs or sorted({k[1] for k in scores})
    models = models or sorted({k[2] for k in scores})

    header = "Model & " + " & ".join(
        f"{env.replace('oderl-', '')} (d={d})" for d in delays for env in envs
    )
    lines = ["\\begin{tabular}{l" + "c" * (len(delays) * len(envs)) + "}",
             "\\toprule", header + " \\\\", "\\midrule"]
    for m in models:
        cells = []
        for d in delays:
            for env in envs:
                v = scores.get((d, env, m))
                cells.append("--" if v is None else f"${v[0]:.1f} \\pm {v[1]:.1f}$")
        lines.append(f"{m} & " + " & ".join(cells) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines)

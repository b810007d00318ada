"""Performance autotuning: turn the measured PERF.md verdicts into an API.

The reference leaves planner/model performance knobs to a wandb bayes sweep
over MPPI hyperparameters only (mppi_optim.yaml) and has no notion of
execution-level tuning — every torch call runs however eager mode runs it.
This framework has real, measured execution knobs (compute dtype, fused
kernel, window-encoder precompute, scan unroll, multi-chip sharding), and
their best settings depend on the workload shape. Two entry points:

- ``recommend(...)`` — zero-cost heuristic: applies the measured decision
  boundaries from PERF.md (each threshold cites the artifact that measured
  it) to a workload shape and returns a tuned ``Config`` plus per-knob
  rationale strings. Use when you trust this repo's v5e measurements.
- ``autotune(...)`` — measures: times each candidate config on the live
  backend through the SAME ``evaluate_policy`` entry point users run
  (AOT-compiled timing, so first-compile cost is excluded), returns the
  fastest whose episode return stays within tolerance of the baseline
  config, and a JSON-serializable trial log. Use on new hardware, new
  shapes, or to re-validate the shipped thresholds.

Measured decision boundaries encoded here (one v5e chip; see PERF.md for
the full table and artifacts/ for raw numbers):

- bf16 NL compute is perf-NEUTRAL at the reference operating point
  (K=1000, hidden=128: 0.99x, artifacts/bench_bf16_r3.json) but wins
  1.97x at K=65536 and 1.80x at K=262144 (artifacts/bench_bigk_dtype_r3.log)
  and 1.54x at hidden=1024 (artifacts/bench_mxu_sweep_r3.json): recommend
  "bfloat16" when K >= 16384 or hidden >= 512.
- The fused Pallas planner kernel loses inside the compiled planner scan at
  every K (0.50-0.93x, artifacts/bench_pallas_r2.json): never recommended.
- Window-encoder precompute spills [K*T, 3H] to HBM and loses everywhere
  (0.35x episode, artifacts/bench_precompute_r3.json): never recommended.
- K-sharding the rollout batch pays when more than one device is attached
  and the per-device slice stays MXU-worthy (>= 512 rollouts/device, the
  regime bench_scaling measured still scaling).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Optional

from .config import Config

# measured thresholds (PERF.md); module constants so tests can pin them
BF16_MIN_ROLLOUTS = 16384  # artifacts/bench_bigk_dtype_r3.log: 1.17x here, 1.97x at 65536
BF16_MIN_HIDDEN = 512  # artifacts/bench_mxu_sweep_r3.json: bf16 1.32x at 512, 1.54x at 1024
SHARD_MIN_ROLLOUTS_PER_DEVICE = 512


@dataclass(frozen=True)
class Recommendation:
    """A tuned config plus why each knob landed where it did."""

    config: Config
    shard_rollouts: bool
    rationale: dict = field(default_factory=dict)  # knob -> one-line reason

    def summary(self) -> str:
        return "\n".join(f"{k}: {v}" for k, v in sorted(self.rationale.items()))


def recommend(
    base: Config = Config(),
    *,
    roll_outs: Optional[int] = None,
    n_devices: int = 1,
) -> Recommendation:
    """Apply the measured v5e decision boundaries to a workload shape.

    ``roll_outs`` defaults to ``base.mppi_roll_outs``; ``n_devices`` is how
    many chips the planner may shard K over (1 = single chip).
    """
    roll_outs = roll_outs or base.mppi_roll_outs
    rationale = {}
    overrides = {}

    big_k = roll_outs >= BF16_MIN_ROLLOUTS
    wide = base.nl_hidden_units >= BF16_MIN_HIDDEN
    if big_k or wide:
        overrides["nl_compute_dtype"] = "bfloat16"
        rationale["nl_compute_dtype"] = (
            f"bfloat16: {'K=%d >= %d' % (roll_outs, BF16_MIN_ROLLOUTS) if big_k else ''}"
            f"{' and ' if big_k and wide else ''}"
            f"{'hidden=%d >= %d' % (base.nl_hidden_units, BF16_MIN_HIDDEN) if wide else ''}"
            " — bandwidth/MXU-bound regime, measured 1.17-1.97x"
            " (artifacts/bench_bigk_dtype_r3.log, bench_mxu_sweep_r3.json)"
        )
    else:
        rationale["nl_compute_dtype"] = (
            f"float32: K={roll_outs}, hidden={base.nl_hidden_units} is the "
            "latency-bound regime where bf16 measured 0.99x "
            "(artifacts/bench_bf16_r3.json)"
        )

    if base.fused_nl_planner:
        overrides["fused_nl_planner"] = False
        rationale["fused_nl_planner"] = (
            "off: XLA's in-scan fusion beats the fused kernel inside the "
            "compiled planner at every K (0.50-0.93x, "
            "artifacts/bench_pallas_r2.json)"
        )
    if base.nl_planner_precompute:
        overrides["nl_planner_precompute"] = False
        rationale["nl_planner_precompute"] = (
            "off: hoisted-GRU HBM spill beats chain shortening everywhere "
            "(0.35x, artifacts/bench_precompute_r3.json)"
        )

    shard = (
        n_devices > 1
        and roll_outs % n_devices == 0
        and roll_outs // n_devices >= SHARD_MIN_ROLLOUTS_PER_DEVICE
    )
    rationale["shard_rollouts"] = (
        f"{'on' if shard else 'off'}: {n_devices} device(s), "
        f"{roll_outs} rollouts -> "
        + (
            f"{roll_outs // n_devices}/device K-shard (3 collectives/plan on ICI)"
            if shard
            else "single-chip planner (sharding needs >1 device, divisibility, "
            f"and >= {SHARD_MIN_ROLLOUTS_PER_DEVICE} rollouts/device)"
        )
    )

    cfg = base.replace(**overrides) if overrides else base
    return Recommendation(config=cfg, shard_rollouts=shard, rationale=rationale)


def autotune(
    model_name: str,
    env_name: str,
    action_delay: int,
    *,
    base: Config = Config(),
    candidates: Optional[list] = None,
    model_apply=None,
    params=None,
    seeds=(0, 1),
    return_tolerance: float = 0.15,
    results_path: Optional[str] = None,
    evaluate=None,
) -> tuple:
    """Measure candidate configs on the live backend; return
    ``(best_config, trials)``.

    Each candidate is a dict of ``Config.replace`` overrides; the first
    entry is the baseline (empty dict prepended if absent). A candidate
    only wins if its mean episode return stays within ``return_tolerance``
    (relative, against the baseline's |return|) — a "faster" config that
    plans measurably worse is a regression, not a win (the bf16 big-K
    acceptance in artifacts/results_bigk_bf16_r3.jsonl used the same rule).

    Timing comes from ``evaluate_policy``'s AOT-compiled episode clock, so
    the 60-120 s first-compile on this TPU's remote helper never pollutes a
    trial. Expect each NEW shape to pay that compile once, outside the
    timed region; identical shapes hit the jit cache.

    ``evaluate`` is injectable for tests (same signature as
    ``training.evaluate_policy``).
    """
    if evaluate is None:
        from .training import evaluate_policy as evaluate

    if candidates is None:
        rec = recommend(base)
        candidates = [{}]
        if rec.config is not base:
            diff = {
                k: getattr(rec.config, k)
                for k in ("nl_compute_dtype", "fused_nl_planner", "nl_planner_precompute")
                if getattr(rec.config, k) != getattr(base, k)
            }
            if diff:
                candidates.append(diff)
        # probe a DIFFERENT unroll than the base's (probing the base value
        # would re-measure an identical config)
        candidates.append({"mppi_scan_unroll": 2 if base.mppi_scan_unroll == 1 else 1})
    # normalize: drop override keys equal to the base (no-ops), dedupe, and
    # keep the baseline {} first — each duplicate avoided saves a full
    # episode batch (and a 60-120 s remote compile per fresh shape here)
    seen, norm = set(), []
    for c in [{}] + list(candidates):
        c = {k: v for k, v in c.items() if getattr(base, k) != v}
        key = tuple(sorted(c.items()))
        if key in seen:
            continue
        seen.add(key)
        norm.append(c)
    candidates = norm

    trials = []
    for overrides in candidates:
        cfg = base.replace(**overrides) if overrides else base
        trial_apply = model_apply
        if model_name == "nl" and model_apply is not None and "nl_compute_dtype" in overrides:
            # the compute dtype is frozen into the model closure at
            # make_model time — evaluate_policy uses the CALLER'S apply, so
            # without a rebuild this trial would silently measure the base
            # dtype. Same factory => same param tree, so the caller's params
            # load unchanged (models/__init__.py make_model).
            from .envs import make_env
            from .models import make_model

            spec = make_env(env_name, dt=cfg.dt).spec
            trial_apply = make_model(
                model_name, env_name, spec.n_obs, spec.m, spec.action_high, cfg
            ).apply
        t0 = time.perf_counter()
        res = evaluate(
            model_name, env_name, action_delay, seeds=list(seeds), config=cfg,
            model_apply=trial_apply, params=params,
        )
        trials.append(
            {
                "overrides": dict(overrides),
                "rollouts_per_sec": res["mppi_rollouts_per_sec"],
                "total_reward": res["total_reward"],
                "episode_elapsed_s": res["episode_elapsed_time"],
                "wall_incl_compile_s": time.perf_counter() - t0,
            }
        )

    baseline = trials[0]
    floor = baseline["total_reward"] - return_tolerance * abs(baseline["total_reward"])
    eligible = [t for t in trials if t["total_reward"] >= floor]
    best = max(eligible, key=lambda t: t["rollouts_per_sec"])
    for t in trials:
        t["eligible"] = t in eligible
        t["best"] = t is best

    if results_path:
        with open(results_path, "w") as f:
            for t in trials:
                f.write(json.dumps(t) + "\n")

    best_cfg = base.replace(**best["overrides"]) if best["overrides"] else base
    return best_cfg, trials

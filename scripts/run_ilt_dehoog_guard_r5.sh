#!/usr/bin/env bash
# Round-5 VERDICT item 5, dehoog third attempt — now with the
# reject-don't-clip guard (Config.training_loss_skip_factor): attempt 1
# died of Inf-grad poisoning (pre-zap optimizer), attempt 2 survived to
# t=900 s but the recurring railed-overflow kicks (loss 4e-4 -> 1e18 from
# epoch ~22) left the FINAL checkpoint mid-kick (normalized 0.5). The
# guard skips those batches outright, so the final params stay in the
# converged basin.
#
# Usage: bash scripts/run_ilt_dehoog_guard_r5.sh   (TPU host, quiet chip)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/ilt_train_r5

python run_exp_multi.py \
  --envs oderl-pendulum --delays 1 --models nl,oracle,random \
  --retrain true --force_retrain true --seed_runs 20 \
  --train_seconds 900 \
  --nl_ilt_algorithm dehoog \
  --saved_models_path "./saved_models_ilt_dehoog/" \
  --results "logs/results_ilt_dehoog_guard_r5.jsonl" \
  2>&1 | tee "logs/run_ilt_dehoog_guard_r5.log"
cp "logs/results_ilt_dehoog_guard_r5.jsonl" artifacts/ilt_train_r5/
grep -E "train_loss=" "logs/run_ilt_dehoog_guard_r5.log" \
  > "artifacts/ilt_train_r5/loss_curve_dehoog_guard.log" || true
python -m neurallaplacecontrol_tpu.results.summarize \
  "artifacts/ilt_train_r5/results_ilt_dehoog_guard_r5.jsonl" --ci

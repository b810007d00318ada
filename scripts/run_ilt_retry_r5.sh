#!/usr/bin/env bash
# Round-5 VERDICT item 5, second attempt, after the first run
# (scripts/run_ilt_train_r5.sh, artifacts/ilt_train_r5/) failed two ways:
#   - dehoog: one Inf-grad poisoning event at t=799/900 s killed training
#     (fixed at HEAD by the _zap_nonfinite optimizer stage, commit 8af92cc);
#     retrain unchanged.
#   - cme: trained to loss 5.5e-4 but planned at -793 (below random) with
#     near-zero seed variance — the documented NL bad-draw landmine
#     (artifacts/run_nl_d3_diag.log pattern; multi-step open-loop RMSE vs
#     the fourier twin is equal, so the ILT algorithm is not at fault).
#     Retry with model_seed=1 in a fresh saved dir.
#
# Usage: bash scripts/run_ilt_retry_r5.sh   (on the TPU host, quiet chip)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/ilt_train_r5

run_alg() {
  local ALG="$1" SEED="$2" SAVED="$3" TAG="$4"
  echo "=== nl + ${ALG} (model_seed=${SEED}): train 900 s, eval 20 seeds ==="
  python run_exp_multi.py \
    --envs oderl-pendulum --delays 1 --models nl,oracle,random \
    --retrain true --force_retrain true --seed_runs 20 \
    --train_seconds 900 \
    --nl_ilt_algorithm "${ALG}" \
    --model_seed "${SEED}" \
    --saved_models_path "${SAVED}" \
    --results "logs/results_ilt_${TAG}_r5.jsonl" \
    2>&1 | tee "logs/run_ilt_${TAG}_r5.log"
  cp "logs/results_ilt_${TAG}_r5.jsonl" artifacts/ilt_train_r5/
  grep -E "train_loss=" "logs/run_ilt_${TAG}_r5.log" \
    > "artifacts/ilt_train_r5/loss_curve_${TAG}.log" || true
}

run_alg dehoog 0 "./saved_models_ilt_dehoog/" dehoog_retry
run_alg cme 1 "./saved_models_ilt_cme_s1/" cme_s1

echo "=== summaries ==="
for TAG in dehoog_retry cme_s1; do
  echo "--- ${TAG} ---"
  python -m neurallaplacecontrol_tpu.results.summarize \
    "artifacts/ilt_train_r5/results_ilt_${TAG}_r5.jsonl" --ci
done

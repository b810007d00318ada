#!/usr/bin/env bash
# Round-5 VERDICT item 5: train + evaluate the NL flagship with the two
# non-fourier ILT algorithms on pendulum d1 at the fourier twin's budget
# (900 s, scripts/run_matrix_r2b.sh) and the full 20-seed protocol, with
# per-run oracle/random cells for normalization. Each run is isolated in
# its own saved_models dir (checkpoint names don't encode the ILT
# algorithm — reference train_utils.py:172-180 — so sharing a dir with
# the fourier checkpoints would collide).
#
# Usage: bash scripts/run_ilt_train_r5.sh   (on the TPU host, quiet chip)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs artifacts/ilt_train_r5

for ALG in cme dehoog; do
  echo "=== nl + ${ALG}: train 900 s, eval 20 seeds (pendulum d1) ==="
  python run_exp_multi.py \
    --envs oderl-pendulum --delays 1 --models nl,oracle,random \
    --retrain true --force_retrain true --seed_runs 20 \
    --train_seconds 900 \
    --nl_ilt_algorithm "${ALG}" \
    --saved_models_path "./saved_models_ilt_${ALG}/" \
    --results "logs/results_ilt_${ALG}_r5.jsonl" \
    2>&1 | tee "logs/run_ilt_${ALG}_r5.log"
  cp "logs/results_ilt_${ALG}_r5.jsonl" artifacts/ilt_train_r5/
  # loss curve: every train_loss line the driver logged
  grep -E "train_loss=" "logs/run_ilt_${ALG}_r5.log" \
    > "artifacts/ilt_train_r5/loss_curve_${ALG}.log" || true
done
echo "=== summaries ==="
for ALG in cme dehoog; do
  echo "--- ${ALG} ---"
  python -m neurallaplacecontrol_tpu.results.summarize \
    "artifacts/ilt_train_r5/results_ilt_${ALG}_r5.jsonl" --ci
done

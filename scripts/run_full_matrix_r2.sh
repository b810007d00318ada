#!/usr/bin/env bash
# Round-2 full experiment matrix at the reference protocol:
# 6 model classes x 3 envs x 4 delays, 20 eval seeds per cell
# (reference run_exp_multi.py:19-26,135-141; seeds config.py:12).
#
# Each trainable family trains as a delay-ensemble (all 4 delays in one
# vmapped run) with a per-family wall-clock budget sized to its measured
# convergence (delta_t_rnn/node plateau in <10 min; nl gets the most).
# Expert replay buffers are collected on-demand (cache-first) by the
# training data path. Everything appends to one results JSONL.
#
# Run me from the repo root with the TPU otherwise idle:
#   bash scripts/run_full_matrix_r2.sh >> artifacts/run_full_r2.log 2>&1
set -u
RESULTS=artifacts/results_full_r2.jsonl
COMMON="--delays 0,1,2,3 --ensemble_delays true --retrain true --seed_runs 20 --results $RESULTS"

for ENV in oderl-pendulum oderl-cartpole oderl-acrobot; do
  echo "=== $ENV nl ==="
  python run_exp_multi.py --envs $ENV --models nl           $COMMON --train_seconds 1500
  echo "=== $ENV delta_t_rnn ==="
  python run_exp_multi.py --envs $ENV --models delta_t_rnn  $COMMON --train_seconds 600
  echo "=== $ENV node ==="
  python run_exp_multi.py --envs $ENV --models node         $COMMON --train_seconds 600
  echo "=== $ENV latent_ode ==="
  python run_exp_multi.py --envs $ENV --models latent_ode   $COMMON --train_seconds 900
  echo "=== $ENV oracle+random ==="
  python run_exp_multi.py --envs $ENV --models oracle,random --delays 0,1,2,3 \
    --seed_runs 20 --results $RESULTS
done

echo "=== summary ==="
python -m neurallaplacecontrol_tpu.results.summarize $RESULTS
echo "=== full matrix done ==="

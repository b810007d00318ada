#!/usr/bin/env bash
# Post-matrix extras (round 2), run with the TPU otherwise idle:
#   1. encode_obs_time end-to-end artifact (VERDICT r1 item 8)
#   2. cartpole-friction end-to-end artifact (item 8)
#   3. Pallas vs XLA measurements: head / full forward / planner loop (item 7)
#   4. K-sweep planner scaling artifact, K=1k..262k (item 5)
#   5. big-K (16384) NL policy eval artifact (item 5)
# Variant checkpoints use their own saved_models dir: the checkpoint name
# does not encode friction/encode_obs_time (same as the reference,
# train_utils.py:172-181), so sharing a dir would clobber the main models.
set -u

echo "=== encode_obs_time: nl pendulum d0 ==="
python run_exp_multi.py --envs oderl-pendulum --delays 0 --models nl \
  --encode_obs_time true --retrain true --force_retrain true \
  --train_seconds 600 --seed_runs 5 \
  --saved_models_path ./saved_models_variants/ \
  --results artifacts/results_encode_obs_time.jsonl

echo "=== friction: nl cartpole d0 ==="
python run_exp_multi.py --envs oderl-cartpole --delays 0 --models nl,oracle,random \
  --friction true --retrain true --force_retrain true \
  --train_seconds 600 --seed_runs 5 \
  --saved_models_path ./saved_models_variants/ \
  --results artifacts/results_friction.jsonl

echo "=== pallas bench ==="
python scripts/bench_pallas.py

echo "=== K-sweep scaling ==="
python scripts/bench_scaling.py | tee artifacts/bench_scaling_r2.txt

echo "=== big-K eval ==="
python scripts/eval_bigk.py

echo "=== extras done ==="

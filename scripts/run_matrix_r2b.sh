#!/usr/bin/env bash
# Corrected continuation of run_full_matrix_r2.sh (round 2).
#
# Change vs r2: NL trains per-delay INDIVIDUALLY (no --ensemble_delays).
# The delay-ensemble trainer reaches the same train loss but its vmapped
# numerics follow a different SGD trajectory, and for NL pendulum d3 it
# landed on a model with near-zero action sensitivity from the hanging
# state — one-step MSE 8e-4 yet MPPI never swings up (-799 vs -140).
# Individual training on the same data/seed/budget reproduces the round-1
# scores (artifacts/run_nl_d3_diag.log). Baseline families keep the
# ensemble path: their architectures plateau early and identically.
set -u
RESULTS=artifacts/results_full_r2.jsonl
ENS="--delays 0,1,2,3 --ensemble_delays true --retrain true --seed_runs 20 --results $RESULTS"
IND="--delays 0,1,2,3 --retrain true --seed_runs 20 --results $RESULTS"

# pendulum: nl/delta_t_rnn/node were finished by the r2 run; re-eval nl d3
# with the good individually-trained model (checkpoint copied into
# saved_models/ by the caller), then the remaining pendulum families
echo "=== oderl-pendulum nl d3 re-eval ==="
python run_exp_multi.py --envs oderl-pendulum --models nl --delays 3 \
  --seed_runs 20 --results $RESULTS
echo "=== oderl-pendulum latent_ode ==="
python run_exp_multi.py --envs oderl-pendulum --models latent_ode $ENS --train_seconds 900
echo "=== oderl-pendulum oracle+random ==="
python run_exp_multi.py --envs oderl-pendulum --models oracle,random --delays 0,1,2,3 \
  --seed_runs 20 --results $RESULTS

for ENV in oderl-cartpole oderl-acrobot; do
  echo "=== $ENV nl (individual per delay) ==="
  python run_exp_multi.py --envs $ENV --models nl           $IND --train_seconds 900
  echo "=== $ENV delta_t_rnn ==="
  python run_exp_multi.py --envs $ENV --models delta_t_rnn  $ENS --train_seconds 600
  echo "=== $ENV node ==="
  python run_exp_multi.py --envs $ENV --models node         $ENS --train_seconds 600
  echo "=== $ENV latent_ode ==="
  python run_exp_multi.py --envs $ENV --models latent_ode   $ENS --train_seconds 900
  echo "=== $ENV oracle+random ==="
  python run_exp_multi.py --envs $ENV --models oracle,random --delays 0,1,2,3 \
    --seed_runs 20 --results $RESULTS
done

echo "=== summary ==="
python -m neurallaplacecontrol_tpu.results.summarize $RESULTS
echo "=== r2b matrix done ==="

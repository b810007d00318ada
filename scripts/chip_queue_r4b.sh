#!/bin/bash
# Round-4 chip queue, part B: the steps chip_queue_r4.sh never completed
# (the session running it died mid-queue), plus a bench re-run now that
# resolve_checkpoint() finds the tracked trained flagship (the first r4
# bench ran at random init because saved_models/ had been wiped).
# Steps are serialized — the single chip serializes concurrent processes
# and timing under contention lies (CLAUDE.md benchmarking gotchas).
#
# Usage: bash scripts/chip_queue_r4b.sh [artifacts_dir]
set -u
cd "$(dirname "$0")/.."
ART="${1:-artifacts}"
mkdir -p "$ART"

run() { # run <label> <timeout_s> <cmd...>
  local label="$1" t="$2"; shift 2
  echo "=== $label ===" >&2
  timeout "$t" "$@"
  echo "--- $label exit=$? ---" >&2
}

# 1. headline bench at the TRAINED flagship (first r4 capture was random-init)
run bench 1200 python bench.py | tee "$ART/bench_r4_queue.json"

# 2. on-chip autotune artifact at the reference operating point
run autotune 2400 python - <<'EOF' | tee "$ART/autotune_r4.json"
import json
import jax
from neurallaplacecontrol_tpu import tune
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.utils.checkpoint import (
    load_pytree, model_checkpoint_name, resolve_checkpoint)

base = Config()
spec = make_env("oderl-cartpole", dt=base.dt).spec
model = make_model("nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high, base)
params = load_pytree(
    resolve_checkpoint(model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True)),
    model.init(jax.random.PRNGKey(0)),
)
best, trials = tune.autotune(
    "nl", "oderl-cartpole", 1, base=base,
    candidates=[{}, {"nl_compute_dtype": "bfloat16"}, {"mppi_scan_unroll": 2}],
    model_apply=model.apply, params=params, seeds=(0, 1),
)
print(json.dumps({"best_overrides": [t for t in trials if t["best"]][0]["overrides"],
                  "trials": trials}))
EOF

# 3. real-chip test suite at HEAD (first r4 run failed on the wiped
# saved_models/; resolve_checkpoint now falls back to artifacts/checkpoints)
run tpu_tests 3600 env NLC_TPU_TESTS=1 python -m pytest tests -m tpu -q \
  2>&1 | tee "$ART/tpu_tests_r4.log"

# 4a. int8 planner: big-K throughput ladder vs f32/bf16 (+f32-fold control)
run int8_perf 3600 python scripts/bench_int8.py --mode perf \
  --ks 16384,65536,262144 --t 40 --iters 20 \
  | tee "$ART/bench_int8_perf_r4.jsonl"
# 4b. int8 quality at the FULL protocol (VERDICT r3 item 2) — 20 seeds,
# K=1000, T=40, trained flagship; reports the obs-saturation clip fraction
run int8_quality 7200 python scripts/bench_int8.py --mode quality \
  --k 1000 --t 40 --seeds 20 | tee "$ART/int8_quality_tpu_r4.json"

# 5. serving latency demo with native tick telemetry on the chip
run serve 2400 python scripts/serve_demo.py --ticks 300 \
  --ticklog "$ART/serve_ticks_r4.tlog" --ticklog_capacity 4096 \
  | tee "$ART/serve_demo_tpu_r4.json"

echo "queue-b done; artifacts in $ART" >&2

#!/bin/bash
# Round-3 chip-pending measurement queue. Run once the TPU tunnel is back
# (jax.devices() reachable). Each step is independent; serialize them — the
# single chip serializes concurrent processes and timing under contention
# lies (CLAUDE.md benchmarking gotchas).
#
# Usage: bash scripts/chip_queue_r3.sh [artifacts_dir]
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

# 1. headline bench (now records trained_checkpoint + MFU)
run bench 1200 python bench.py | tee "$ART/bench_r3_queue.json"

# 2. horizon-scan unroll verdict (PERF.md row is pending this measurement)
run unroll 2400 python scripts/bench_unroll.py --unrolls 1,2,4,8 \
  | tee "$ART/bench_unroll_r3.jsonl"

# 3. on-chip autotune artifact at the reference operating point
run autotune 2400 python - <<'EOF' | tee "$ART/autotune_r3.json"
import json
import jax
from neurallaplacecontrol_tpu import tune
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.utils.checkpoint import load_pytree, model_checkpoint_name

base = Config()
spec = make_env("oderl-cartpole", dt=base.dt).spec
model = make_model("nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high, base)
params = load_pytree(
    "saved_models/" + model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True),
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

# 4. real-chip test suite at HEAD (fused-kernel accuracy, serving witness)
run tpu_tests 3600 env NLC_TPU_TESTS=1 python -m pytest tests -m tpu -q \
  2>&1 | tee "$ART/tpu_tests_r3.log"

# 5. int8 planner experiment: big-K throughput vs f32/bf16 + on-chip quality
run int8_perf 3600 python scripts/bench_int8.py --mode perf \
  --ks 16384,65536,262144 --t 40 --iters 20 \
  | tee "$ART/bench_int8_perf_r3.jsonl"
run int8_quality 3600 python scripts/bench_int8.py --mode quality \
  --k 1000 --t 40 --seeds 4 | tee "$ART/int8_quality_tpu_r3.json"

# 6. serving latency demo with native tick telemetry on the chip
# (ring capacity bounds the checked-in artifact to ~128 KB)
run serve 2400 python scripts/serve_demo.py --ticks 300 \
  --ticklog "$ART/serve_ticks_r3.tlog" --ticklog_capacity 4096 \
  | tee "$ART/serve_demo_tpu_r3.json"

echo "queue done; artifacts in $ART" >&2

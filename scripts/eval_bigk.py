"""Big-K policy-eval artifact: NL cartpole d1 with K=16384 rollouts.

The regime the reference's wandb sweep contemplates (mppi_optim.yaml:12,
K up to 262144) driven through the standard evaluate_policy entry on one
chip — the planner peak-throughput operating point (see
artifacts/bench_scaling_r2.txt). On a multi-chip mesh the same eval runs
with the rollout batch sharded via evaluate_policy(shard_rollouts=True)
(exercised on the 8-virtual-device CPU mesh in tests/test_sharding.py).

Writes one JSONL record to artifacts/results_bigk.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.training import evaluate_policy, train_model  # noqa: E402


def main():
    cfg = Config()
    model, params, _ = train_model("nl", "oderl-cartpole", cfg, delay=1, retrain=False)
    r = evaluate_policy(
        "nl", "oderl-cartpole", 1, seeds=[0, 1], config=cfg,
        model_apply=model.apply, params=params, roll_outs=16384,
    )
    r["errored"] = False
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "results_bigk.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(json.dumps({k: r[k] for k in (
        "model_name", "env_name", "delay", "roll_outs", "total_reward",
        "mppi_rollouts_per_sec")}))


if __name__ == "__main__":
    main()

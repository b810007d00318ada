"""Big-K policy-eval artifact: NL cartpole d1 with K=16384 rollouts.

The regime the reference's wandb sweep contemplates (mppi_optim.yaml:12,
K up to 262144) driven through the standard evaluate_policy entry on one
chip — the planner peak-throughput operating point (see
artifacts/bench_scaling_r2.txt). On a multi-chip mesh the same eval runs
with the rollout batch sharded via evaluate_policy(shard_rollouts=True)
(exercised on the 8-virtual-device CPU mesh in tests/test_sharding.py).

Writes one JSONL record to artifacts/results_bigk.jsonl.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.training import evaluate_policy, train_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roll_outs", type=int, default=16384)
    # "bfloat16" sets the planner's big-K peak: 1.17x at K=16384, 1.58x at
    # K=65536, control quality at parity on the trained checkpoint
    # (artifacts/results_bigk_bf16_r3.jsonl)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    cfg = Config(nl_compute_dtype=args.dtype)
    model, params, _ = train_model("nl", "oderl-cartpole", Config(), delay=1, retrain=False)
    if args.dtype != "float32":
        # rebuild the model structure at the requested compute dtype; the
        # f32 checkpoint is interchangeable (tests/test_models.py)
        spec = make_env("oderl-cartpole", dt=cfg.dt).spec
        model = make_model(
            "nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high, cfg
        )
    r = evaluate_policy(
        "nl", "oderl-cartpole", 1, seeds=[0, 1], config=cfg,
        model_apply=model.apply, params=params, roll_outs=args.roll_outs,
    )
    r["nl_compute_dtype"] = args.dtype
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

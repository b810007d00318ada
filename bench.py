"""Headline benchmark: MPPI rollouts/sec with the flagship NL dynamics model
in the planning loop, on one real TPU chip.

One rollout = one K-sample trajectory candidate simulated over the full
T=40-step horizon (the reference workload: K=1000 rollouts per env step,
mppi_with_model.py:218-230 + config.py:52-53). The measured episodes run the
complete closed-loop protocol — 200 env steps, each containing a full MPPI
plan with 40 sequential batched-1000 NL forward passes — compiled as a
single on-device scan, through the same evaluate_policy entry point users
call (its timing AOT-compiles outside the measured region).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 10k rollouts/s north-star from BASELINE.md (the
reference publishes no throughput numbers; BASELINE.json "published": {}).
"""

import json

import jax

BASELINE_ROLLOUTS_PER_SEC = 10_000.0  # BASELINE.md north-star for one v5e


def main():
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy

    config = Config()
    env_name = "oderl-cartpole"
    spec = make_env(env_name, dt=config.dt).spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))

    # 8 episodes vmapped — the evaluation protocol's real operating point
    # (the experiment grid runs 20-seed batches); 2 episodes leave the chip
    # under-occupied and report launch latency, not throughput
    res = evaluate_policy(
        "nl", env_name, 1, seeds=list(range(8)), config=config,
        model_apply=model.apply, params=params,
    )
    rollouts_per_sec = res["mppi_rollouts_per_sec"]
    print(
        json.dumps(
            {
                "metric": "nl_mppi_rollouts_per_sec",
                "value": round(rollouts_per_sec, 1),
                "unit": "rollouts/s (K=1000,T=40 NL-dynamics MPPI, 8 vmapped full episodes)",
                "vs_baseline": round(rollouts_per_sec / BASELINE_ROLLOUTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""bf16-compute NL planner: speed + planning-accuracy measurement (r3).

Measures, on one real TPU chip at the headline bench operating point
(K=1000, T=40, 8 vmapped full 200-step episodes, trained cartpole-d1
checkpoint):

1. episode throughput with nl_compute_dtype float32 vs bfloat16 — the
   GRU+trunk matmul stack on the MXU in bf16, sphere/ILT in f32
   (models/nl.py);
2. the planning-accuracy cost: per-seed episode returns for both modes
   (MPPI's softmax cost ranking is noise-dominated, so bf16's ~0.4% median
   forward perturbation should be return-neutral).

Writes artifacts/bench_bf16_r3.json. Run ONLY with the chip otherwise idle
(CLAUDE.md: the single chip serializes concurrent processes).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402


def main():
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    env_name = "oderl-cartpole"
    seeds = list(range(8))
    out = {"device": str(jax.devices()[0]), "results": {}}
    params = None
    for mode in ("float32", "bfloat16"):
        config = Config(nl_compute_dtype=mode)
        spec = make_env(env_name, dt=config.dt).spec
        model = make_model("nl", env_name, spec.n_obs, spec.m,
                           spec.action_high, config)
        if params is None:
            params = load_pytree(
                resolve_checkpoint(
                    model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True)),
                model.init(jax.random.PRNGKey(0)))
        res = evaluate_policy(
            "nl", env_name, 1, seeds=seeds, config=config,
            model_apply=model.apply, params=params,
        )
        out["results"][mode] = {
            "rollouts_per_sec": res["mppi_rollouts_per_sec"],
            "total_reward": res["total_reward"],
            "total_reward_std": res["total_reward_std"],
            "total_rewards": [float(x) for x in res["total_rewards"]],
        }
        print(mode, out["results"][mode]["rollouts_per_sec"],
              out["results"][mode]["total_reward"], flush=True)
    f32, bf16 = out["results"]["float32"], out["results"]["bfloat16"]
    out["speedup"] = bf16["rollouts_per_sec"] / f32["rollouts_per_sec"]
    out["return_delta"] = bf16["total_reward"] - f32["total_reward"]
    with open(REPO / "artifacts" / "bench_bf16_r3.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"speedup": out["speedup"], "return_delta": out["return_delta"]}))


if __name__ == "__main__":
    main()

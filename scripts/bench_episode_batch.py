"""Probe: headline rollouts/s vs the number of vmapped evaluation episodes.

bench.py vmaps 8 full episodes; the experiment protocol evaluates 20 seeds
per cell (config.py:12). This measures whether the chip is still
under-occupied at 8 — if 16/20 episodes raise rollouts/s materially, the
headline operating point should move to the protocol's own 20.

    python scripts/bench_episode_batch.py [--counts 8,16,20]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="8,16,20")
    args = ap.parse_args()

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy

    config = Config()
    env_name = "oderl-cartpole"
    spec = make_env(env_name, dt=config.dt).spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))

    for n in [int(c) for c in args.counts.split(",")]:
        res = evaluate_policy(
            "nl", env_name, 1, seeds=list(range(n)), config=config,
            model_apply=model.apply, params=params,
        )
        print(
            f"episodes={n:3d}  {res['mppi_rollouts_per_sec']:12.0f} rollouts/s  "
            f"({res['episode_elapsed_time']:.3f} s wall)",
            flush=True,
        )


if __name__ == "__main__":
    main()

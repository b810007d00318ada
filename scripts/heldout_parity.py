"""Cross-model held-out MSE on the shared expert buffer — our side of the
baseline-parity evidence (VERDICT r2 item 1).

artifacts/baseline_parity/ref_train_ode.py trains the REFERENCE'S OWN
torch node / latent_ode code on our 1M-transition cartpole-d1 expert
buffer and reports one-step prediction MSE on 256 fixed held-out rows
(torch.randperm(N, seed=1234)[:256]). This script computes the IDENTICAL
metric for our trained JAX checkpoints, so the two plateau levels are
directly comparable:

    reference node      (9000 s, 798k iters):  heldout_mse = 0.076510
    reference latent_ode (7217 s, 67.5k iters): heldout_mse = 0.089250
    (artifacts/baseline_parity/ref_{node,latent_ode}_cartpole_d1.log)

For node/nl the metric is apply(s0, a0, ts) vs (sn - s0). For latent_ode
it is the planner-facing mean prediction over the same history windows the
reference's forward uses (s0 rows unfolded, window size = action buffer).

Usage: python scripts/heldout_parity.py [--ckpt_dir saved_models/]
Appends results to artifacts/baseline_parity/ours_cartpole_d1.log.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUF = (
    REPO / "offlinedata" / "replay_buffer_env-name-oderl-cartpole_delay-1_"
    "model-name-oracle_encode-obs-time-False_action-buffer-size-4_ts-grid-exp_"
    "random-action-noise-1.0_observation-noise-0.0_friction-False.npz"
)
OUT = REPO / "artifacts" / "baseline_parity" / "ours_cartpole_d1.log"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", type=str, default="saved_models/")
    ap.add_argument("--models", type=str, default="node,latent_ode,nl")
    args = ap.parse_args()

    import torch  # only for bit-identical randperm with the reference harness

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
    )

    d = np.load(BUF)
    s0, a0, sn, ts = d["s0"], d["a0"], d["sn"], d["ts"]
    N, absize = s0.shape[0], a0.shape[1]
    config = Config()
    spec = make_env("oderl-cartpole").spec

    out = open(OUT, "a", buffering=1)

    def log(msg):
        print(msg)
        out.write(msg + "\n")

    for model_name in args.models.split(","):
        ckpt = (
            REPO / args.ckpt_dir /
            model_checkpoint_name(model_name, "oderl-cartpole", 1, "exp", 0, True)
        )
        if not ckpt.is_file():
            log(f"# {model_name}: no checkpoint at {ckpt} — skipped")
            continue
        model = make_model(
            model_name, "oderl-cartpole", spec.n_obs, spec.m,
            spec.action_high, config, dtype=jnp.float32,
        )
        params = load_pytree(str(ckpt), model.init(jax.random.PRNGKey(0)))

        if model_name == "latent_ode":
            # the reference harness's exact windowing + index space
            current_a0 = a0[:, -1, :]
            n_rows = N - (absize - 1)
            g = torch.Generator().manual_seed(1234)
            idx = torch.randperm(n_rows, generator=g)[:256].numpy()
            win = np.stack([np.arange(i, i + absize) for i in idx])  # [256, A]
            hist_s = jnp.asarray(s0[win], jnp.float32)
            hist_a = jnp.asarray(current_a0[win], jnp.float32)
            bts = jnp.asarray(ts[idx], jnp.float32)
            target = sn[idx] - s0[idx + absize - 1]
            outs, _ = model.predict_diff(
                params, jax.random.PRNGKey(7), hist_s, hist_a, bts, n_samples=8
            )
            pred = np.asarray(outs.mean(0))[:, : spec.n_obs]
            errs = np.mean((pred - target) ** 2, axis=1)
        else:
            g = torch.Generator().manual_seed(1234)
            idx = torch.randperm(N, generator=g)[:256].numpy()
            pred = model.apply(
                params, jnp.asarray(s0[idx], jnp.float32),
                jnp.asarray(a0[idx], jnp.float32), jnp.asarray(ts[idx], jnp.float32),
            )
            errs = np.mean((np.asarray(pred) - (sn[idx] - s0[idx])) ** 2, axis=1)
        log(f"ours {model_name} ({args.ckpt_dir}): heldout_mse={float(np.mean(errs)):.6f} "
            f"over {len(errs)} samples")


if __name__ == "__main__":
    main()

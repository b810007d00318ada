"""Fused NL kernel real-TPU accuracy characterization (VERDICT r2 item 2).

VERDICT (measured, artifacts/pallas_accuracy_r3.json): the round-2
"max_rel_diff 6.4 -> 173 as B grows" was a measurement artifact, not a
kernel bug. Root cause, established by comparing BOTH f32 paths against an
f64 CPU ground truth:

1. the r2 bench used an UNTRAINED model whose pole-clipped Riemann-sphere
   phi puts outputs at magnitude ~2e4-4.5e4, so raw-output "relative"
   diffs were abs diffs of ~500 on 20k-scale values (~2.6%% actual);
2. the per-sample relative-error DISTRIBUTION is flat in B (q99.9: 2.9%%
   untrained, 4.9%% trained, at B=1000 and B=131072 alike) — the max-only
   statistic grew with B purely by sampling deeper tails;
3. the fused kernel is consistently CLOSER to f64 than the XLA path
   (trained params, max err vs f64: fused 0.077-0.186 vs XLA 0.12-0.41)
   — the folded normalizations/contour remove rounding steps.

The ~5%% q99.9 relative error of BOTH paths is f32 ILT conditioning
(inverse-stereographic amplification near phi ~ pi/2), the documented cost
of running the reference's float64 model (train_utils.py:267) in f32.

Original diagnosis procedure below; the compiled-mode accuracy contract is
enforced by tests/test_pallas_nl.py (NLC_TPU_TESTS=1, marker "tpu").

Method: compute an f64 CPU ground truth for the same params+inputs, then
measure BOTH f32 paths (XLA apply, fused Pallas kernel) against it on TPU.
If fused-vs-f64 ~ XLA-vs-f64, the kernel is faithful and the reported
fused-vs-XLA divergence is f32 conditioning (pole amplification in the
inverse stereographic map), not a kernel bug.

Run:  python scripts/tpu_pallas_accuracy.py cpu   (writes the f64 ref npz)
      python scripts/tpu_pallas_accuracy.py tpu   (prints the comparison)
"""
import json
import sys

import numpy as np

MODE = sys.argv[1]
BS = [1000, 16384, 131072]

import jax  # noqa: E402

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.utils.checkpoint import (  # noqa: E402
    load_pytree,
    model_checkpoint_name,
)

config = Config()
spec = make_env("oderl-cartpole").spec


def build(dtype):
    return make_model("nl", "oderl-cartpole", spec.n_obs, spec.m,
                      spec.action_high, config, dtype=dtype)


model32 = build(jnp.float32)
params32 = model32.init(jax.random.PRNGKey(0))
trained32 = load_pytree(
    "/root/repo/saved_models/"
    + model_checkpoint_name("nl", "oderl-cartpole", 1, "exp", 0, True), params32)
t = config.dt
key = jax.random.PRNGKey(5)


def inputs(B):
    obs = jax.random.normal(key, (B, spec.n_obs), jnp.float32)
    abuf = jax.random.uniform(jax.random.fold_in(key, 1), (B, 4, spec.m),
                              jnp.float32, minval=-3, maxval=3)
    ts = jnp.full((B, 1), t, jnp.float32)
    return obs, abuf, ts


if MODE == "cpu":
    model64 = build(jnp.float64)
    out = {}
    for tag, p in (("rand", params32), ("trained", trained32)):
        p64 = jax.tree.map(lambda x: x.astype(jnp.float64), p)
        for B in BS:
            obs, abuf, ts = inputs(B)
            ref = model64.apply(p64, obs.astype(jnp.float64),
                                abuf.astype(jnp.float64), ts.astype(jnp.float64))
            out[f"{tag}_{B}"] = np.asarray(ref)
    np.savez("/tmp/pallas_diag_ref.npz", **out)
    print("ref written")
else:
    refs = np.load("/tmp/pallas_diag_ref.npz")
    xla = jax.jit(model32.apply)
    report = []
    for tag, p in (("rand", params32), ("trained", trained32)):
        fused = jax.jit(model32.make_fused_planner_apply(p, t))
        for B in BS:
            obs, abuf, ts = inputs(B)
            ref = refs[f"{tag}_{B}"]
            a = np.asarray(xla(p, obs, abuf, ts))
            c = np.asarray(fused(p, obs, abuf, ts))
            mag = 1.0 + np.abs(ref).max(1)          # per-sample scale
            e_x = np.abs(a - ref).max(1)            # per-sample errors
            e_f = np.abs(c - ref).max(1)
            e_p = np.abs(c - a).max(1)
            i = int(np.argmax(e_p))
            rec = dict(
                params=tag, B=B,
                xla_vs_f64_max=float(e_x.max()),
                fused_vs_f64_max=float(e_f.max()),
                fused_vs_xla_max=float(e_p.max()),
                xla_rel_q999=float(np.quantile(e_x / mag, 0.999)),
                fused_rel_q999=float(np.quantile(e_f / mag, 0.999)),
                pair_rel_q999=float(np.quantile(e_p / mag, 0.999)),
                pair_rel_max=float((e_p / mag).max()),
                argmax_ref_mag=float(np.abs(ref[i]).max()),
                ref_mag_q50=float(np.quantile(np.abs(ref).max(1), 0.5)),
                ref_mag_max=float(np.abs(ref).max()),
            )
            report.append(rec)
            print(json.dumps(rec))
    with open("/root/repo/artifacts/pallas_accuracy_r3.json", "w") as f:
        json.dump(report, f, indent=1)

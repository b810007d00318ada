"""Ensemble-numerics root cause probe (VERDICT r3 item 6).

The delay-ensemble trainer (training/ensemble.py) is semantically but not
NUMERICALLY equivalent to per-delay train_model: after ~1e6 f32 updates the
vmapped trajectory is a different SGD draw, and one such draw was control-
dead (NL pendulum d3, artifacts/run_nl_d3_diag.log). This probe attacks the
proposed fixes head-on by measuring WHERE the trajectory divergence enters:

  A  individual training        (lax.scan over updates, one model)
  B  vmapped ensemble, D=2      (the current trainer's math)
  C  B + f64 optimizer state    (grads/adam moments/updates in f64,
                                 f32 params — the VERDICT's suggestion)
  D  B + Kahan-compensated      (f32 adam, compensated parameter
     parameter updates           accumulation)
  E  B with both delays fed the IDENTICAL data (isolates "extra ensemble
     member present" from "different data flowing through the batch")

Each variant runs the same NL model, same init, same per-step batches; we
report the relative parameter distance to A over the update count. If C/D
stay on A's trajectory, the fix is real and the trainer should adopt it;
if they diverge like B does, the perturbation enters through the vmapped
f32 forward/backward GEMM ordering — UPSTREAM of anything the optimizer
can compensate — and the negative verdict closes the item (full-f64
training would fix it but float64 is unsupported on the TPU deploy
target).

Usage: python scripts/ensemble_numerics_probe.py [--iters 3000] [--f64_all]
Prints one JSON line per checkpoint; tee into artifacts/.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
# x64 must be ON or the f64-optimizer variant's astype(float64) silently
# no-ops and C becomes bit-identical to B (first probe run's artifact)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from neurallaplacecontrol_tpu.config import Config  # noqa: E402
from neurallaplacecontrol_tpu.models import make_model  # noqa: E402
from neurallaplacecontrol_tpu.training.train import make_optimizer  # noqa: E402


def _f64_opt(optimizer):
    """Run the optimizer chain in float64 around f32 params/grads."""

    def to64(t):
        return jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), t)

    def init(params):
        return optimizer.init(to64(params))

    def update(grads, state, params=None):
        updates, state = optimizer.update(
            to64(grads), state, to64(params) if params is not None else None
        )
        return jax.tree_util.tree_map(lambda u: u.astype(jnp.float32), updates), state

    return optax.GradientTransformation(init, update)


def _kahan_apply(params, comp, updates):
    """Compensated params += updates (Kahan): carries the f32 rounding
    residual of every update in ``comp`` and re-injects it next step."""

    def one(p, c, u):
        y = u + c  # update plus carried residual
        t = p + y
        c_new = y - (t - p)  # what the f32 add dropped
        return t, c_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_c = treedef.flatten_up_to(comp)
    flat_u = treedef.flatten_up_to(updates)
    out = [one(p, c, u) for p, c, u in zip(flat_p, flat_c, flat_u)]
    return (
        jax.tree_util.tree_unflatten(treedef, [o[0] for o in out]),
        jax.tree_util.tree_unflatten(treedef, [o[1] for o in out]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--seg", type=int, default=250, help="report interval")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_data", type=int, default=4096)
    args = ap.parse_args()

    cfg = Config()
    model = make_model("nl", "oderl-pendulum", 3, 1, 2.0, cfg)
    params0 = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 9)

    def mkdata(k):
        # dtypes pinned to f32: under x64 the defaults would promote the whole
        # forward to f64 and hide exactly the f32 GEMM effect under test
        f = jnp.float32
        s0 = jax.random.normal(jax.random.fold_in(k, 0), (args.n_data, 3), f)
        a0 = jax.random.uniform(
            jax.random.fold_in(k, 1), (args.n_data, 4, 1), f, minval=-2.0, maxval=2.0
        )
        sn = s0 + 0.05 * jax.random.normal(jax.random.fold_in(k, 2), (args.n_data, 3), f)
        ts = jnp.full((args.n_data, 1), 0.05, f)
        return s0, a0, sn, ts

    data_d0 = mkdata(ks[0])
    data_d1 = mkdata(ks[1])
    batches = jax.random.randint(
        ks[2], (args.iters, args.batch), 0, args.n_data
    )

    def loss_fn(p, data, idx):
        s0, a0, sn, ts = data
        pred = model.apply(p, s0[idx], a0[idx], ts[idx])
        return jnp.mean((pred - (sn[idx] - s0[idx])) ** 2)

    # --- A: individual -----------------------------------------------------
    @jax.jit
    def seg_individual(params, opt_state, idx_seg):
        def update(carry, idx):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, data_d0, idx)
            u, o = optimizer.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (params, opt_state), losses = jax.lax.scan(update, (params, opt_state), idx_seg)
        return params, opt_state, losses

    # --- B/C/E: vmapped ensemble variants ----------------------------------
    def make_seg_ensemble(opt, same_data=False):
        d1 = data_d0 if same_data else data_d1

        def one(params, opt_state, data, idx_seg):
            def update(carry, idx):
                p, o = carry
                loss, g = jax.value_and_grad(loss_fn)(p, data, idx)
                u, o = opt.update(g, o, p)
                return (optax.apply_updates(p, u), o), loss

            (params, opt_state), losses = jax.lax.scan(
                update, (params, opt_state), idx_seg
            )
            return params, opt_state, losses

        vm = jax.vmap(one, in_axes=(0, 0, 0, None))

        @jax.jit
        def seg(params_e, opt_e, idx_seg):
            data_e = tuple(
                jnp.stack([a, b]) for a, b in zip(data_d0, d1)
            )
            return vm(params_e, opt_e, data_e, idx_seg)

        return seg

    # --- D: Kahan-compensated vmapped ensemble -----------------------------
    def make_seg_kahan():
        def one(params, comp, opt_state, data, idx_seg):
            def update(carry, idx):
                p, c, o = carry
                loss, g = jax.value_and_grad(loss_fn)(p, data, idx)
                u, o = optimizer.update(g, o, p)
                p, c = _kahan_apply(p, c, u)
                return (p, c, o), loss

            (params, comp, opt_state), losses = jax.lax.scan(
                update, (params, comp, opt_state), idx_seg
            )
            return params, comp, opt_state, losses

        vm = jax.vmap(one, in_axes=(0, 0, 0, 0, None))

        @jax.jit
        def seg(params_e, comp_e, opt_e, idx_seg):
            data_e = tuple(jnp.stack([a, b]) for a, b in zip(data_d0, data_d1))
            return vm(params_e, comp_e, opt_e, data_e, idx_seg)

        return seg

    def stack2(t):
        return jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), t)

    def slice0(t):
        return jax.tree_util.tree_map(lambda x: x[0], t)

    def rel_dist(a, b):
        num = sum(
            float(jnp.sum((x - y.astype(x.dtype)) ** 2))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )
        den = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(a))
        return (num / den) ** 0.5

    state = {
        "A": (params0, optimizer.init(params0)),
        "B": (stack2(params0), jax.vmap(optimizer.init)(stack2(params0))),
        "E": (stack2(params0), jax.vmap(optimizer.init)(stack2(params0))),
    }
    opt64 = _f64_opt(optimizer)
    state["C"] = (stack2(params0), jax.vmap(opt64.init)(stack2(params0)))
    comp0 = jax.tree_util.tree_map(jnp.zeros_like, stack2(params0))
    state["D"] = (stack2(params0), comp0, jax.vmap(optimizer.init)(stack2(params0)))

    seg_B = make_seg_ensemble(optimizer)
    seg_C = make_seg_ensemble(opt64)
    seg_E = make_seg_ensemble(optimizer, same_data=True)
    seg_D = make_seg_kahan()

    n_segs = args.iters // args.seg
    for s in range(n_segs):
        idx = batches[s * args.seg : (s + 1) * args.seg]
        pA, oA, lA = seg_individual(*state["A"], idx)
        state["A"] = (pA, oA)
        pB, oB, lB = seg_B(*state["B"], idx)
        state["B"] = (pB, oB)
        pC, oC, lC = seg_C(*state["C"], idx)
        state["C"] = (pC, oC)
        pD, cD, oD, lD = seg_D(*state["D"], idx)
        state["D"] = (pD, cD, oD)
        pE, oE, lE = seg_E(*state["E"], idx)
        state["E"] = (pE, oE)
        rec = {
            "iters": (s + 1) * args.seg,
            "loss_A": round(float(lA[-1]), 8),
            # d0 slice of each ensemble vs the individually-trained A
            "reldist_B": rel_dist(pA, slice0(pB)),
            "reldist_C_f64opt": rel_dist(pA, slice0(pC)),
            "reldist_D_kahan": rel_dist(pA, slice0(pD)),
            "reldist_E_samedata": rel_dist(pA, slice0(pE)),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

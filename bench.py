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
V5E_PEAK_BF16_FLOPS = 1.97e14  # one v5e chip, 197 TFLOP/s bf16 (public spec)
METRIC = "nl_mppi_rollouts_per_sec"
UNIT = "rollouts/s (K=1000,T=40 NL-dynamics MPPI, 8 vmapped full episodes)"


def nl_forward_flops_analytic(n_obs, m_act, *, terms=17, hidden=128, buf=4):
    """Analytic FLOPs for ONE NL forward (one sample, one query time),
    counting every matmul at 2 FLOPs/MAC, per the w_nl.py architecture:

    - reverse GRU, 2 layers, hidden h=hidden//2, over the buf=4 action
      window: per layer per step the 3 gates cost x@Wx (in x 3h) + h@Wh
      (h x 3h) MACs (w_nl.py:21-22)
    - encoder head Linear h -> 2 (w_nl.py:28-29)
    - Laplace rep MLP (2*terms + n+2) -> hidden -> hidden -> 2*terms*n
      with tanh activations (w_nl.py:32-63)
    - fourier-ILT combine: per (term, output-dim) one complex
      inverse-stereographic map + damped-trig accumulation (~10 FLOPs)

    Elementwise nonlinearities are omitted (<2% of the matmul count).
    """
    h = hidden // 2
    latent = n_obs + 2
    flops = 0
    in_dim = m_act
    for _ in range(2):  # GRU layers
        flops += 2 * buf * (in_dim * 3 * h + h * 3 * h)
        in_dim = h
    flops += 2 * h * 2  # encoder output head
    w_in = 2 * terms + latent
    flops += 2 * (w_in * hidden + hidden * hidden + hidden * 2 * terms * n_obs)
    flops += 10 * terms * n_obs  # ILT combine
    return flops


def nl_forward_flops(model, params, spec, config, batch=1000):
    """FLOPs per NL forward: XLA's own cost analysis of the jitted apply
    when the backend exposes it, else the analytic count (the two agree to
    ~10% — the difference is XLA counting the fused elementwise ops)."""
    import jax.numpy as jnp

    analytic = nl_forward_flops_analytic(
        spec.n_obs, spec.m, terms=config.nl_s_recon_terms,
        hidden=config.nl_hidden_units, buf=config.action_buffer_size,
    )
    try:
        obs = jnp.zeros((batch, spec.n_obs), jnp.float32)
        act = jnp.zeros((batch, config.action_buffer_size, spec.m), jnp.float32)
        ts = jnp.full((batch, 1), config.dt, jnp.float32)
        cost = jax.jit(model.apply).lower(params, obs, act, ts).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"]) / batch
        if flops > 0:
            return flops, "xla"
    except Exception:  # noqa: BLE001 — cost analysis is backend-dependent
        pass
    return float(analytic), "analytic"


def _probe_devices(budget_s: float = 560.0):
    """Touch the backend with a wall-clock bound.

    The axon TPU tunnel can be down for hours at a stretch; first device use
    then blocks indefinitely inside the plugin. The contract here is ONE
    JSON line no matter what, so probe on a daemon thread and emit an
    honest error record instead of hanging the driver.

    Budget: a COLD tunnel (first acquisition after idle) has been measured
    at 420 s wall for device init + first compile (artifacts/autotune_r4.json
    trial 0); the old 300 s budget produced a false "tunnel down" error
    right after such a cold start. 560 s clears the measured worst case
    with margin while still bounding a genuinely dead tunnel.
    """
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 — reported in the JSON line
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(budget_s)
    if "devices" in result:
        return
    import os

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": UNIT,
                "vs_baseline": 0.0,
                "error": result.get(
                    "error", f"device init exceeded {budget_s:.0f}s (TPU tunnel down?)"
                ),
            }
        ),
        flush=True,
    )
    os._exit(1)


def main():
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.training import evaluate_policy

    _probe_devices()
    config = Config()
    env_name = "oderl-cartpole"
    spec = make_env(env_name, dt=config.dt).spec
    model = make_model("nl", env_name, spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))
    # prefer the shipped trained checkpoint (saved_models/, the round-2
    # matrix flagship) — throughput is shape-determined either way, but the
    # headline then measures the ACTUAL deployed model in the loop. A
    # missing/corrupt checkpoint must not kill the bench, but it must not
    # pass silently either: the emitted JSON records which params ran.
    import os
    import sys

    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    # saved_models/ is gitignored; resolve_checkpoint falls back to the
    # tracked artifacts/checkpoints/ copy so a fresh clone benches the
    # actual trained flagship, not random init.
    ckpt = resolve_checkpoint(
        model_checkpoint_name("nl", env_name, 1, "exp", 0, True),
        repo_root=os.path.dirname(os.path.abspath(__file__)),
    )
    trained = False
    try:
        params = load_pytree(ckpt, params)
        trained = True
    except Exception as e:  # noqa: BLE001 — fall back to untrained params
        print(f"bench.py: using UNTRAINED params ({ckpt}: {e})", file=sys.stderr)

    # 8 episodes vmapped — the evaluation protocol's real operating point
    # (the experiment grid runs 20-seed batches); 2 episodes leave the chip
    # under-occupied and report launch latency, not throughput
    res = evaluate_policy(
        "nl", env_name, 1, seeds=list(range(8)), config=config,
        model_apply=model.apply, params=params,
    )
    rollouts_per_sec = res["mppi_rollouts_per_sec"]
    # MFU framing (VERDICT r2 item 7): one rollout = T sequential per-sample
    # NL forwards, so the sustained model-FLOP rate is rollouts/s * T *
    # FLOPs/forward. The workload is dispatch/latency-bound at the reference
    # K=1000 shape — artifacts/bench_scaling_r2.txt shows forwards/s still
    # scaling 25x from K=1000 to K=16384 — so a single-digit MFU here means
    # "small matmuls at low latency", not an unoptimized kernel.
    flops_fwd, flops_src = nl_forward_flops(model, params, spec, config)
    forwards_per_sec = rollouts_per_sec * config.mppi_time_steps
    mfu = flops_fwd * forwards_per_sec / V5E_PEAK_BF16_FLOPS

    # training-throughput regression gate (VERDICT r4 item 3): update
    # steps/s of the REAL jitted nl training segment (scan of 500 Adam
    # steps, batch 16, expert-replay shapes) — scripts/bench_train.py is
    # the full instrument; this is its nl point at the reference shape. A
    # failure here must not kill the headline line.
    train_steps_per_sec = None
    train_err = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from bench_train import bench_nl

        train_steps_per_sec, _ = bench_nl(config, rows=100_000, batch_size=16, segments=2)
    except Exception as e:  # noqa: BLE001 — reported in the JSON line
        train_err = repr(e)

    out = {
        "metric": METRIC,
        "value": round(rollouts_per_sec, 1),
        "unit": UNIT,
        "vs_baseline": round(rollouts_per_sec / BASELINE_ROLLOUTS_PER_SEC, 3),
        "nl_forward_flops": round(flops_fwd),
        "nl_forward_flops_source": flops_src,
        "nl_forwards_per_sec": round(forwards_per_sec),
        "mfu_vs_v5e_bf16_peak": round(mfu, 4),
        "trained_checkpoint": trained,
        "train_steps_per_sec": (
            round(train_steps_per_sec, 1) if train_steps_per_sec else None
        ),
    }
    if train_err:
        out["train_bench_error"] = train_err
    print(json.dumps(out))


if __name__ == "__main__":
    main()

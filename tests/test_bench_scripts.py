"""Smoke tests for the benchmark scripts' measurement plumbing.

These do NOT assert throughput (meaningless on the CPU test backend) — they
pin that the measurement harnesses run end-to-end, that the FLOP accounting
agrees between the analytic count and XLA's cost model at the reference
shape (w_nl.py:86-100: hidden 128, 17 terms, buffer 4), and that the MXU
sweep's chained-forward structure really produces finite, shape-correct
iterates at a non-default width/dtype.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_flops_analytic_matches_xla_cost_model():
    import bench

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model

    config = Config()
    spec = make_env("oderl-cartpole", dt=config.dt).spec
    model = make_model("nl", "oderl-cartpole", spec.n_obs, spec.m, spec.action_high, config)
    params = model.init(jax.random.PRNGKey(0))

    analytic = bench.nl_forward_flops_analytic(
        spec.n_obs, spec.m, terms=config.nl_s_recon_terms,
        hidden=config.nl_hidden_units, buf=config.action_buffer_size,
    )
    measured, src = bench.nl_forward_flops(model, params, spec, config, batch=64)
    assert measured > 0
    if src == "xla":
        # XLA counts the fused elementwise ops the analytic model omits;
        # the two must still agree on the order of magnitude and within ~35%
        assert 0.65 < measured / analytic < 1.5, (measured, analytic)
    else:  # backend without cost analysis: analytic fallback is exact
        assert measured == float(analytic)


def test_bench_train_measures_both_families():
    """bench_train's nl and latent_ode segment throughput harnesses run
    end-to-end at tiny shapes and report positive steps/s (the nl one is
    also bench.py's train_steps_per_sec regression gate)."""
    from scripts.bench_train import bench_latent_ode, bench_nl

    from neurallaplacecontrol_tpu.config import Config

    cfg = Config(training_batch_size=4, iters_per_log=5)
    for fn in (bench_nl, bench_latent_ode):
        steps_per_sec, seg_len = fn(cfg, rows=200, batch_size=4, segments=1)
        assert seg_len == 5
        assert np.isfinite(steps_per_sec) and steps_per_sec > 0


def test_mxu_sweep_measure_one_smoke():
    from scripts.bench_mxu_sweep import measure_one

    row = measure_one(
        "oderl-cartpole", hidden=32, dtype="bfloat16", batch=16, chain=3, reps=1
    )
    assert row["hidden"] == 32 and row["dtype"] == "bfloat16"
    assert row["params"] > 0
    assert row["flops_per_forward"] > 0
    assert np.isfinite(row["per_forward_us"]) and row["per_forward_us"] > 0
    assert row["forwards_per_sec"] > 0
    # MFU vs the dtype's own peak is a ratio in (0, 1] by construction on
    # real hardware; on the CPU test backend it is just positive & finite
    assert row["mfu_vs_dtype_peak"] >= 0
    assert row["mfu_vs_bf16_peak"] <= row["mfu_vs_dtype_peak"]

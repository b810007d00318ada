"""int8 NL quantization (ops/quant.py) — accuracy contracts on CPU.

The quantized forward is an experiment surface (not wired into Config);
these tests pin the properties the experiment relies on:
- the fold-only path (no int8 anywhere) is numerically the f32 apply;
- the GRU int8 path alone is near-lossless (analytic (-1,1) bounds);
- the full int8+fold forward stays within its measured error envelope on
  the SHIPPED trained checkpoint (never assert relative accuracy on
  untrained params — pole-scale outputs, see CLAUDE.md).
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

ENV = "oderl-cartpole"
DELAY = 1


@pytest.fixture(scope="module")
def flagship():
    import jax

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    cfg = Config()
    spec = make_env(ENV, dt=cfg.dt).spec
    model = make_model("nl", ENV, spec.n_obs, spec.m, spec.action_high, cfg)
    ckpt = pathlib.Path(
        resolve_checkpoint(model_checkpoint_name("nl", ENV, DELAY, "exp", 0, True))
    )
    if not ckpt.exists():
        pytest.skip("shipped flagship checkpoint not present")
    params = load_pytree(str(ckpt), model.init(jax.random.PRNGKey(0)))
    return cfg, spec, model, params


def _batch(rng, B):
    obs = (rng.normal(size=(B, 5)) * np.array([1.5, 6.0, 0.7, 0.7, 9.0])).astype(
        np.float32
    )
    acts = rng.uniform(-3.0, 3.0, size=(B, 4, 1)).astype(np.float32)
    return obs, acts


def test_fold_only_matches_f32_apply(flagship):
    """theta/phi folding is exact algebra: with quantization disabled the
    fold path reproduces model.apply at the folded horizon to f32 noise."""
    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for

    cfg, spec, model, params = flagship
    qa = quantized_apply_for(
        "nl", ENV, params, cfg, spec,
        quantize_gru=False, mlp_int8_layers=(), fold_t=float(cfg.dt),
    )
    rng = np.random.default_rng(0)
    obs, acts = _batch(rng, 512)
    ts = np.full((512, 1), cfg.dt, np.float32)
    ref = np.asarray(model.apply(params, obs, acts, ts))
    out = np.asarray(qa(None, obs, acts, ts))
    # tail tolerance: f32 association differences through the tanh/pole
    # regions; the bulk of the distribution is at f32 round-off (median)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-3)
    assert np.median(np.abs(out - ref)) < 1e-5


def test_gru_int8_near_lossless(flagship):
    """int8 on the GRU+encoder alone: median abs error < 1e-3 on trained
    weights (the analytic (-1,1) h-bounds give full int8 resolution)."""
    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for

    cfg, spec, model, params = flagship
    qa = quantized_apply_for(
        "nl", ENV, params, cfg, spec, quantize_gru=True, mlp_int8_layers=()
    )
    rng = np.random.default_rng(1)
    obs, acts = _batch(rng, 1024)
    ts = np.full((1024, 1), cfg.dt, np.float32)
    ref = np.asarray(model.apply(params, obs, acts, ts))
    out = np.asarray(qa(None, obs, acts, ts))
    err = np.abs(out - ref)
    assert np.median(err) < 1e-3, np.median(err)
    assert np.percentile(err, 99) < 2e-2, np.percentile(err, 99)


def test_full_int8_fold_error_envelope(flagship):
    """Full int8 (+fold) forward on the trained checkpoint: median abs
    error under 0.05 and under 10% of the output spread — the measured
    envelope the chip experiment (scripts/bench_int8.py) relies on."""
    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for

    cfg, spec, model, params = flagship
    qa = quantized_apply_for("nl", ENV, params, cfg, spec, fold_t=float(cfg.dt))
    rng = np.random.default_rng(2)
    obs, acts = _batch(rng, 4096)
    ts = np.full((4096, 1), cfg.dt, np.float32)
    ref = np.asarray(model.apply(params, obs, acts, ts))
    out = np.asarray(qa(None, obs, acts, ts))
    err = np.abs(out - ref)
    assert np.median(err) < 0.05, np.median(err)
    assert err.mean() / ref.std() < 0.10, err.mean() / ref.std()
    assert np.isfinite(out).all()


def test_int8_dot_hits_int32_accumulator():
    """The quantized matmul requests an int32 accumulator (the contract
    that lets XLA lower onto the MXU int8 path on TPU)."""
    import jax
    import jax.numpy as jnp

    from neurallaplacecontrol_tpu.ops.quant import _int8_matmul

    xq = jnp.ones((4, 8), jnp.int8)
    wq = jnp.ones((8, 3), jnp.int8)
    jaxpr = jax.make_jaxpr(
        lambda a, b: _int8_matmul(a, b, jnp.ones((3,), jnp.float32), 0.0)
    )(xq, wq)
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots and dots[0].params["preferred_element_type"] == jnp.int32


def test_int8_composes_with_k_sharded_planner(flagship):
    """The int8 apply runs under the K-sharded planner on the 8-device
    mesh (evaluate_policy(shard_rollouts=True)) — the multi-chip big-K
    regime is exactly where the int8 experiment targets deployment."""
    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for
    from neurallaplacecontrol_tpu.training.eval import evaluate_policy

    cfg, spec, model, params = flagship
    del model
    qapply = quantized_apply_for("nl", ENV, params, cfg, spec, fold_t=float(cfg.dt))
    res = evaluate_policy(
        "nl", ENV, DELAY, seeds=(0,), config=cfg,
        model_apply=qapply, params=params,
        roll_outs=64, time_steps=5, shard_rollouts=True,
    )
    assert np.isfinite(res["total_reward"]), res["total_reward"]


def test_int8_serving_controller_ticks(flagship):
    """The int8 apply drives the deployment Controller (serving.py):
    reset + 3 planner ticks produce finite in-range actions."""
    import jax
    import numpy as np

    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for
    from neurallaplacecontrol_tpu.serving import make_controller

    cfg, spec, model, params = flagship
    del model
    qapply = quantized_apply_for("nl", ENV, params, cfg, spec, fold_t=float(cfg.dt))
    ctrl = make_controller(
        "nl", ENV, DELAY, config=cfg, model_apply=qapply, params=params,
        roll_outs=64, time_steps=5,
    )
    state = ctrl.reset(jax.random.PRNGKey(0))
    obs = np.zeros((spec.n_obs,), np.float32)
    for _ in range(3):
        action, state = ctrl.step(state, obs)
        a = np.asarray(action)
        assert np.isfinite(a).all() and (np.abs(a) <= spec.action_high + 1e-6).all()


def test_quantized_apply_rejects_encode_obs_time(flagship):
    from dataclasses import replace

    from neurallaplacecontrol_tpu.ops.quant import quantized_apply_for

    cfg, spec, model, params = flagship
    del model
    with pytest.raises(AssertionError):
        quantized_apply_for(
            "nl", ENV, params, replace(cfg, encode_obs_time=True), spec
        )

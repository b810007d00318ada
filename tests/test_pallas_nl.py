"""Fully fused planner-path NL forward (ops.pallas_nl) vs the XLA apply.

Interpret mode on CPU; the compiled kernel is benchmarked on real TPU by
scripts/bench_pallas.py. Covers the weight-folding edge cases: multi-dim
actions (acrobot m=2), the un-normalized age channel (encode_obs_time),
and normalize=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.models import make_model


def _check(env_name, n, m, act_high, cfg, B=96, t=0.05, **model_kw):
    model = make_model("nl", env_name, n, m, act_high, cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    fused = model.make_fused_planner_apply(params, t)
    key = jax.random.PRNGKey(3)
    obs = jax.random.normal(key, (B, n), jnp.float32)
    in_dim = m + (1 if cfg.encode_obs_time else 0)
    abuf = jax.random.uniform(
        jax.random.fold_in(key, 1), (B, 4, in_dim), jnp.float32,
        minval=-act_high, maxval=act_high,
    )
    if cfg.encode_obs_time:
        # age channel is non-negative and ~dt-scale
        abuf = abuf.at[..., -1].set(jnp.abs(abuf[..., -1]) * 0.05)
    ts = jnp.full((B, 1), t, jnp.float32)
    expected = model.apply(params, obs, abuf, ts)
    with pltpu.force_tpu_interpret_mode():
        got = fused(params, obs, abuf, ts)
    rel = np.abs(np.asarray(got) - np.asarray(expected)) / (
        1.0 + np.abs(np.asarray(expected))
    )
    assert rel.max() < 1e-2, rel.max()


def test_fused_forward_acrobot_multidim_actions():
    _check("oderl-acrobot", 6, 2, 5.0, Config())


def test_fused_forward_pendulum():
    _check("oderl-pendulum", 3, 1, 2.0, Config())


def test_fused_forward_encode_obs_time():
    _check("oderl-cartpole", 5, 1, 3.0, Config(encode_obs_time=True))


def test_fused_planner_eval_path(tmp_path):
    """Config.fused_nl_planner routes evaluate_policy's NL dynamics through
    the fused kernel; a miniature episode must stay finite and track the
    XLA-path returns (interpret mode on CPU)."""
    import numpy as np

    from neurallaplacecontrol_tpu.training import evaluate_policy

    cfg = Config(dt=0.5)
    model = make_model("nl", "oderl-pendulum", 3, 1, 2.0, cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    kw = dict(seeds=[0], config=cfg.replace(fused_nl_planner=False),
              model_apply=model.apply, params=params, roll_outs=8, time_steps=3)
    ref = evaluate_policy("nl", "oderl-pendulum", 1, **kw)
    kw["config"] = cfg.replace(fused_nl_planner=True)
    with pltpu.force_tpu_interpret_mode():
        got = evaluate_policy("nl", "oderl-pendulum", 1, **kw)
    assert np.isfinite(got["total_reward"])
    # untrained model + chaotic env: same-sign, same-magnitude agreement
    assert abs(got["total_reward"] - ref["total_reward"]) < 0.35 * abs(ref["total_reward"]), (
        got["total_reward"], ref["total_reward"],
    )


def test_fused_forward_rejects_non_fourier():
    model = make_model(
        "nl", "oderl-cartpole", 5, 1, 3.0, Config(nl_ilt_algorithm="dehoog")
    )
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError):
        model.make_fused_planner_apply(params, 0.05)

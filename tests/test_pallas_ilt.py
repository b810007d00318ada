"""Fused Pallas NL-head kernel vs the XLA reference path.

Runs in Pallas interpret mode on CPU (the compiled kernel is exercised on
real TPU hardware by bench.py / scripts/bench_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.ops.ilt import ilt_combine
from neurallaplacecontrol_tpu.ops.pallas_ilt import (
    fourier_weights,
    nl_head_fused,
    pack_head_weights,
)
from neurallaplacecontrol_tpu.ops.sphere import spherical_to_complex


def _reference_head(x, w, b, state_dim, terms, t):
    """XLA path: linear -> reshape -> scaled tanh -> sphere -> ILT combine
    (mirrors models/nl.py rep_fn + ops.ilt)."""
    out = x @ w + b
    out = out.reshape(out.shape[0], 2 * state_dim, terms)
    theta = jnp.tanh(out[:, :state_dim, :]) * jnp.pi
    phi = jnp.tanh(out[:, state_dim:, :]) * (jnp.pi / 2.0)
    F = spherical_to_complex(theta, phi)
    tvec = jnp.full((x.shape[0],), t, dtype=jnp.float32)
    return ilt_combine(F, tvec, terms, "fourier")


@pytest.mark.parametrize("B", [16, 128, 300])
def test_fused_head_matches_xla(B):
    D, terms, H = 5, 17, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H), dtype=jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (H, 2 * D * terms), dtype=jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 2), (2 * D * terms,), dtype=jnp.float32) * 0.05
    t = 0.125

    expected = _reference_head(x, w, b, D, terms, t)
    packed = pack_head_weights(np.asarray(w), np.asarray(b), D, terms, t)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = nl_head_fused(x, packed, D)
    # f32 rounding near the sphere pole (r = cos phi / (1 - sin phi)) gives
    # rare ~0.2%-relative outliers between the fused and XLA orderings
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-2, atol=1e-2)


def test_fourier_weights_match_query_nodes():
    """Selection-matrix weights must reproduce ilt_combine for arbitrary F."""
    terms, t = 17, 0.2
    w_re, w_im, prefac = fourier_weights(t, terms)
    key = jax.random.PRNGKey(3)
    F = (
        jax.random.normal(key, (4, 3, terms))
        + 1j * jax.random.normal(jax.random.fold_in(key, 1), (4, 3, terms))
    ).astype(jnp.complex64)
    expected = ilt_combine(F, jnp.full((4,), t, jnp.float32), terms, "fourier")
    manual = prefac * (
        jnp.sum(jnp.real(F) * w_re, axis=-1) - jnp.sum(jnp.imag(F) * w_im, axis=-1)
    )
    np.testing.assert_allclose(np.asarray(manual), np.asarray(expected), rtol=1e-4)


def test_pack_respects_column_layout():
    """Column (d, t) of the original head must land at d*Tp + t."""
    D, terms, H = 2, 3, 4
    w = np.zeros((H, 2 * D * terms), np.float32)
    b = np.arange(2 * D * terms, dtype=np.float32)
    w[0, 1 * terms + 2] = 7.0  # theta, d=1, t=2
    w[0, (D + 1) * terms + 0] = 9.0  # phi, d=1, t=0
    w_theta, w_phi, b_theta, b_phi, _, _ = pack_head_weights(w, b, D, terms, 0.1)
    Tp = 32
    assert float(w_theta[0, 1 * Tp + 2]) == 7.0
    assert float(w_phi[0, 1 * Tp + 0]) == 9.0
    assert float(b_theta[0 * Tp + 1]) == b[1]
    assert float(b_phi[1 * Tp + 2]) == b[(D + 1) * terms + 2]


def test_fused_planner_apply_matches_model():
    """Full fused-planner forward (GRU + MLP + Pallas head) vs model.apply."""
    from jax.experimental.pallas import tpu as pltpu

    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.models import make_model, norm_stats_for

    model = make_model("nl", "oderl-cartpole", 5, 1, 3.0, Config(), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    t = 0.05
    fused = model.make_fused_planner_apply(params, t)
    B = 64
    key = jax.random.PRNGKey(7)
    obs = jax.random.normal(key, (B, 5), jnp.float32)
    abuf = jax.random.uniform(jax.random.fold_in(key, 1), (B, 4, 1), jnp.float32,
                              minval=-3, maxval=3)
    ts = jnp.full((B, 1), t, jnp.float32)
    expected = model.apply(params, obs, abuf, ts)
    with pltpu.force_tpu_interpret_mode():
        got = fused(params, obs, abuf, ts)
    rel = np.abs(np.asarray(got) - np.asarray(expected)) / (1.0 + np.abs(np.asarray(expected)))
    assert rel.max() < 1e-2, rel.max()

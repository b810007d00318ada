"""Standalone ODE-RNN / GRU-D sequence baselines, toy datasets, plotting.

Reference: latent_ode_lib extras (ode_rnn.py, rnn_baselines.py,
parse_datasets.py, plotting.py) — SURVEY.md §2.2.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neurallaplacecontrol_tpu.data.toy import (
    TOY_DATASETS,
    dde_ramp_loading_time_sol,
    sine,
    subsample_irregular,
)
from neurallaplacecontrol_tpu.models.seq_baselines import (
    make_classic_rnn,
    make_ode_rnn,
)
from neurallaplacecontrol_tpu.results.plotting import (
    plot_episode_returns,
    plot_trajectories,
)


def test_toy_datasets_shapes():
    for name, fn in TOY_DATASETS.items():
        traj, t = fn(5)
        assert traj.shape == (5, 200, 1)
        assert t.shape == (200,)
        assert np.all(np.isfinite(np.asarray(traj)))
    # dde solution is 0 before the ramp starts, positive after
    traj, t = dde_ramp_loading_time_sol(1)
    y = np.asarray(traj[0, :, 0])
    assert np.allclose(y[np.asarray(t) < 5], 0.0)
    assert y[-1] > 0.1


def test_subsample_irregular(key):
    traj, t = sine(3)
    sub, ts = subsample_irregular(key, traj, t, 40)
    assert sub.shape == (3, 40, 1) and ts.shape == (40,)
    assert np.all(np.diff(np.asarray(ts)) > 0)  # sorted, unique


@pytest.mark.parametrize("maker", [
    lambda: make_ode_rnn(1, latent_dim=8, n_gru_units=8, n_units=16, rhs_units=16),
    lambda: make_classic_rnn(1, latent_dim=16, cell="gru", n_units=16),
    lambda: make_classic_rnn(1, latent_dim=16, cell="expdecay", n_units=16),
])
def test_sequence_models_fit_sine(key, maker):
    """Each sequence model must reduce reconstruction MSE on the sine toy
    (the reference's smoke experiment for these baselines)."""
    model = maker()
    traj, t = sine(4, t_nsamples=60)
    traj = traj + 0.0  # f64 under conftest
    params = model.init(key)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    def loss_fn(p):
        pred = model.reconstruct(p, traj, t)
        return jnp.mean((pred - traj) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(60):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] / 3, (model.name, losses[0], losses[-1])
    h = model.encode(params, traj, t)
    assert h.shape[0] == 4 and np.all(np.isfinite(np.asarray(h)))


def test_expdecay_cell_responds_to_gaps(key):
    """The GRU-D decay must make the hidden state depend on the time gaps:
    same observations on different grids give different encodings."""
    model = make_classic_rnn(1, latent_dim=8, cell="expdecay")
    params = model.init(key)
    x = jax.random.normal(key, (2, 10, 1))
    h_dense = model.encode(params, x, jnp.linspace(0.1, 1.0, 10))
    h_sparse = model.encode(params, x, jnp.linspace(1.0, 10.0, 10))
    assert float(jnp.abs(h_dense - h_sparse).max()) > 1e-6


def test_plotting_outputs(tmp_path, key):
    traj, t = sine(2, t_nsamples=50)
    p1 = plot_trajectories(t, traj, traj * 0.9, path=str(tmp_path / "traj.png"))
    assert os.path.getsize(p1) > 2000
    records = [
        {"model_name": "nl", "delay": 0, "total_reward": -100.0},
        {"model_name": "nl", "delay": 0, "total_reward": -120.0},
        {"model_name": "random", "delay": 0, "total_reward": -600.0},
    ]
    p2 = plot_episode_returns(records, path=str(tmp_path / "ret.png"))
    assert os.path.getsize(p2) > 2000

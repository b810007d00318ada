"""Delay-ensemble trainer (training.ensemble): a 1-delay ensemble must
reproduce train_model's parameter trajectory exactly; a multi-delay ensemble
trains every delay and writes per-delay checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.training import train_model, train_model_ensemble


def _cfg(tmp_path, **kw):
    defaults = dict(
        train_with_expert_trajectories=False,
        train_samples_per_dim=4,
        iters_per_log=50,
        saved_models_path=str(tmp_path) + "/",
        training_epochs=3,
        learning_rate=1e-3,
        end_training_after_seconds=None,
    )
    defaults.update(kw)
    return Config(**defaults)


def test_single_delay_ensemble_matches_train_model(tmp_path):
    cfg = _cfg(tmp_path / "a")
    _, params_ref, res_ref = train_model(
        "rnn", "oderl-pendulum", cfg, delay=1, retrain=True, force_retrain=True
    )
    cfg2 = _cfg(tmp_path / "b")
    out = train_model_ensemble(
        "rnn", "oderl-pendulum", cfg2, delays=[1], force_retrain=True
    )
    _, params_ens, res_ens = out[1]
    for a, b in zip(
        jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(params_ens)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        res_ref["epoch_losses"], res_ens["epoch_losses"], rtol=1e-6
    )


@pytest.mark.parametrize("model_name", ["delta_t_rnn", "node"])
@pytest.mark.slow
def test_multi_delay_ensemble_trains_and_checkpoints(model_name, tmp_path):
    cfg = _cfg(tmp_path, training_epochs=4)
    delays = [0, 2]
    out = train_model_ensemble(
        model_name, "oderl-pendulum", cfg, delays=delays, force_retrain=True
    )
    assert set(out) == set(delays)
    files = os.listdir(tmp_path)
    for d, (model, params, res) in out.items():
        assert any(f"delay-{d}" in f and f.startswith(model_name) for f in files), files
        losses = res["epoch_losses"]
        assert losses[-1] < losses[0], losses
        assert np.isfinite(res["best_val_loss"])
        # per-delay params actually differ (different delay datasets)
    pa = jax.tree_util.tree_leaves(out[0][1])
    pb = jax.tree_util.tree_leaves(out[2][1])
    assert any(not np.allclose(a, b) for a, b in zip(pa, pb))
    # checkpoints load back through the train_model(retrain=False) path
    _, params_loaded, _ = train_model(
        model_name, "oderl-pendulum", cfg, delay=delays[0], retrain=False
    )
    assert jax.tree_util.tree_structure(params_loaded) == jax.tree_util.tree_structure(
        out[delays[0]][1]
    )


@pytest.mark.slow
def test_latent_ode_ensemble_smoke(tmp_path):
    cfg = _cfg(tmp_path, training_epochs=2, training_batch_size=8, iters_per_log=10)
    out = train_model_ensemble(
        "latent_ode", "oderl-pendulum", cfg, delays=[0, 1], force_retrain=True
    )
    for d in (0, 1):
        _, params, res = out[d]
        assert np.isfinite(res["best_val_loss"])
        assert all(np.isfinite(jnp.asarray(leaf)).all() for leaf in jax.tree_util.tree_leaves(params))

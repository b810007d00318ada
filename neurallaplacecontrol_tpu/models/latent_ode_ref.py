"""Reference-layout latent-ODE: the checkpoint-interop twin of models/latent_ode.

Our primary latent-ODE rebuild (models/latent_ode.py) deliberately deviates
from the vendored Rubanova stack (encoder hidden = latents, no mask channel,
per-row horizons), so reference ``.pt`` checkpoints cannot transplant into it.
This module is the faithful twin: the EXACT parameterization and planning
forward of reference `GeneralLatentODEOfficial` (w_latent_ode.py:22-227 +
baseline_models/latent_ode_lib/), so that
``interop.latent_ode_params_from_state_dict`` gives bit-faithful weight
transplant (tests/test_ref_weight_parity.py pins forward parity to f64
round-off, like the other four families).

Reference architecture (create_latent_ode_model.py:17-160, defaults from
w_latent_ode.py:55-66: units = gru_units = hidden_units, rec_dims = 20,
rec_layers = gen_layers = 1):

- encoder hidden state: ``rec_dims`` = 20 dims (NOT latents);
- encoder input: (obs_n ‖ act_n) with an all-ones mask CONCATENATED
  (latent_ode.py:64-66 ``truth_w_mask``), so GRU nets see 2·input_dim
  data channels;
- GRU_unit (encoder_decoder.py:22-103): three 2-layer nets
  (Linear(2·rec+2D, units), Tanh, Linear(units, ·)) for update (sigmoid),
  reset (sigmoid) and new-state (splits into mean/std, std abs'd);
- recognition ODE: create_net(rec, rec, 1 layer, units) = 3 Linears with
  tanh between (utils.py:300-308), integrated BACKWARD in time between
  observations with explicit Euler over a linspace grid of
  ``max(2, int(gap/min_step))`` points, ``min_step = interval/50``
  (encoder_decoder.py:252-310) — including the 0.01 pseudo-gap before the
  newest observation (``prev_t = t[-1] + 0.01``);
- transform_z0: Linear(2·rec, 100), Tanh, Linear(100, 2·latents), std abs;
- latents = state_dim + 2 (w_latent_ode.py:41-44);
- decoder: single Linear(latents, input_dim) (encoder_decoder.py:330-343).

The gen-ODE net (create_net(latents, latents, 1, units)) is CARRIED in the
pytree for lossless checkpoint round-trips but never evaluated: the
reference's planning AND training paths both hand ``odeint`` a single time
point (w_latent_ode.py:183-186 collapses ts_pred to one value; training
uses batch_size=1, train_utils.py:320-323), and torchdiffeq returns the
initial value for a 1-point grid — so the prediction is ``Decoder(z0)``,
independent of ts. ``apply`` here mirrors that faithfully: **ts is
ignored**, exactly as in the reference.

z0 is taken DETERMINISTICALLY at the posterior mean. The reference draws
one Gaussian sample at plan time (latent_ode.py:73-75); the mean is the
same predictor with the sampling noise removed, and the parity tests patch
the reference's sampler to the mean to compare like with like.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import DynamicsModel, NormStats
from .common import linear_apply, linear_init, mlp_apply_tanh, mlp_init

_ACTION_LATENT = 2  # w_latent_ode.py:41 action_encoder_latent_dim
_REC_DIMS = 20  # create_latent_ode_model.py:29 rec_dims default
_Z0_TF_UNITS = 100  # encoder_decoder.py:214 transform_z0 hidden width
_FIRST_GAP = 0.01  # encoder_decoder.py:263 prev_t = t[-1] + 0.01


def _encoder_substep_plan(times: np.ndarray) -> list:
    """Static backward-Euler substep plan of run_odernn
    (encoder_decoder.py:252-310) for the fixed observation grid ``times``.

    Returns [(obs_index, [h_0, h_1, ...]), ...] in processing order (newest
    observation first): before consuming observation i, evolve the hidden
    mean with explicit Euler steps of the listed (negative) sizes. All of
    this is host-side — the grid is static, so the whole plan unrolls into
    the jitted graph with no dynamic control flow.
    """
    A = len(times)
    interval = float(times[-1] - times[0])
    min_step = interval / 50.0
    plan = []
    prev_t = float(times[-1]) + _FIRST_GAP
    for i in reversed(range(A)):
        t_i = float(times[i])
        gap = prev_t - t_i
        # min_step == 0 when the grid has a single observation (interval 0,
        # e.g. action_buffer_size=1): degenerate to one explicit step — the
        # reference divides by zero here (encoder_decoder.py:276), so any
        # finite plan is beyond-reference behavior
        if min_step <= 0.0 or gap < min_step:
            # single explicit step of size (t_i - prev_t) (:265-267)
            steps = [t_i - prev_t]
        else:
            # euler over linspace(prev_t, t_i, n) -> n-1 equal steps (:276-280,
            # torch .int() truncates toward zero)
            n = max(2, int(gap / min_step))
            steps = [(t_i - prev_t) / (n - 1)] * (n - 1)
        plan.append((i, steps))
        prev_t = t_i
    return plan


def make_ref_latent_ode_model(
    state_dim: int,
    action_dim: int,
    norm: NormStats,
    hidden_units: int = 128,
    rec_dims: int = _REC_DIMS,
    action_buffer_size: int = 4,
    encode_obs_time: bool = False,
    normalize: bool = True,
    normalize_time: bool = True,
    dt: float = 0.05,
    dtype=jnp.float32,
) -> DynamicsModel:
    del encode_obs_time, normalize_time  # reference latent_ode has neither
    input_dim = state_dim + action_dim  # w_latent_ode.py:40
    latents = state_dim + _ACTION_LATENT  # w_latent_ode.py:42
    enc_in = 2 * input_dim  # data + all-ones mask

    state_mean = jnp.asarray(norm.state_mean, dtype)
    state_std = jnp.asarray(norm.state_std, dtype)
    action_mean = jnp.asarray(norm.action_mean, dtype)
    action_std = jnp.asarray(norm.action_std, dtype)

    times = np.arange(-(action_buffer_size - 1), 1, dtype=np.float64) * dt
    plan = _encoder_substep_plan(times)

    def init(key):
        ks = jax.random.split(key, 7)
        gate = [2 * rec_dims + enc_in, hidden_units]
        return {
            "rec_ode": mlp_init(
                ks[0], [rec_dims, hidden_units, hidden_units, rec_dims], dtype=dtype
            ),
            "gru": {
                "update": mlp_init(ks[1], gate + [rec_dims], dtype=dtype),
                "reset": mlp_init(ks[2], gate + [rec_dims], dtype=dtype),
                "state": mlp_init(ks[3], gate + [2 * rec_dims], dtype=dtype),
            },
            "transform_z0": mlp_init(
                ks[4], [2 * rec_dims, _Z0_TF_UNITS, 2 * latents], dtype=dtype
            ),
            "gen_ode": mlp_init(
                ks[5], [latents, hidden_units, hidden_units, latents], dtype=dtype
            ),
            "decoder": linear_init(ks[6], latents, input_dim, dtype=dtype),
        }

    def _gru_update(p, y_mean, y_std, x):
        """GRU_unit forward (encoder_decoder.py:67-103); the all-ones mask
        makes the masked_update branch a no-op, but the mask channels DO
        enter the gate nets as inputs (inside ``x``)."""
        concat = jnp.concatenate([y_mean, y_std, x], axis=-1)
        update = jax.nn.sigmoid(mlp_apply_tanh(p["update"], concat))
        reset = jax.nn.sigmoid(mlp_apply_tanh(p["reset"], concat))
        concat_r = jnp.concatenate([y_mean * reset, y_std * reset, x], axis=-1)
        new = mlp_apply_tanh(p["state"], concat_r)
        new_mean, new_std = new[..., :rec_dims], jnp.abs(new[..., rec_dims:])
        y_mean = (1.0 - update) * new_mean + update * y_mean
        y_std = jnp.abs((1.0 - update) * new_std + update * y_std)
        return y_mean, y_std

    def encode_z0(params, x):
        """run_odernn + transform_z0 over NORMALIZED windows ``x`` [B, A, D]
        (D = input_dim; the ones-mask is appended here). Returns
        (z0_mean, z0_std), each [B, latents]."""
        B = x.shape[0]
        xm = jnp.concatenate([x, jnp.ones_like(x)], axis=-1)  # truth_w_mask
        y_mean = jnp.zeros((B, rec_dims), dtype=x.dtype)
        y_std = jnp.zeros((B, rec_dims), dtype=x.dtype)
        for i, steps in plan:
            for h in steps:
                y_mean = y_mean + jnp.asarray(h, x.dtype) * mlp_apply_tanh(
                    params["rec_ode"], y_mean
                )
            y_mean, y_std = _gru_update(params["gru"], y_mean, y_std, xm[:, i])
        z = mlp_apply_tanh(
            params["transform_z0"], jnp.concatenate([y_mean, y_std], axis=-1)
        )
        return z[..., :latents], jnp.abs(z[..., latents:])

    def _normalize(obs, actions):
        if normalize:
            return (obs - state_mean) / state_std, (actions - action_mean) / action_std
        return obs, actions / 3.0

    def predict_diff(params, obs_hist, act_hist):
        """Deterministic reference planning forward: normalized history ->
        Decoder(z0_mean)[:state_dim] (w_latent_ode.py:145-199; ts plays no
        role — see module docstring). obs_hist [B, A, n], act_hist [B, A, m]
        RAW."""
        obs_n, act_n = _normalize(obs_hist, act_hist)
        z_mean, _ = encode_z0(params, jnp.concatenate([obs_n, act_n], axis=-1))
        return linear_apply(params["decoder"], z_mean)[..., :state_dim]

    def apply(params, obs, action_buffer, ts):
        """Uniform planner interface. ts is IGNORED (reference semantics).
        History is the tiled current observation; the reference instead
        warms a zeros-initialized rolling buffer over the first A ticks
        (w_latent_ode.py:160-172) — use latent_ode.make_carried_dynamics-
        style explicit history for trajectory-aware planning."""
        del ts
        A = action_buffer.shape[1]
        obs_hist = jnp.broadcast_to(obs[:, None, :], (obs.shape[0], A, obs.shape[1]))
        return predict_diff(params, obs_hist, action_buffer[..., :action_dim])

    model = DynamicsModel(name="latent_ode_ref", init=init, apply=apply)
    object.__setattr__(model, "encode_z0", encode_z0)
    object.__setattr__(model, "predict_diff", predict_diff)
    object.__setattr__(model, "state_dim", state_dim)
    object.__setattr__(model, "action_dim", action_dim)
    object.__setattr__(model, "latents", latents)
    object.__setattr__(model, "rec_dims", rec_dims)
    return model

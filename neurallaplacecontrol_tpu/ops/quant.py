"""int8-quantized NL planner forward (MXU int8 path experiment).

The measured perf ladder so far (PERF.md): f32 is dispatch/latency-bound at
the reference K=1000 shape; bf16 is parity there but 1.97x at K=65536 where
the planner turns MXU/HBM-bound. int8 is the next rung of the same ladder —
half of bf16's bytes and twice its MXU rate on v5e (394 TOPS int8 vs 197
TFLOP/s bf16) — and the NL network is unusually quantization-friendly:

- every recurrent/hidden activation is tanh/convex-combination bounded in
  (-1, 1), so activation scales are ANALYTIC (no calibration pass), exact,
  and static — no runtime max-reductions in the latency-critical chain;
- the planner feeds normalized actions bounded by action_high/std = 2
  (models/base.py norm_stats_for) and sphere angles bounded by pi;
- everything numerically delicate (normalization, theta/phi heads, the ILT
  damped-trig combine at reference w_nl.py:136-145 semantics) stays f32,
  exactly like the bf16 path (models/nl.py).

Scheme: symmetric int8, per-input-feature bounds folded into the weights
(so the quantized activation scale is uniformly 127), per-output-channel
weight scales, int8 x int8 -> int32 matmuls via
``preferred_element_type=int32`` (XLA lowers these onto the v5e MXU's int8
path). Out-of-bound activations saturate, as in any int8 pipeline.

This is an EXPERIMENT surface (scripts/bench_int8.py measures it on the
chip) — not wired into Config until a measured win exists; the measured-
verdict culture of this repo applies (see the Pallas and precompute flags
that stayed off).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np


def _quantize_matrix(w: jnp.ndarray, in_bounds: jnp.ndarray):
    """Fold per-input-feature bounds into ``w`` [in, out], then quantize
    per-output-channel. Returns (wq int8 [in, out], scale f32 [out]) with
    dequant ``(xq @ wq) * scale`` exact for xq = x/bound * 127."""
    w_folded = w * in_bounds[:, None]
    col_max = jnp.maximum(jnp.max(jnp.abs(w_folded), axis=0), 1e-30)
    wq = jnp.round(w_folded / col_max * 127.0).astype(jnp.int8)
    # scale folds both 1/127 factors (activation and weight grids)
    return wq, (col_max / (127.0 * 127.0)).astype(jnp.float32)


def _quantize_acts(x: jnp.ndarray, in_bounds: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(jnp.clip(x / in_bounds, -1.0, 1.0) * 127.0).astype(jnp.int8)


def _int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray, b):
    y = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * scale + b


def _q_linear(x: jnp.ndarray, in_bounds, wq, scale, b) -> jnp.ndarray:
    """Quantize-activations + int8 matmul, with NaN propagation.

    int8 casting of NaN would otherwise silently produce a finite value,
    letting a diverged rollout (f32 path: NaN poisons everything) return
    ordinary-looking outputs from the int8 path. The 0*sum term is NaN iff
    any input element is, and fuses into the quantization elementwise pass.
    """
    y = _int8_matmul(_quantize_acts(x, in_bounds), wq, scale, b)
    return y + 0.0 * jnp.sum(x, axis=-1, keepdims=True)


def _linear_l1_bounds(p: Mapping, in_bounds: jnp.ndarray) -> jnp.ndarray:
    """Per-output analytic bound |y_j| <= sum_i |w_ij| b_i + |b_j|."""
    return jnp.abs(p["w"]).T @ in_bounds + jnp.abs(p["b"])


def quantize_nl_params(
    params: Mapping,
    *,
    state_dim: int,
    action_dim: int,
    s_recon_terms: int,
    obs_bound: float | Sequence[float] = 6.0,
    action_bound: float = 2.0,
) -> dict:
    """Quantize a trained NL param pytree (models/nl.py layout) to int8.

    ``obs_bound``: bound on |normalized obs| per state channel (scalar or
    per-channel). 6 sigma covers the expert-data distribution; planner
    rollouts that exceed it saturate. ``action_bound``: bound on normalized
    actions — exactly 2.0 for every env (action_high / (action_high/2)).
    """
    obs_b = jnp.broadcast_to(jnp.asarray(obs_bound, jnp.float32), (state_dim,))
    gru_layers = []
    in_bounds = jnp.full((action_dim,), float(action_bound), jnp.float32)
    h_bounds = None
    for p in params["encoder"]["gru"]:
        hidden = p["w_hh"].shape[0]
        h_bounds = jnp.ones((hidden,), jnp.float32)  # |h| < 1 by GRU algebra
        wq_ih, s_ih = _quantize_matrix(jnp.asarray(p["w_ih"], jnp.float32), in_bounds)
        wq_hh, s_hh = _quantize_matrix(jnp.asarray(p["w_hh"], jnp.float32), h_bounds)
        gru_layers.append(
            {
                "wq_ih": wq_ih, "s_ih": s_ih,
                "b_ih": jnp.asarray(p["b_ih"], jnp.float32),
                "wq_hh": wq_hh, "s_hh": s_hh,
                "b_hh": jnp.asarray(p["b_hh"], jnp.float32),
                "in_bounds": in_bounds,
            }
        )
        in_bounds = h_bounds  # next layer consumes this layer's h
    out_p = {k: jnp.asarray(v, jnp.float32) for k, v in params["encoder"]["out"].items()}
    wq_out, s_out = _quantize_matrix(out_p["w"], h_bounds)
    p_action_bound = _linear_l1_bounds(out_p, h_bounds)  # analytic, exact

    # rep-MLP input = [theta_s (pi), phi_s (pi/2), obs_n, p_action]
    mlp_in_bounds = jnp.concatenate(
        [
            jnp.full((s_recon_terms,), np.pi, jnp.float32),
            jnp.full((s_recon_terms,), np.pi / 2.0, jnp.float32),
            obs_b,
            p_action_bound,
        ]
    )
    mlp_layers = []
    in_b = mlp_in_bounds
    for layer in params["laplace_rep"]:
        w = jnp.asarray(layer["w"], jnp.float32)
        wq, s = _quantize_matrix(w, in_b)
        mlp_layers.append(
            {
                "wq": wq, "s": s, "b": jnp.asarray(layer["b"], jnp.float32),
                "w": w, "in_bounds": in_b,  # f32 copy for mixed configs
            }
        )
        in_b = jnp.ones((w.shape[1],), jnp.float32)  # tanh-bounded hidden
    return {
        "gru": gru_layers,
        "gru_f32": [
            {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
            for p in params["encoder"]["gru"]
        ],
        "enc_out": {"wq": wq_out, "s": s_out, "b": out_p["b"], "in_bounds": h_bounds},
        "enc_out_f32": out_p,
        "mlp": mlp_layers,
        "mlp_in_bounds": mlp_in_bounds,
    }


def _gru_cell_q(p, h, x):
    from ..models.common import gru_gates

    gi = _q_linear(x, p["in_bounds"], p["wq_ih"], p["s_ih"], p["b_ih"])
    gh = _q_linear(h, 1.0, p["wq_hh"], p["s_hh"], p["b_hh"])  # |h| < 1
    return gru_gates(gi, gh, h)


def make_int8_nl_apply(
    qparams: dict,
    *,
    state_dim: int,
    action_dim: int,
    s_recon_terms: int,
    norm,
    ilt_algorithm: str = "fourier",
    normalize: bool = True,
    normalize_time: bool = True,
    dt: float = 0.05,
    quantize_gru: bool = True,
    mlp_int8_layers: Sequence[int] = (0, 1, 2),
    fold_t: float | None = None,
):
    """Signature-compatible replacement for model.apply with the matmul
    stack in int8 (params argument is ignored — the quantized weights are
    bound here, mirroring models/nl.py's make_fused_planner_apply contract).

    Semantics mirror models/nl.py apply() exactly (normalization at
    w_nl.py:119-129, query-horizon floor, [theta_s, phi_s, p] rep input,
    theta/phi tanh heads at w_nl.py:57-63) with every matmul quantized.
    encode_obs_time buffers are not supported (the raw age channel is
    unbounded; the flagship default is False, reference config.py:56).

    ``fold_t``: planner specialization — when every query shares one RAW
    horizon ``t`` (the planner's ts_pred is a constant dt vector,
    mppi_with_model.py:74), the sphere-angle block of the rep-MLP input is
    a batch constant and folds into layer 0's bias EXACTLY (the same fold
    as ops/pallas_nl.pack_nl_forward). This removes the dominant int8
    error term — the theta/phi features quantize at pi/127 resolution,
    which measured as ~16% median output error vs ~2-3% for everything
    else. The returned apply then IGNORES its ts argument (like
    make_fused_planner_apply); re-specialize for a different horizon.
    """
    from ..ops.ilt import laplace_reconstruct

    state_mean = jnp.asarray(norm.state_mean, jnp.float32)
    state_std = jnp.asarray(norm.state_std, jnp.float32)
    action_mean = jnp.asarray(norm.action_mean, jnp.float32)
    action_std = jnp.asarray(norm.action_std, jnp.float32)

    t_floor = 2.5e-3 if (normalize and normalize_time) else 2.5e-3 * dt * 8.0
    folded = None
    if fold_t is not None:
        assert ilt_algorithm == "fourier", "fold_t is fourier-only (like pack_nl_forward)"
        t_model = fold_t / (dt * 8.0) if (normalize and normalize_time) else fold_t
        t_model = max(float(t_model), t_floor)
        from ..ops.ilt import fourier_spherical_host

        th_s, ph_s = fourier_spherical_host(t_model, s_recon_terms)
        tp = jnp.asarray(np.concatenate([th_s, ph_s]), jnp.float32)  # [2*terms]
        l0 = qparams["mlp"][0]
        w0 = l0["w"]
        # exact fold: [tp, p] @ w0 + b0 == p @ w0[2T:] + (b0 + tp @ w0[:2T])
        w_p = w0[2 * s_recon_terms :, :]
        b_eff = l0["b"] + tp @ w0[: 2 * s_recon_terms, :]
        in_b_p = qparams["mlp_in_bounds"][2 * s_recon_terms :]
        wq_p, s_p = _quantize_matrix(w_p, in_b_p)
        folded = {
            "t_model": t_model,
            "wq": wq_p, "s": s_p, "b": b_eff, "w": w_p, "in_bounds": in_b_p,
        }

    def rep_fn(theta_s, phi_s, p):
        if folded is not None:
            if 0 in mlp_int8_layers:
                x = _q_linear(
                    p.astype(jnp.float32), folded["in_bounds"],
                    folded["wq"], folded["s"], folded["b"],
                )
            else:
                x = p.astype(jnp.float32) @ folded["w"] + folded["b"]
            x = jnp.tanh(x)
            layers = list(enumerate(qparams["mlp"]))[1:]
        else:
            x = jnp.concatenate([theta_s, phi_s, p], axis=-1).astype(jnp.float32)
            layers = list(enumerate(qparams["mlp"]))
        for i, layer in layers:
            if i in mlp_int8_layers:
                x = _q_linear(x, layer["in_bounds"], layer["wq"], layer["s"], layer["b"])
            else:
                x = x @ layer["w"] + layer["b"]
            if i < len(qparams["mlp"]) - 1:
                x = jnp.tanh(x)
        out = x.reshape(x.shape[:-1] + (2 * state_dim, s_recon_terms))
        theta = jnp.tanh(out[..., :state_dim, :]) * jnp.pi
        phi = jnp.tanh(out[..., state_dim:, :]) * (jnp.pi / 2.0)
        return theta, phi

    def apply(params_ignored, obs, action_buffer, ts):
        del params_ignored
        acts = (action_buffer - action_mean) / action_std if normalize \
            else action_buffer / 3.0
        if acts.ndim == 2:
            acts = acts[:, None, :]
        rev = jnp.flip(acts.astype(jnp.float32), axis=-2)
        B, T = rev.shape[0], rev.shape[1]
        hs = [jnp.zeros((B, p["wq_hh"].shape[0]), jnp.float32) for p in qparams["gru"]]
        if quantize_gru:
            for t in range(T):
                x = rev[:, t]
                for li, p in enumerate(qparams["gru"]):
                    hs[li] = _gru_cell_q(p, hs[li], x)
                    x = hs[li]
            eo = qparams["enc_out"]
            p_action = _q_linear(hs[-1], eo["in_bounds"], eo["wq"], eo["s"], eo["b"])
        else:
            from ..models.common import gru_apply, linear_apply

            h = gru_apply(qparams["gru_f32"], rev)
            p_action = linear_apply(qparams["enc_out_f32"], h)
        obs_n = ((obs - state_mean) / state_std if normalize else obs).astype(jnp.float32)
        if folded is not None:
            # planner specialization: ts is IGNORED, the fold's horizon rules
            ts = jnp.full((obs.shape[0],), folded["t_model"], jnp.float32)
        else:
            if normalize and normalize_time:
                ts = ts / (dt * 8.0)
            ts = jnp.maximum(ts, t_floor)
        p = jnp.concatenate([obs_n, p_action], axis=-1)
        return laplace_reconstruct(
            rep_fn, p, ts, recon_dim=state_dim,
            algorithm=ilt_algorithm, terms=s_recon_terms,
        )

    return apply


def planner_saturation_probe(
    apply_fn,
    params,
    norm,
    obs0: jnp.ndarray,
    *,
    action_high,
    action_dim: int,
    K: int,
    T: int,
    key,
    dt: float,
    action_buffer_size: int = 4,
    obs_bound: float | Sequence[float] = 6.0,
):
    """Measure how often planner-rollout observations exceed ``obs_bound``.

    The int8 path saturates normalized obs at ``obs_bound`` (quantize_nl_params)
    — silently, by design of any int8 grid. Diverged planner rollouts are
    exactly the ones MPPI should be penalizing, so a high clipped fraction
    is the observable precursor of an int8 quality regression (advisor
    round-3 finding). This probe mirrors the planner's rollout structure
    (mppi_delay: sliding action windows over ``concat([hist, actions])``,
    state' = state + apply(state, window, dt)) under uniform random actions
    in [-action_high, action_high] — an upper-bound excitation comparable to
    MPPI's exploration noise — and reports the fraction of |obs_n| >
    obs_bound per horizon step.

    Returns dict with per-step clipped fractions (list, len T) and their
    mean/max. Pass the F32 apply: saturation must be measured on the
    un-clipped dynamics the int8 path approximates.
    """
    import jax

    state_mean = jnp.asarray(norm.state_mean, jnp.float32)
    state_std = jnp.asarray(norm.state_std, jnp.float32)
    obs_b = jnp.broadcast_to(
        jnp.asarray(obs_bound, jnp.float32), (obs0.shape[-1],)
    )
    a_high = jnp.broadcast_to(jnp.asarray(action_high, jnp.float32), (action_dim,))
    acts = jax.random.uniform(
        key, (K, T, action_dim), jnp.float32, minval=-1.0, maxval=1.0
    ) * a_high
    hist = jnp.zeros((K, action_buffer_size - 1, action_dim), jnp.float32)
    full = jnp.concatenate([hist, acts], axis=1)  # [K, A-1+T, nu]
    state0 = jnp.broadcast_to(obs0.astype(jnp.float32), (K,) + obs0.shape[-1:])

    def step(state, t):
        window = jax.lax.dynamic_slice_in_dim(full, t, action_buffer_size, axis=1)
        ts_pred = jnp.full((K, 1), dt, jnp.float32)
        nxt = state + apply_fn(params, state, window, ts_pred)
        obs_n = (nxt - state_mean) / state_std
        frac = jnp.mean((jnp.abs(obs_n) > obs_b).astype(jnp.float32))
        return nxt, frac

    _, fracs = jax.lax.scan(step, state0, jnp.arange(T))
    fracs = [float(f) for f in fracs]
    return {
        "obs_bound": [float(b) for b in obs_b],
        "clip_frac_per_step": [round(f, 6) for f in fracs],
        "clip_frac_mean": round(float(np.mean(fracs)), 6),
        "clip_frac_max": round(float(np.max(fracs)), 6),
    }


def quantized_apply_for(
    model_name: str, env_name: str, params, config, spec,
    quantize_gru: bool = True, mlp_int8_layers: Sequence[int] = (0, 1, 2),
    fold_t: float | None = None,
):
    """Convenience: quantize a trained flagship and return its int8 apply.

    Mirrors models.make_model's NL wiring (hidden/terms/normalize flags from
    Config) so callers can do
    ``evaluate_policy(..., model_apply=quantized_apply_for(...), params=params)``.
    """
    assert model_name == "nl", "int8 path is NL-only"
    assert not config.encode_obs_time, (
        "int8 path does not support encode_obs_time (unbounded age channel)"
    )
    from ..config import snap_cme_terms
    from ..models.base import norm_stats_for
    from ..ops.ilt import effective_terms

    terms = config.nl_s_recon_terms
    if config.nl_ilt_algorithm == "cme":
        terms = snap_cme_terms(terms)
    terms = effective_terms(terms, config.nl_ilt_algorithm)
    norm = norm_stats_for(env_name, spec.action_high, spec.m)
    q = quantize_nl_params(
        params, state_dim=spec.n_obs, action_dim=spec.m, s_recon_terms=terms
    )
    return make_int8_nl_apply(
        q,
        state_dim=spec.n_obs,
        action_dim=spec.m,
        s_recon_terms=terms,
        norm=norm,
        ilt_algorithm=config.nl_ilt_algorithm,
        normalize=config.normalize,
        normalize_time=config.normalize_time,
        dt=config.dt,
        quantize_gru=quantize_gru,
        mlp_int8_layers=mlp_int8_layers,
        fold_t=fold_t,
    )

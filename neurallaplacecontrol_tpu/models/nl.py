"""Neural Laplace dynamics model (the flagship).

Architecture per reference w_nl.py:
- ReverseGRUEncoder (:14-29): the action buffer is flipped along time and
  run through a 2-layer GRU (hidden = nl_hidden_units//2 = 64), last hidden
  state -> Linear -> 2-dim action latent.
- LaplaceRepresentationFunc (:32-63): MLP (2*terms + latent) -> hidden ->
  hidden -> 2*terms*out_dim with tanh activations; outputs split into
  Riemann-sphere angles theta in (-pi, pi), phi in (-pi/2, pi/2) via scaled
  tanh.
- forward (:117-145): normalize state/action (time by dt*8), encode actions,
  p = concat(obs, action_latent), reconstruct the state-diff through the ILT
  (ops.ilt.laplace_reconstruct, default algorithm 'fourier', 17 terms).

TPU notes: the whole forward is one fused jit region — two GRU scans over a
4-long buffer, one MLP over [B, 2*terms+latent], and the ILT combine (a
[B, D, terms] weighted reduction; see ops.pallas_ilt for the hand-fused
variant). bfloat16-friendly: all matmuls hit the MXU; the ILT runs in f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import snap_cme_terms
from ..ops.ilt import effective_terms, laplace_reconstruct
from .base import DynamicsModel, NormStats
from .common import gru_apply, gru_init, linear_apply, linear_init, mlp_apply_tanh, mlp_init

_ACTION_LATENT = 2  # w_nl.py:89


def make_nl_model(
    state_dim: int,
    action_dim: int,
    norm: NormStats,
    hidden_units: int = 128,
    s_recon_terms: int = 17,
    ilt_algorithm: str = "fourier",
    encode_obs_time: bool = False,
    normalize: bool = True,
    normalize_time: bool = True,
    dt: float = 0.05,
    dtype=jnp.float32,
    compute_dtype: str = "float32",
) -> DynamicsModel:
    if ilt_algorithm == "cme":
        s_recon_terms = snap_cme_terms(s_recon_terms)  # w_nl.py:86-88
    # every algorithm's true node count (stehfest/euler/dehoog round
    # internally); the MLP head is sized from this, so it must match the
    # query-point count exactly
    s_recon_terms = effective_terms(s_recon_terms, ilt_algorithm)
    laplace_latent_dim = state_dim + _ACTION_LATENT  # w_nl.py:90
    gru_in = action_dim + (1 if encode_obs_time else 0)
    gru_hidden = hidden_units // 2

    state_mean = jnp.asarray(norm.state_mean, dtype)
    state_std = jnp.asarray(norm.state_std, dtype)
    action_mean = jnp.asarray(norm.action_mean, dtype)
    action_std = jnp.asarray(norm.action_std, dtype)

    def init(key):
        k_gru, k_enc_out, k_mlp = jax.random.split(key, 3)
        return {
            "encoder": {
                "gru": gru_init(k_gru, gru_in, gru_hidden, num_layers=2, dtype=dtype),
                "out": linear_init(k_enc_out, gru_hidden, _ACTION_LATENT, dtype=dtype),
            },
            "laplace_rep": mlp_init(
                k_mlp,
                [
                    s_recon_terms * 2 + laplace_latent_dim,
                    hidden_units,
                    hidden_units,
                    s_recon_terms * 2 * state_dim,
                ],
                dtype=dtype,
            ),
        }

    # mixed precision: run the matmul stack (GRU + trunk MLP) in bf16 on
    # the MXU while everything numerically delicate — normalization, the
    # bounded sphere angles, and the ILT's damped trig combine — stays
    # f32. tanh keeps the bf16 activations in (-1, 1) so the only hit is
    # ~3 fewer mantissa bits inside the network, which MPPI's
    # noise-dominated cost ranking does not resolve (tests pin this).
    _cdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]

    def _compute_cast(tree):
        if _cdtype == jnp.float32:
            return tree
        return jax.tree.map(lambda x: x.astype(_cdtype), tree)

    def rep_fn(params, theta_s, phi_s, p):
        """(theta_s, phi_s)[B,terms] + p[B,L] -> sphere angles [B,D,terms]."""
        x = jnp.concatenate([theta_s, phi_s, p], axis=-1)
        out = mlp_apply_tanh(_compute_cast(params), _compute_cast(x))
        out = out.astype(jnp.float32) if _cdtype != jnp.float32 else out
        out = out.reshape(out.shape[:-1] + (2 * state_dim, s_recon_terms))
        theta = jnp.tanh(out[..., :state_dim, :]) * jnp.pi  # (-pi, pi)
        phi = jnp.tanh(out[..., state_dim:, :]) * (jnp.pi / 2.0)  # (-pi/2, pi/2)
        return theta, phi

    def _norm_actions(action_buffer):
        # normalize only the action channels; a time-age channel
        # (encode_obs_time) passes through raw — broadcasting the (m,)
        # stats against an (m+1)-wide buffer would crash for m > 1
        acts = action_buffer[..., :action_dim]
        acts = (acts - action_mean) / action_std if normalize else acts / 3.0
        return jnp.concatenate([acts, action_buffer[..., action_dim:]], axis=-1)

    def _encode_actions(params, action_buffer, out_dtype):
        """Reverse-GRU action encoding (w_nl.py:25-29): normalize, flip
        time, 2-layer GRU, linear head -> [..., 2] action latent. Works on
        any leading batch shape (extra leading dims are flattened into the
        GRU batch and restored) — the planner pre-encodes [K, T] windows
        through the SAME ops as the per-call [B] path, so the two are
        numerically identical up to GEMM batching."""
        act_n = _norm_actions(action_buffer)
        if act_n.ndim == 2:
            act_n = act_n[:, None, :]
        lead = act_n.shape[:-2]
        rev = _compute_cast(jnp.flip(act_n, axis=-2))
        rev = rev.reshape((-1,) + rev.shape[-2:])
        enc = _compute_cast(params["encoder"])
        h = gru_apply(enc["gru"], rev)
        p_action = linear_apply(enc["out"], h).astype(out_dtype)
        return p_action.reshape(lead + (_ACTION_LATENT,))

    def _decode(params, obs, p_action, ts):
        """Laplace-side forward given a pre-encoded action latent."""
        if normalize:
            obs_n = (obs - state_mean) / state_std
            if normalize_time:
                ts = ts / (dt * 8.0)  # w_nl.py:123
        else:
            obs_n = obs  # w_nl.py:129
        # f32/TPU stability: exp-sampled horizons can be arbitrarily small
        # and the fourier contour's e^{sigma t}/T prefactor grows like 1/t.
        # Floor the (normalized) query time; affected samples (~2% of an
        # exp(dt) grid) have near-zero targets anyway. The reference relies
        # on float64 here instead.
        # floor in the units ts has HERE: it was divided by dt*8 only when
        # (normalize and normalize_time) — same condition as the fused path
        ts = jnp.maximum(
            ts, 2.5e-3 if (normalize and normalize_time) else 2.5e-3 * dt * 8.0
        )
        p = jnp.concatenate([obs_n, p_action.astype(obs_n.dtype)], axis=-1)
        return laplace_reconstruct(
            partial(rep_fn, params["laplace_rep"]),
            p,
            ts,
            recon_dim=state_dim,
            algorithm=ilt_algorithm,
            terms=s_recon_terms,
        )

    def apply(params, obs, action_buffer, ts):
        """obs [B,n], action_buffer [B,A,m(+t)], ts [B,1] or [B] -> [B,n]."""
        p_action = _encode_actions(params, action_buffer, obs.dtype)
        return _decode(params, obs, p_action, ts)

    model = DynamicsModel(name="nl", init=init, apply=apply)

    def make_planner_window_encoder(params):
        """Planner hook (planners.mppi_delay window_encoder): encode all
        K x T candidate action windows in ONE batched reverse-GRU call
        before the horizon scan. Valid because the NL window encoding is
        state-independent (w_nl.py:117-127: the GRU sees only the action
        window), so hoisting it out of the sequential rollout changes
        nothing semantically — it removes ~2 layers x A steps of small
        GEMMs from the latency-critical chain per horizon step. Measured
        verdict on v5e: the hoisted batch's HBM traffic outweighs the
        chain shortening at every tested width — default OFF
        (artifacts/bench_precompute_r3.json)."""

        def encode(windows):  # [K, T, A, m(+age)] -> [K, T, 2]
            # out dtype follows the input like apply() does (obs.dtype), so
            # the apply == apply_encoded identity holds under jax_enable_x64
            return _encode_actions(params, windows, windows.dtype)

        return encode

    def apply_encoded(params, obs, p_action, ts):
        """model.apply with the action latent precomputed (see
        make_planner_window_encoder); apply(params, o, w, ts) ==
        apply_encoded(params, o, encode(w), ts) by construction."""
        return _decode(params, obs, p_action, ts)

    object.__setattr__(model, "make_planner_window_encoder", make_planner_window_encoder)
    object.__setattr__(model, "apply_encoded", apply_encoded)

    def make_fused_planner_apply(params, t: float):
        """Planner-specialized forward as ONE fused Pallas kernel
        (ops.pallas_nl): reverse-GRU + encoder head + trunk MLP + theta/phi
        head + Fourier-ILT combine, entirely VMEM-resident per batch tile.
        Valid when every query shares one horizon ``t`` (the planner's
        ts_pred is a constant dt vector, mppi_with_model.py:74) and only for
        ilt_algorithm='fourier'. Normalizations and the fixed contour are
        folded into the packed weights, so the kernel consumes RAW obs and
        action buffers — the planner-loop forward is a single device op
        instead of ~15 (see scripts/bench_pallas.py for measurements).
        """
        from ..ops.pallas_nl import nl_forward_fused, pack_nl_forward

        assert ilt_algorithm == "fourier", "fused planner path is fourier-only"
        t_model = t / (dt * 8.0) if (normalize and normalize_time) else t
        # mirror apply's floor exactly (line 114): normalized time floors at
        # 2.5e-3, un-normalized time at 2.5e-3*dt*8 — keeps the fused and
        # XLA paths identical for normalize_time=False configs too
        t_floor = 2.5e-3 if (normalize and normalize_time) else 2.5e-3 * dt * 8.0
        t_model = max(t_model, t_floor)
        in_dim = gru_in
        packed = pack_nl_forward(
            params, t_model, state_dim, action_dim, s_recon_terms,
            state_mean, state_std, action_mean, action_std,
            normalize=normalize, encode_obs_time=encode_obs_time,
        )

        def apply_fused(p_ignored, obs, action_buffer, ts):
            """Signature-compatible with model.apply, but the ENTIRE
            parameter set is bound (packed) at specialization time — the
            first argument is ignored so updated params can never silently
            mix with the frozen packed weights (re-specialize after a
            parameter update instead)."""
            del p_ignored, ts  # fixed at specialization time
            B, A = action_buffer.shape[0], action_buffer.shape[1]
            acts_flat = action_buffer.reshape(B, A * in_dim)
            return nl_forward_fused(obs, acts_flat, packed, state_dim, in_dim)

        return apply_fused

    object.__setattr__(model, "make_fused_planner_apply", make_fused_planner_apply)
    return model

"""Fully fused Pallas TPU kernel for the planner-path NL forward.

The planner calls the NL dynamics model T_horizon x n_steps times per
episode at batch K with ONE shared query horizon t (ts_pred is a constant
dt vector, reference mppi_with_model.py:74). As separate XLA ops the
forward is ~15 small matmuls (8 GRU gate products over the 4-step action
buffer, the encoder head, 2 trunk layers, and the 4 head/ILT products) —
each its own HLO with [K, ~200] activations round-tripping HBM, so at
K~10^3 the planner loop is op-launch/latency bound, not FLOP bound.

This kernel runs the ENTIRE forward per 128-row batch tile in one
``pallas_call``, everything VMEM-resident:

    reverse-GRU (2 layers, unrolled over the A=4 buffer)        (MXU+VPU)
    encoder linear -> action latent                              (MXU)
    trunk MLP (2 tanh layers)                                    (MXU+VPU)
    theta/phi head + inverse stereographic map + Fourier-ILT     (MXU+VPU)

All normalizations and the fixed-contour query angles are folded into the
weights at pack time (``pack_nl_forward``):

- action normalization (a - mu)/sigma -> row-scaled w_ih / shifted b_ih of
  GRU layer 1 (the raw action buffer is the kernel input),
- state normalization -> row-scaled trunk W1 obs-rows / shifted b1,
- the (theta_s, phi_s) contour coordinates of the shared t -> extra b1
  shift (they multiply constant trunk rows),
- the per-term Fourier combine weights and e^{sigma t}/T prefactor -> the
  head selection matrices (ops.pallas_ilt.pack_head_weights).

The buffer flip (w_nl.py:27) becomes iterating the buffer newest-to-oldest
inside the kernel. Validated against models.nl's XLA apply in
tests/test_pallas_nl.py (interpret mode); benchmarked on real TPU by
scripts/bench_pallas.py.

MEASURED VERDICT (v5e, artifacts/bench_pallas_r2.json): the fusion wins
only where host dispatch dominates — standalone forward calls at B=1000
run 1.48x faster (573us vs 847us, one launch instead of ~15). Inside the
compiled planner scan, where XLA already elides dispatch and pipelines
the small ops across the batch, XLA is FASTER at every K (fused/XLA plan
time: 0.63x at K=1000, 0.50x at K=16384, 0.93x at K=65536): one
grid-sequential kernel serializes matmuls the XLA scheduler overlaps.
Config.fused_nl_planner therefore stays default-False; the kernel is the
packaged template for genuinely launch-bound serving paths (single-step
model serving, tiny-K MPC) rather than the batch-compiled episode loop.

ACCURACY VERDICT (v5e, artifacts/pallas_accuracy_r3.json, r2 item 2
closed): vs an f64 ground truth the fused kernel is consistently CLOSER
than the XLA apply (trained params, max err 0.077-0.19 vs XLA 0.12-0.41
across B=1000..131072) — folding the normalizations and contour into the
weights removes rounding steps. The r2 report of "max_rel_diff growing
6.4 -> 173 with B" was a measurement artifact: an untrained model's
pole-clipped phi puts raw outputs at magnitude ~2e4-4.5e4, and the
per-sample relative-error distribution is flat in B (q99.9 = 2.9%
untrained / 4.9% trained at B=1000 and B=131072 alike) — only the
max-statistic grew, by sampling deeper tails. Both f32 paths share that
~5% tail; it is f32 ILT conditioning (inverse-stereographic amplification
near phi ~ pi/2), i.e. the cost of running the reference's float64 model
(train_utils.py:267) in f32, not kernel error. Enforced on the real chip
by tests/test_pallas_nl.py::test_fused_forward_compiled_accuracy_real_tpu
(NLC_TPU_TESTS=1 -m tpu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ilt import _LANE, _round_up, pack_head_weights
from .sphere import _PHI_MARGIN


def pack_nl_forward(
    params,
    t_model: float,
    state_dim: int,
    action_dim: int,
    terms: int,
    state_mean,
    state_std,
    action_mean,
    action_std,
    normalize: bool = True,
    encode_obs_time: bool = False,
):
    """Fold normalizations + the fixed contour into a flat tuple of kernel
    operands. ``t_model`` is the (already normalized + floored) query time.

    Everything here is host-side numpy: the experimental TPU backend does
    not implement eager complex ops, and pack time is setup, not compute.
    """
    from .ilt import fourier_spherical_host

    gru = params["encoder"]["gru"]
    assert len(gru) == 2, "NL encoder is a 2-layer GRU (w_nl.py:21)"
    l1, l2 = gru
    w_ih1 = np.asarray(l1["w_ih"], np.float32).copy()
    b_ih1 = np.asarray(l1["b_ih"], np.float32).copy()

    # fold action normalization into layer-1 input weights. The age channel
    # (encode_obs_time) is un-normalized (models/nl.py _norm_actions).
    m = action_dim
    a_mean = np.zeros(m, np.float32) if not normalize else np.asarray(action_mean, np.float32)
    a_std = (
        np.full(m, 3.0, np.float32) if not normalize else np.asarray(action_std, np.float32)
    )
    a_mean = np.broadcast_to(a_mean, (m,))
    a_std = np.broadcast_to(a_std, (m,))
    # (a - mu)/sigma @ w == a @ (w/sigma) - mu @ (w/sigma): scale the rows,
    # then shift the bias with the SCALED weights
    w_ih1[:m, :] = w_ih1[:m, :] / a_std[:, None]
    b_ih1 = b_ih1 - a_mean @ w_ih1[:m, :]

    trunk = params["laplace_rep"]
    w1 = np.asarray(trunk[0]["w"], np.float32)
    b1 = np.asarray(trunk[0]["b"], np.float32).copy()
    L = state_dim + 2  # laplace latent dim (w_nl.py:90)
    assert w1.shape[0] == 2 * terms + L

    # fourier contour s_k = sigma + i k pi / T at the shared query time
    # (one shared host-side copy of that math: ops.ilt.fourier_spherical_host)
    theta_s, phi_s = fourier_spherical_host(float(t_model), terms)
    b1 = b1 + theta_s @ w1[:terms] + phi_s @ w1[terms : 2 * terms]

    w1_obs = w1[2 * terms : 2 * terms + state_dim].copy()
    w1_act = w1[2 * terms + state_dim :].copy()
    if normalize:
        s_mean = np.asarray(state_mean, np.float32)
        s_std = np.asarray(state_std, np.float32)
        b1 = b1 - (s_mean / s_std) @ w1_obs
        w1_obs = w1_obs / s_std[:, None]

    head = pack_head_weights(
        trunk[-1]["w"], trunk[-1]["b"], state_dim, terms, t_model
    )

    def j(x):
        return jnp.asarray(x, jnp.float32)

    return (
        j(w_ih1), j(np.asarray(l1["w_hh"], np.float32)),
        j(b_ih1)[None, :], j(np.asarray(l1["b_hh"], np.float32))[None, :],
        j(np.asarray(l2["w_ih"], np.float32)), j(np.asarray(l2["w_hh"], np.float32)),
        j(np.asarray(l2["b_ih"], np.float32))[None, :],
        j(np.asarray(l2["b_hh"], np.float32))[None, :],
        j(np.asarray(params["encoder"]["out"]["w"], np.float32)),
        j(np.asarray(params["encoder"]["out"]["b"], np.float32))[None, :],
        j(w1_obs), j(w1_act), j(b1)[None, :],
        j(np.asarray(trunk[1]["w"], np.float32)),
        j(np.asarray(trunk[1]["b"], np.float32))[None, :],
    ) + head


def _nl_forward_kernel(
    obs_ref, acts_ref,
    w_ih1_ref, w_hh1_ref, b_ih1_ref, b_hh1_ref,
    w_ih2_ref, w_hh2_ref, b_ih2_ref, b_hh2_ref,
    w_enc_ref, b_enc_ref,
    w1_obs_ref, w1_act_ref, b1_ref, w2_ref, b2_ref,
    wt_ref, wp_ref, bt_ref, bp_ref, sre_ref, sim_ref,
    out_ref,
    *, A: int, in_dim: int, H: int,
):
    f32 = jnp.float32

    def gru_step(x_t, h, w_ih, w_hh, b_ih, b_hh):
        gi = jnp.dot(x_t, w_ih, preferred_element_type=f32) + b_ih
        gh = jnp.dot(h, w_hh, preferred_element_type=f32) + b_hh
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        return (1.0 - z) * n + z * h

    B = obs_ref.shape[0]
    acts = acts_ref[:]
    h1 = jnp.zeros((B, H), f32)
    h2 = jnp.zeros((B, H), f32)
    # flipped buffer: consume newest -> oldest (w_nl.py:27)
    for step in range(A):
        src = A - 1 - step
        x_t = acts[:, src * in_dim : (src + 1) * in_dim]
        h1 = gru_step(x_t, h1, w_ih1_ref[:], w_hh1_ref[:], b_ih1_ref[:], b_hh1_ref[:])
        h2 = gru_step(h1, h2, w_ih2_ref[:], w_hh2_ref[:], b_ih2_ref[:], b_hh2_ref[:])

    p_act = jnp.dot(h2, w_enc_ref[:], preferred_element_type=f32) + b_enc_ref[:]
    hid = jnp.tanh(
        jnp.dot(obs_ref[:], w1_obs_ref[:], preferred_element_type=f32)
        + jnp.dot(p_act, w1_act_ref[:], preferred_element_type=f32)
        + b1_ref[:]
    )
    hid = jnp.tanh(jnp.dot(hid, w2_ref[:], preferred_element_type=f32) + b2_ref[:])

    g_theta = jnp.dot(hid, wt_ref[:], preferred_element_type=f32) + bt_ref[:]
    g_phi = jnp.dot(hid, wp_ref[:], preferred_element_type=f32) + bp_ref[:]
    theta = jnp.tanh(g_theta) * jnp.pi
    half_pi = jnp.pi / 2.0
    phi = jnp.clip(jnp.tanh(g_phi) * half_pi, -half_pi + _PHI_MARGIN, half_pi - _PHI_MARGIN)
    # per-hemisphere cancellation-free radius (ops/sphere.py: the literal
    # cos/(1-sin) cancels to inf/NaN within ~5.6e-4 of the pole in f32)
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    north = phi >= 0.0
    r_s = jnp.where(north, 1.0 + sin_phi, cos_phi) / jnp.where(
        north, cos_phi, 1.0 - sin_phi
    )
    f_re = r_s * jnp.cos(theta)
    f_im = r_s * jnp.sin(theta)
    out_ref[:] = jnp.dot(f_re, sre_ref[:], preferred_element_type=f32) - jnp.dot(
        f_im, sim_ref[:], preferred_element_type=f32
    )


@functools.partial(jax.jit, static_argnames=("state_dim", "in_dim"))
def nl_forward_fused(obs, acts_flat, packed, state_dim: int, in_dim: int):
    """Raw obs [B, n] + raw flattened action buffer [B, A*in] -> state-diff
    [B, state_dim] through the single fused kernel."""
    (
        w_ih1, w_hh1, b_ih1, b_hh1, w_ih2, w_hh2, b_ih2, b_hh2,
        w_enc, b_enc, w1_obs, w1_act, b1, w2, b2,
        w_theta, w_phi, b_theta, b_phi, s_re, s_im,
    ) = packed
    # head biases are packed 1-D by pack_head_weights; the kernel adds them
    # to [B, N] blocks — lift to [1, N]
    b_theta = b_theta.reshape(1, -1)
    b_phi = b_phi.reshape(1, -1)
    B, n = obs.shape
    A_in = acts_flat.shape[1]
    A = A_in // in_dim
    H = w_hh1.shape[0]
    Bp = _round_up(max(B, 8), _LANE)
    if Bp != B:
        obs = jnp.pad(obs, ((0, Bp - B), (0, 0)))
        acts_flat = jnp.pad(acts_flat, ((0, Bp - B), (0, 0)))
    N = w_theta.shape[1]
    Dp = s_re.shape[1]

    def row_spec(d):
        return pl.BlockSpec((_LANE, d), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def const_spec(x):
        return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim, memory_space=pltpu.VMEM)

    consts = (
        w_ih1, w_hh1, b_ih1, b_hh1, w_ih2, w_hh2, b_ih2, b_hh2,
        w_enc, b_enc, w1_obs, w1_act, b1, w2, b2,
        w_theta, w_phi, b_theta, b_phi, s_re, s_im,
    )
    kernel = functools.partial(_nl_forward_kernel, A=A, in_dim=in_dim, H=H)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _LANE,),
        in_specs=[row_spec(n), row_spec(A_in)] + [const_spec(c) for c in consts],
        out_specs=pl.BlockSpec((_LANE, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * (A * (2 * 3 * H * (in_dim + 2 * H)) + 2 * H
                            + 128 * (n + 2) + 128 * 128 + 2 * 128 * N + 2 * N * Dp),
            bytes_accessed=4 * (Bp * (n + A_in + Dp) + sum(c.size for c in consts)),
            transcendentals=Bp * (A * 2 * 3 * H + 128 * 2 + N * 5),
        ),
    )(obs, acts_flat, *consts)
    return out[:B, :state_dim]

"""Fused Pallas TPU kernel for the Neural-Laplace head.

The hot op in the planner loop is the tail of the NL forward
(models/nl.py): the Laplace-representation MLP's final linear layer
produces [B, 2*D*T] sphere angles which are scaled, mapped to complex
F(s), and combined by the Fourier-series ILT into [B, D]. Under the MPPI
planner this runs K*T_horizon*n_steps times per episode with a SHARED query
horizon t (ts_pred is a constant dt vector, mppi_with_model.py:74).

This kernel fuses, per 128-row batch tile, entirely in VMEM:

    G_theta = x @ W_theta + b_theta        (MXU, [128, D*Tp])
    G_phi   = x @ W_phi   + b_phi          (MXU)
    theta   = tanh(G_theta) * pi
    phi     = clip(tanh(G_phi) * pi/2)     (VPU)
    r       = cos(phi) / (1 - sin(phi))
    F_re    = r cos(theta);  F_im = r sin(theta)
    out     = prefac * (F_re @ S_re - F_im @ S_im)   (MXU, [128, Dp])

where the weight matrices are pre-permuted so column (d, t) sits at
d*Tp + t with Tp = terms padded to the 128-lane boundary's divisor 32, and
S_re/S_im are [D*Tp, Dp] selection matrices carrying the per-term Fourier
weights (half-weighted k=0 term, cos/sin phases) — turning the per-term
reduction into one more MXU matmul instead of a lane-crossing sum.

The XLA path in ops.ilt stays the reference implementation; this kernel is
validated against it in tests/test_pallas_ilt.py. The planner-path entry is
``model.make_fused_planner_apply(params, t)`` on the model returned by
models.nl.make_nl_model — it folds the fixed-contour query angles and the
packed head weights into constants and returns an apply() drop-in.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ilt import _FOURIER_ALPHA, _FOURIER_EPS, _FOURIER_SCALE
from .sphere import _PHI_MARGIN

_LANE = 128
_T_PAD = 32  # terms padded to a divisor of the lane count


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fourier_weights(t: float, terms: int, dtype=np.float32):
    """Per-term combine weights and prefactor for a scalar query time."""
    T = _FOURIER_SCALE * t
    sigma = _FOURIER_ALPHA - math.log(_FOURIER_EPS) / T
    k = np.arange(terms)
    phase = np.pi * k * (t / T)
    half = np.where(k == 0, 0.5, 1.0)
    w_re = (half * np.cos(phase)).astype(dtype)
    w_im = (half * np.sin(phase)).astype(dtype)
    prefac = dtype(math.exp(sigma * t) / T)
    return w_re, w_im, prefac


def pack_head_weights(w, b, state_dim: int, terms: int, t: float):
    """Re-layout the final linear layer [H, 2*D*terms] (+bias) into the
    kernel's padded theta/phi blocks and build the Fourier selection
    matrices for query time ``t``.

    Original column layout (models/nl.py rep_fn reshape): col = d*terms + t
    for theta rows d < D, and (D + d)*terms + t for phi.
    """
    H = w.shape[0]
    D = state_dim
    Tp = _T_PAD if terms <= _T_PAD else _round_up(terms, _T_PAD)
    Dp = _LANE  # output tile padded to one lane group
    N = D * Tp

    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    w_theta = np.zeros((H, N), np.float32)
    w_phi = np.zeros((H, N), np.float32)
    b_theta = np.zeros((N,), np.float32)
    b_phi = np.zeros((N,), np.float32)
    for d in range(D):
        src_t = slice(d * terms, (d + 1) * terms)
        src_p = slice((D + d) * terms, (D + d + 1) * terms)
        dst = slice(d * Tp, d * Tp + terms)
        w_theta[:, dst] = w[:, src_t]
        w_phi[:, dst] = w[:, src_p]
        b_theta[dst] = b[src_t]
        b_phi[dst] = b[src_p]

    w_re, w_im, prefac = fourier_weights(float(t), terms)
    s_re = np.zeros((N, Dp), np.float32)
    s_im = np.zeros((N, Dp), np.float32)
    for d in range(D):
        s_re[d * Tp : d * Tp + terms, d] = w_re * prefac
        s_im[d * Tp : d * Tp + terms, d] = w_im * prefac
    return (
        jnp.asarray(w_theta),
        jnp.asarray(w_phi),
        jnp.asarray(b_theta),
        jnp.asarray(b_phi),
        jnp.asarray(s_re),
        jnp.asarray(s_im),
    )


def _nl_head_kernel(x_ref, wt_ref, wp_ref, bt_ref, bp_ref, sre_ref, sim_ref, out_ref):
    x = x_ref[:]
    g_theta = (
        jnp.dot(x, wt_ref[:], preferred_element_type=jnp.float32) + bt_ref[:]
    )
    g_phi = jnp.dot(x, wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    theta = jnp.tanh(g_theta) * jnp.pi
    half_pi = jnp.pi / 2.0
    phi = jnp.clip(
        jnp.tanh(g_phi) * half_pi, -half_pi + _PHI_MARGIN, half_pi - _PHI_MARGIN
    )
    # per-hemisphere cancellation-free radius (ops/sphere.py: the literal
    # cos/(1-sin) cancels to inf/NaN within ~5.6e-4 of the pole in f32)
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    north = phi >= 0.0
    r = jnp.where(north, 1.0 + sin_phi, cos_phi) / jnp.where(
        north, cos_phi, 1.0 - sin_phi
    )
    f_re = r * jnp.cos(theta)
    f_im = r * jnp.sin(theta)
    out_ref[:] = jnp.dot(
        f_re, sre_ref[:], preferred_element_type=jnp.float32
    ) - jnp.dot(f_im, sim_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("state_dim",))
def nl_head_fused(x, packed, state_dim: int):
    """x [B, H] -> state-diff [B, state_dim] through the fused head.

    B is padded to the 128-row tile internally; weights stay resident in
    VMEM across the batch grid.
    """
    w_theta, w_phi, b_theta, b_phi, s_re, s_im = packed
    B, H = x.shape
    Bp = _round_up(max(B, 8), _LANE)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    N = w_theta.shape[1]
    Dp = s_re.shape[1]

    out = pl.pallas_call(
        _nl_head_kernel,
        grid=(Bp // _LANE,),
        in_specs=[
            pl.BlockSpec((_LANE, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_LANE, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * H * N * 2 + 2 * Bp * N * Dp * 2,
            bytes_accessed=4 * (Bp * H + 2 * H * N + 2 * N * Dp + Bp * Dp),
            transcendentals=Bp * N * 5,
        ),
    )(x, w_theta, w_phi, b_theta, b_phi, s_re, s_im)
    return out[:B, :state_dim]

"""Riemann-sphere stereographic coordinate maps.

The Neural Laplace representation network never sees raw complex numbers:
both its query points ``s`` and its output ``F(s)`` live on the Riemann
sphere as bounded angles ``(theta, phi)`` (Neural Laplace, arXiv 2206.04843
§3; consumed by the reference at w_nl.py:55-63 where the MLP input width is
``2*s_terms + latent`` and the output is split into theta/phi).

Forward map (complex plane -> sphere):
    theta = atan2(Im s, Re s)                     in (-pi, pi]
    phi   = arcsin((|s|^2 - 1) / (|s|^2 + 1))     in (-pi/2, pi/2)

Inverse map (sphere -> complex plane):
    s = cos(phi) / (1 - sin(phi)) * exp(i theta)

Both maps are elementwise, dtype-polymorphic and jit/vmap/grad-clean.
"""

from __future__ import annotations

import jax.numpy as jnp


def complex_to_spherical(s: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map complex array -> (theta, phi) Riemann-sphere angles."""
    s_real = jnp.real(s)
    s_imag = jnp.imag(s)
    theta = jnp.arctan2(s_imag, s_real)
    mag2 = s_real * s_real + s_imag * s_imag
    # TPU's fast f32 division can round (mag2-1)/(mag2+1) to just above 1
    # for large |s|, and arcsin(>1) = NaN — clamp into the principal domain
    ratio = jnp.clip((mag2 - 1.0) / (mag2 + 1.0), -1.0, 1.0)
    phi = jnp.arcsin(ratio)
    return theta, phi


_PHI_MARGIN = 1e-4


def spherical_to_complex(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Map (theta, phi) Riemann-sphere angles -> complex array.

    ``phi`` must lie strictly inside (-pi/2, pi/2); phi -> pi/2 is the point
    at infinity. The representation nets bound phi via tanh, but in float32
    tanh saturates to exactly 1.0 around |x|~9, which would put phi exactly
    at pi/2 and emit inf (the reference never hits this because it trains in
    float64, train_utils.py:267). phi is therefore clipped a hair inside the
    pole, bounding |s| <= ~2e4 — a TPU-f32 robustness requirement.

    The radius cos(phi)/(1 - sin(phi)) is NOT computed literally: f32
    rounds sin(phi) to exactly 1.0 for all phi within ~5.6e-4 of the north
    pole — INSIDE the clip margin — so the denominator cancels to 0 and the
    literal form emits inf/NaN. Observed in practice: dehoog-ILT training
    drives phi to pi/2 - 2.4e-4 and every forward pass NaN'd (fourier
    training never saturates phi that far, which is why the literal form
    survived rounds 1-4). Instead each hemisphere uses the reciprocal form
    that is cancellation-free there:

        phi >= 0:  r = (1 + sin(phi)) / cos(phi)     (north: no subtraction;
                                                       cos >= ~margin > 0)
        phi <  0:  r = cos(phi) / (1 - sin(phi))     (south: 1 - sin >= 1)

    algebraically identical (multiply by (1+sin)/(1+sin)), so the select at
    phi = 0 is seamless in value and gradient. Both branches keep sin/cos on
    the SAME argument phi: an earlier half-angle rewrite
    (2 sin^2(pi/4 - phi/2) for the denominator) was numerically fine but
    broke that pairing and measured 0.915x on the planner headline (1.43M
    vs 1.56M rollouts/s) — the odd-argument sine degraded the NL-decode
    mega-fusion. Neither selected denominator can reach 0 inside the clip
    range, so no masking is needed for value or gradient safety.
    """
    half_pi = jnp.pi / 2.0
    phi = jnp.clip(phi, -half_pi + _PHI_MARGIN, half_pi - _PHI_MARGIN)
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    north = phi >= 0.0
    num = jnp.where(north, 1.0 + sin_phi, cos_phi)
    den = jnp.where(north, cos_phi, 1.0 - sin_phi)
    r = num / den
    return jnp.asarray(r * jnp.cos(theta) + 1j * r * jnp.sin(theta))

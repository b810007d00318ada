"""Fixed- and adaptive-step ODE integrators, jit/vmap/grad-clean.

The reference integrates env physics with torchdiffeq's ``odeint`` using the
``euler`` method over a 2-point time grid — i.e. a single explicit Euler step
per env transition (reference envs/oderl/envs/base_env.py:156-163 together
with set_solver at :55-68; torchdiffeq's euler only steps at the supplied
grid points). The latent-ODE baseline additionally needs an adaptive
Dormand-Prince solver (reference baseline_models/latent_ode_lib/
diffeq_solver.py:43-50 uses dopri5).

Everything here is expressed with ``lax.scan`` / bounded ``lax.while_loop``
so it traces once, vmaps over batches, and differentiates.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def euler_step(rhs: Callable, y: jnp.ndarray, dt, *args) -> jnp.ndarray:
    """One explicit Euler step: ``y + dt * rhs(y, *args)``.

    ``dt`` may be a scalar or broadcastable array (e.g. per-batch step sizes,
    matching the irregular time grids of base_env.build_time_grid:99-134).
    """
    return y + dt * rhs(y, *args)


def rk4_step(rhs: Callable, y: jnp.ndarray, dt, *args) -> jnp.ndarray:
    """One classical RK4 step with autonomous rhs."""
    k1 = rhs(y, *args)
    k2 = rhs(y + 0.5 * dt * k1, *args)
    k3 = rhs(y + 0.5 * dt * k2, *args)
    k4 = rhs(y + dt * k3, *args)
    return y + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def odeint_fixed(
    rhs: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    *args,
    method: str = "euler",
    num_steps: int = 1,
) -> jnp.ndarray:
    """Integrate from t0 to t1 in ``num_steps`` equal substeps.

    The rhs is treated as autonomous in time but may consume extra ``args``
    (constant controls), matching how the envs drive physics with a constant
    action over one transition (base_env.py:197-198).
    """
    dt = (t1 - t0) / num_steps
    step = euler_step if method == "euler" else rk4_step

    def body(y, _):
        return step(rhs, y, dt, *args), None

    yT, _ = lax.scan(body, y0, None, length=num_steps)
    return yT


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince 5(4)
# ---------------------------------------------------------------------------

# Butcher tableau (Dormand & Prince 1980)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)


def _dp_step(rhs, y, t, h, *args):
    """One Dormand-Prince 5(4) step; returns (y5, error_estimate)."""
    ks = []
    for i in range(7):
        yi = y
        for j, aij in enumerate(_DP_A[i]):
            yi = yi + h * aij * ks[j]
        ks.append(rhs(yi, t + _DP_C[i] * h, *args))
    y5 = y
    err = jnp.zeros_like(y)
    for i in range(7):
        y5 = y5 + h * _DP_B5[i] * ks[i]
        err = err + h * (_DP_B5[i] - _DP_B4[i]) * ks[i]
    return y5, err


def odeint_dopri5(
    rhs: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    *args,
    rtol: float = 1e-3,
    atol: float = 1e-4,
    max_steps: int = 64,
) -> jnp.ndarray:
    """Adaptive dopri5 over an increasing time grid ``ts`` (shape [T]).

    Returns the solution at every grid point, shape ``[T, *y0.shape]``.
    The step-count bound is static (``max_steps`` per interval) so the solver
    vmaps/jits with fixed shapes; rhs signature is ``rhs(y, t, *args)``.
    Tolerances default to the reference encoder solver settings
    (latent_ode_lib/create_latent_ode_model.py:98-106: rtol 1e-3, atol 1e-4).
    """

    ys, _ = _odeint_dopri5_impl(rhs, y0, ts, args, rtol, atol, max_steps)
    return ys


def odeint_dopri5_with_stats(rhs, y0, ts, *args, rtol=1e-3, atol=1e-4, max_steps=64):
    """Like :func:`odeint_dopri5` but also returns per-interval accepted-step
    counts (shape [T-1]). nfe per interval = 7 * accepted (plus rejected
    attempts; the wall-clock cost is always 7 * max_steps). This is the
    analog of the reference's ODEFunc nfe counter
    (latent_ode_lib/ode_func.py:14-51, w_latent_ode._get_and_reset_nfes
    :207-227)."""
    return _odeint_dopri5_impl(rhs, y0, ts, args, rtol, atol, max_steps)


def _odeint_dopri5_impl(rhs, y0, ts, args, rtol, atol, max_steps):
    def solve_interval(y_t0, interval):
        # A masked scan (not while_loop) so the solve is reverse-mode
        # differentiable: once t reaches t1 the remaining iterations become
        # no-ops. Wall-clock cost is max_steps rhs evaluations regardless of
        # accepted-step count, which XLA pipelines well on TPU.
        t0, t1 = interval
        span = t1 - t0

        def body(state, _):
            t, y, h, n_acc = state
            done = t >= t1 - 1e-12
            h_eff = jnp.minimum(h, t1 - t)
            y_new, err = _dp_step(rhs, y, t, h_eff, *args)
            # Step-size control is NOT differentiated (discretise-then-
            # optimise with frozen accept/step decisions): naive autodiff
            # through the error norm hits sqrt(0) -> 0*inf = NaN on the
            # masked no-op iterations after an interval finishes.
            err_sg = jax.lax.stop_gradient(err)
            y_sg = jax.lax.stop_gradient(y)
            ynew_sg = jax.lax.stop_gradient(y_new)
            scale = atol + rtol * jnp.maximum(jnp.abs(y_sg), jnp.abs(ynew_sg))
            err_ratio = jnp.sqrt(jnp.mean((err_sg / scale) ** 2) + 1e-30)
            err_ratio = jnp.maximum(err_ratio, 1e-10)
            accept = jnp.logical_and(err_ratio <= 1.0, jnp.logical_not(done))
            factor = jnp.clip(0.9 * err_ratio ** (-1.0 / 5.0), 0.2, 5.0)
            h_next = jnp.where(done, h, jnp.clip(h_eff * factor, span * 1e-4, span))
            h_next = jax.lax.stop_gradient(h_next)
            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(accept, y_new, y)
            n_acc = n_acc + accept.astype(jnp.int32)
            return (t, y, h_next, n_acc), None

        h0 = jnp.asarray(span / 8.0, dtype=y_t0.dtype)
        (_, y_t1, _, n_acc), _ = lax.scan(
            body, (t0, y_t0, h0, jnp.zeros((), jnp.int32)), None, length=max_steps
        )
        return y_t1, (y_t1, n_acc)

    intervals = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, (ys, n_accs) = lax.scan(solve_interval, y0, intervals)
    return jnp.concatenate([y0[None], ys], axis=0), n_accs

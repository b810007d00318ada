"""Minimal torch `odeint` shim standing in for the torchdiffeq package.

The environment has no torchdiffeq, so the reference's own model classes
(train_utils.py:637-738 NODE; baseline_models/latent_ode_lib/diffeq_solver.py)
are cross-run with this drop-in implementing the two methods they request:

- ``euler``: fixed-step explicit Euler over the supplied time grid; when
  ``options={"step_size": h}`` is given each grid interval is subdivided into
  equal substeps of length <= h (torchdiffeq fixed-grid semantics).
- ``dopri5``: standard Dormand-Prince RK5(4) with the classic PI-free step
  controller (safety 0.9, factors in [0.2, 10], order-5 error exponent) and
  torchdiffeq's mixed rtol/atol RMS error norm over the whole state tensor.

Only the reference's call signatures are supported. This file is part of the
baseline-parity evidence, not of the framework package.
"""

import math

import torch

# Dormand-Prince Butcher tableau (RK5(4)7M).
_C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_B4 = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]


def _rms_norm(x):
    return torch.sqrt(torch.mean(x * x))


def _error_norm(err, y0, y1, rtol, atol):
    with torch.no_grad():
        scale = atol + rtol * torch.maximum(y0.abs(), y1.abs())
        return _rms_norm(err.detach() / scale)


def _dopri5_step(func, t, y, h):
    k = [func(t, y)]
    for i in range(1, 7):
        yi = y
        for j, aij in enumerate(_A[i]):
            if aij != 0.0:
                yi = yi + h * aij * k[j]
        k.append(func(t + _C[i] * h, yi))
    y5 = y
    err = torch.zeros_like(y)
    for i in range(7):
        if _B5[i] != 0.0:
            y5 = y5 + h * _B5[i] * k[i]
        d = _B5[i] - _B4[i]
        if d != 0.0:
            err = err + h * d * k[i]
    return y5, err


def _dopri5_integrate(func, y0, t0, t1, rtol, atol):
    y = y0
    t = t0
    span = float(t1 - t0)
    if span == 0.0:
        return y0
    direction = 1.0 if span > 0 else -1.0
    h = direction * max(abs(span) * 0.1, 1e-6)
    max_steps = 10000
    for _ in range(max_steps):
        if direction * (t + h - t1) > 0:
            h = t1 - t
        y_new, err = _dopri5_step(func, torch.as_tensor(t, dtype=y0.dtype), y, h)
        en = float(_error_norm(err, y, y_new, rtol, atol))
        if en <= 1.0 or abs(h) <= 1e-12 * abs(span):
            t = t + float(h)
            y = y_new
            if direction * (t - t1) >= -1e-14 * abs(span):
                return y
            grow = 10.0 if en == 0.0 else min(10.0, 0.9 * en ** (-0.2))
            h = h * max(grow, 1.0)
        else:
            h = h * max(0.2, 0.9 * en ** (-0.2))
    raise RuntimeError("dopri5 shim: max step count exceeded")


def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method="dopri5", options=None):
    """torchdiffeq-compatible odeint over a 1-D time grid `t`."""
    options = options or {}
    t = torch.as_tensor(t)
    ys = [y0]
    y = y0
    if method == "euler":
        step_size = options.get("step_size")
        for i in range(len(t) - 1):
            t0, t1 = float(t[i]), float(t[i + 1])
            span = t1 - t0
            if step_size is None or step_size <= 0 or abs(span) <= step_size:
                nsub = 1
            else:
                nsub = max(1, int(math.ceil(abs(span) / step_size)))
            h = span / nsub
            tc = t0
            for _ in range(nsub):
                y = y + h * func(torch.as_tensor(tc, dtype=y0.dtype), y)
                tc += h
            ys.append(y)
    elif method == "dopri5":
        for i in range(len(t) - 1):
            y = _dopri5_integrate(func, y, float(t[i]), float(t[i + 1]), rtol, atol)
            ys.append(y)
    else:
        raise NotImplementedError(f"odeint shim: method {method!r}")
    return torch.stack(ys, dim=0)

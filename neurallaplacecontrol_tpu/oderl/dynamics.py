"""Forward simulation of learned vector fields with the policy in the loop.

Rebuild of reference envs/oderl/ctrl/dynamics.py: the NODE family (enode /
benode / ibnode) integrates ds/dt = f([s, a]) with a = g(s, t) and the
reward integrand dV/dt = r(s, a) e^{-t/tau} for L function draws at once;
PETS propagates P particles per initial state with a fresh ensemble-member
assignment per step (dynamics.py:182-214); DeepPILCO moment-matches the
state distribution across draws after every step (dynamics.py:217-253).

TPU shape discipline: the draw dimension L and particle dimension P are
ordinary leading batch axes ([L, N, n] / [L, P*N, n]); the horizon is one
``lax.scan``; each env-dt interval optionally takes ``substeps`` fixed RK4/
Euler sub-steps (the reference uses dopri5 with step_size dt/10,
ctrl.py:226-232 — a fixed dt/substeps grid is the static-shape equivalent).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _reward(env, s, a):
    # the ODE-RL stack learns dynamics in OBSERVATION space (reference
    # ctrl.py qin = env.n + env.m where env.n is the trig obs dim), so s is
    # already an observation; the reward functions shape-dispatch on it.
    return env.reward_state(s) + env.reward_action(a)


def _sv_rhs(net, params, noise, env, g, tau, compute_rew):
    """d[s, V]/dt for stacked draws: s [L,N,n], V [L,N]."""

    def rhs(t, s, V):
        a = g(s, t)  # [L,N,m]
        ds = net.apply(params, jnp.concatenate([s, a], axis=-1), noise)
        if compute_rew:
            dV = _reward(env, s, a)
            if tau is not None:
                dV = dV * jnp.exp(-t / tau)
        else:
            dV = jnp.zeros_like(V)
        return ds, dV

    return rhs


def _integrate_interval(rhs, t0, dt, s, V, substeps, method):
    """Advance [s, V] over one observation interval with fixed sub-steps."""
    h = dt / substeps

    def euler_step(carry, i):
        s, V = carry
        t = t0 + i * h
        ds, dV = rhs(t, s, V)
        return (s + h * ds, V + h * dV), None

    def rk4_step(carry, i):
        s, V = carry
        t = t0 + i * h
        k1s, k1v = rhs(t, s, V)
        k2s, k2v = rhs(t + h / 2, s + h / 2 * k1s, V + h / 2 * k1v)
        k3s, k3v = rhs(t + h / 2, s + h / 2 * k2s, V + h / 2 * k2v)
        k4s, k4v = rhs(t + h, s + h * k3s, V + h * k3v)
        return (
            s + h / 6 * (k1s + 2 * k2s + 2 * k3s + k4s),
            V + h / 6 * (k1v + 2 * k2v + 2 * k3v + k4v),
        ), None

    step = rk4_step if method == "rk4" else euler_step
    (s, V), _ = lax.scan(step, (s, V), jnp.arange(substeps))
    return s, V


def simulate_enode(
    net,
    params,
    env,
    g: Callable,
    s0: jnp.ndarray,  # [N, n]
    key: jax.Array,
    H: Optional[float] = None,
    ts: Optional[jnp.ndarray] = None,  # [T] shared grid (overrides H)
    L: int = 1,
    tau: Optional[float] = None,
    compute_rew: bool = True,
    substeps: int = 10,
    method: str = "rk4",
):
    """Ensemble/BNN neural-ODE rollout (dynamics.py NODE:129-180).

    Returns (st [L,N,T,n], rt [L,N,T], ts [T]). L is forced to net.n_ens
    for ensemble families (ctrl.py get_L:123-127).
    """
    spec = env.spec
    L = net.n_ens if net.n_ens > 1 else L
    if ts is None:
        T = int(H / spec.dt)
        ts = spec.dt * jnp.arange(T + 1)
    dts = ts[1:] - ts[:-1]
    noise = net.draw_noise(params, key, L)
    rhs = _sv_rhs(net, params, noise, env, g, tau, compute_rew)

    s = jnp.broadcast_to(s0[None], (L,) + s0.shape)
    V = jnp.zeros(s.shape[:-1])

    def step(carry, inp):
        s, V = carry
        t0, dt = inp
        s, V = _integrate_interval(rhs, t0, dt, s, V, substeps, method)
        return (s, V), (s, V)

    (_, _), (st, Vt) = lax.scan(step, (s, V), (ts[:-1], dts))
    # [T,L,N,...] -> [L,N,T,...]; index 0 is the state AFTER the first
    # interval; prepend the initial state like the reference (st[:T])
    st = jnp.concatenate([s0[None, None] * jnp.ones((1, L, 1, 1)), st[:-1]], axis=0)
    Vt = jnp.concatenate([jnp.zeros_like(Vt[:1]), Vt[:-1]], axis=0)
    return jnp.moveaxis(st, 0, 2), jnp.moveaxis(Vt, 0, 2), ts[:-1]


def simulate_pets(
    net,  # an EPNN ApproxNet
    params,
    env,
    g: Callable,
    s0: jnp.ndarray,  # [N, n]
    key: jax.Array,
    H: Optional[float] = None,
    ts: Optional[jnp.ndarray] = None,
    P: int = 20,
    tau: Optional[float] = None,
    compute_rew: bool = True,
):
    """PETS trajectory sampling (dynamics.py PETS:182-214): P particles per
    initial state, explicit Euler on the observation grid, and a fresh
    random particle->member assignment every step (the reference shuffles
    the ensemble weights; permuting the particle axis before each draw is
    the equivalent pure formulation).

    Returns (st [L*P, N, T, n], rt [L*P, N, T], ts [T]).
    """
    spec = env.spec
    L = net.n_ens
    N, n = s0.shape
    if ts is None:
        T = int(H / spec.dt)
        ts = spec.dt * jnp.arange(T + 1)
    dts = ts[1:] - ts[:-1]

    s = jnp.broadcast_to(s0[None, None], (L, P, N, n)).reshape(L, P * N, n)
    V = jnp.zeros((L, P * N))

    def step(carry, inp):
        s, V, k = carry
        t, dt, draw_key = inp
        k, k_shuf = jax.random.split(k)
        a = g(s, t)
        r = _reward(env, s, a)
        if tau is not None:
            r = r * jnp.exp(-t / tau)
        V_next = V + dt * r if compute_rew else V
        ds = net.apply(params, jnp.concatenate([s, a], axis=-1), draw_key)
        s_next = s + dt * ds
        # fresh member assignment (dynamics.py:205 _f.shuffle())
        perm = jax.random.permutation(k_shuf, L)
        s_next, V_next = s_next[perm], V_next[perm]
        return (s_next, V_next, k), (s, V)

    draw_keys = jax.random.split(key, dts.shape[0])
    (_, _, _), (st, Vt) = lax.scan(
        step, (s, V, jax.random.fold_in(key, 1)), (ts[:-1], dts, draw_keys)
    )
    # scan stacks T on axis 0: st [T,L,P*N,n] -> [L*P,N,T,n]; Vt likewise
    T = st.shape[0]
    st = jnp.moveaxis(st.reshape(T, L, P, N, n), 0, 3).reshape(L * P, N, T, n)
    Vt = jnp.moveaxis(Vt.reshape(T, L, P, N), 0, 3).reshape(L * P, N, T)
    return st, Vt, ts[:-1]


def simulate_deep_pilco(
    net,  # a dropout ApproxNet
    params,
    env,
    g: Callable,
    s0: jnp.ndarray,
    key: jax.Array,
    H: Optional[float] = None,
    ts: Optional[jnp.ndarray] = None,
    L: int = 10,
    tau: Optional[float] = None,
    compute_rew: bool = True,
):
    """DeepPILCO rollout (dynamics.py DeepPILCO:217-253): Euler steps under
    L dropout draws with Gaussian moment matching of the state distribution
    after every step. Returns (st [L,N,T,n], rt [L,N,T], ts [T])."""
    spec = env.spec
    N, n = s0.shape
    if ts is None:
        T = int(H / spec.dt)
        ts = spec.dt * jnp.arange(T + 1)
    dts = ts[1:] - ts[:-1]
    noise = net.draw_noise(params, key, L)

    s = jnp.broadcast_to(s0[None], (L, N, n))
    V = jnp.zeros((L, N))

    def step(carry, inp):
        s, V, k = carry
        t, dt = inp
        k, k_mm = jax.random.split(k)
        a = g(s, t)
        r = _reward(env, s, a)
        if tau is not None:
            r = r * jnp.exp(-t / tau)
        V_next = V + dt * r if compute_rew else V
        ds = net.apply(params, jnp.concatenate([s, a], axis=-1), noise)
        s_next = s + dt * ds
        # moment matching across draws (dynamics.py:246-248)
        mu = jnp.mean(s_next, axis=0)
        sig = jnp.std(s_next, axis=0)
        s_next = mu[None] + jax.random.normal(k_mm, s_next.shape) * sig[None]
        return (s_next, V_next, k), (s, V)

    (_, _, _), (st, Vt) = lax.scan(
        step, (s, V, jax.random.fold_in(key, 2)), (ts[:-1], dts)
    )
    return jnp.moveaxis(st, 0, 2), jnp.moveaxis(Vt, 0, 2), ts[:-1]

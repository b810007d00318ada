"""Trajectory datasets + RBF kernel action interpolants for ODE-RL.

Rebuild of reference envs/oderl/ctrl/dataset.py and the GP/exploration
helpers in ctrl/utils.py:510-617 + utils/utils.py:34-77,148-170
(KernelInterpolation). The torch Dataset class becomes an immutable pytree
of stacked arrays; GP-smooth exploration actions and kernel interpolants
become pure batched linear algebra (one Cholesky per trajectory, vmapped).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class Dataset(NamedTuple):
    """Trajectory experience (reference ctrl/dataset.py:10-60):
    s [N,T,n] states, a [N,T,m] actions, r [N,T,1] rewards, ts [N,T]."""

    s: jnp.ndarray
    a: jnp.ndarray
    r: jnp.ndarray
    ts: jnp.ndarray

    @property
    def N(self):
        return self.s.shape[0]

    @property
    def T(self):
        return self.s.shape[1]

    def add_experience(self, other: "Dataset") -> "Dataset":
        return Dataset(
            s=jnp.concatenate([self.s, other.s]),
            a=jnp.concatenate([self.a, other.a]),
            r=jnp.concatenate([self.r, other.r]),
            ts=jnp.concatenate([self.ts, other.ts]),
        )


def rbf_kernel(x1, x2, ell=1.0, sf=1.0, eps=1e-5, jitter=False):
    """sf^2 exp(-0.5 |x1-x2|^2/ell^2), plus eps I on self-kernels
    (utils/utils.py:72-77). ``jitter`` must be set explicitly by the caller
    for the K(X, X) case — keying it off matching point counts (as the
    reference does) corrupts cross-covariances whenever Q happens to equal
    T."""
    d = (x1[..., :, None, :] - x2[..., None, :, :]) / ell
    Km = sf**2 * jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))
    if jitter:
        Km = Km + jnp.eye(x1.shape[-2]) * eps
    return Km


def kernel_interpolate(ts, ys, query_t, ell=0.5, sf=1.0, eps=1e-5):
    """Kernel-ridge interpolation of a trajectory signal
    (utils/utils.py KernelInterpolation:148-170): given knots (ts [T], ys
    [T,m]) return values at query_t [Q] -> [Q,m]."""
    X = ts[:, None]
    Kxx = rbf_kernel(X, X, ell, sf, eps, jitter=True)
    alpha = jnp.linalg.solve(Kxx, ys)
    kqx = rbf_kernel(query_t[:, None], X, ell, sf)
    return kqx @ alpha


def make_kernel_interpolate_policy(ts, at, ell=0.5, sf=1.0) -> Callable:
    """g(s, t) interpolating recorded actions (dataset.KernelInterpolatePolicy
    :145-161): precomputes K^-1 y per trajectory; returns per-trajectory
    actions at a (traced) scalar time t."""
    N = at.shape[0]
    X = ts[..., None]  # [N,T,1]
    Kxx = rbf_kernel(X, X, ell, sf, jitter=True)
    alpha = jnp.linalg.solve(Kxx, at)  # [N,T,m]

    def g(s, t):
        q = jnp.reshape(t, (1, 1)) * jnp.ones((N, 1, 1))
        kqx = rbf_kernel(q, X, ell, sf)  # [N,1,T]
        out = (kqx @ alpha)[:, 0]  # [N,m]
        return out

    return g


def draw_from_gp(key, ts, n_out=1, ell=0.5, sf=1.0, eps=1e-5):
    """One GP-prior draw over the time grid (ctrl/utils.py:520-528):
    cholesky(K) @ normal -> [T, n_out]."""
    cov = rbf_kernel(ts[:, None], ts[:, None], ell, sf, eps, jitter=True)
    L = jnp.linalg.cholesky(cov)
    return L @ jax.random.normal(key, (ts.shape[0], n_out))


def make_exploration_policy(key, env, T, g_pol: Optional[Callable] = None,
                            sf=0.1, ell=0.5) -> Callable:
    """Smooth random exploration policy (ctrl/utils.py build_policy:557-566):
    tanh(policy + GP-smooth noise interpolant) * action_high."""
    spec = env.spec
    ts = spec.dt * jnp.arange(T)
    noise = draw_from_gp(key, ts, n_out=spec.m, ell=ell, sf=sf)

    def g(s, t):
        a_exp = kernel_interpolate(ts, noise, jnp.reshape(t, (1,)), ell=ell, sf=sf)[0]
        a_pol = g_pol(s, t) if g_pol is not None else 0.0
        return jnp.tanh(a_pol + a_exp) * spec.action_high

    return g


def collect_data(key, env, H: float, N: int = 1,
                 sf=0.5, ell=0.5, D: Optional[Dataset] = None,
                 g_pol: Optional[Callable] = None) -> Dataset:
    """Roll N trajectories of H seconds under smooth exploration actions
    (ctrl/utils.py collect_data:569-586), fully on-device: the env Euler
    integration over the uniform dt grid is one lax.scan per trajectory,
    vmapped over N.

    Exploration noise actions are precomputed per step (the policy is
    time-indexed, states don't feed back unless g_pol is given).
    """
    spec = env.spec
    T = int(H / spec.dt)
    ts = spec.dt * jnp.arange(T)

    def one_traj(k):
        k_reset, k_gp = jax.random.split(k)
        s0 = env.reset(k_reset)
        noise = draw_from_gp(k_gp, ts, n_out=spec.m, ell=ell, sf=sf)

        def step(s, inp):
            t, a_exp = inp
            a_pol = g_pol(env.observe(s), t) if g_pol is not None else 0.0
            a = jnp.tanh(a_pol + a_exp) * spec.action_high
            obs = env.observe(s)
            r = env.reward_state(obs) + env.reward_action(a)
            s_next = s + spec.dt * env.rhs(s, a)
            return s_next, (obs, a, r)

        _, (st, at, rt) = jax.lax.scan(step, s0, (ts, noise))
        return st, at, rt[:, None], ts

    st, at, rt, tss = jax.vmap(one_traj)(jax.random.split(key, N))
    new = Dataset(s=st, a=at, r=rt, ts=tss)
    return new if D is None else D.add_experience(new)

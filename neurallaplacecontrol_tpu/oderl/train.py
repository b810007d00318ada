"""ODE-RL training loops: dynamics fitting + actor-critic policy learning.

Rebuild of reference envs/oderl/ctrl/utils.py:154-509 (train_loop /
train_policy / train_dynamics / gradient_match / train_pets /
train_deep_pilco). Each reference loop is a Python for-loop of individually
autograded torch ops; here every iteration is one jitted update step (the
imagined rollout, its gradient, and the optimizer update all fuse into a
single device launch).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .ctrl import CTRL
from .dataset import Dataset, kernel_interpolate

logger = logging.getLogger(__name__)


def _finite_diff_targets(D: Dataset):
    """(s, a) -> ds/dt regression pairs from stored trajectories
    (ctrl/utils.py:453-459)."""
    ds = (D.s[:, 1:] - D.s[:, :-1]).reshape(-1, D.s.shape[-1])
    dt = (D.ts[:, 1:] - D.ts[:, :-1]).reshape(-1, 1)
    s = D.s[:, :-1].reshape(-1, D.s.shape[-1])
    a = D.a[:, :-1].reshape(-1, D.a.shape[-1])
    return s, a, ds / dt


def _dsdt_mse_loss(ctrl: CTRL, params, key, s, a, targets, L: int, kl_w: float):
    sL = jnp.broadcast_to(s[None], (L,) + s.shape)
    aL = jnp.broadcast_to(a[None], (L,) + a.shape)
    pred = ctrl.ds_dt(params, key, sL, aL, L=L)
    err = jnp.sum((pred - targets[None]) ** 2)
    return err + kl_w * ctrl.f_net.kl(params["f"])


def gradient_match(ctrl: CTRL, params, D: Dataset, key, n_iter: int = 500,
                   L: int = 10, lr: float = 1e-3, kl_w: float = 1.0):
    """Initialize the drift by regressing finite-difference ds/dt
    (ctrl/utils.py gradient_match:663-697). Returns (params, losses)."""
    s, a, targets = _finite_diff_targets(D)
    L = ctrl.get_L(L)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        loss, grads = jax.value_and_grad(
            lambda p: _dsdt_mse_loss(ctrl, p, k, s, a, targets, L, kl_w)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(n_iter):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
    return params, losses


# train_deep_pilco (ctrl/utils.py:448-476) IS ds/dt regression with KL —
# same objective as gradient_match with the dropout net's draws.
def train_deep_pilco(ctrl: CTRL, params, D: Dataset, key, n_iter: int = 500,
                     L: int = 100, lr: float = 1e-3):
    return gradient_match(ctrl, params, D, key, n_iter=n_iter, L=L, lr=lr)


def train_pets(ctrl: CTRL, params, D: Dataset, key, n_iter: int = 500,
               lr: float = 1e-3, C: float = 0.01):
    """Gaussian NLL over the probabilistic ensemble + logsig-bound penalty
    (ctrl/utils.py train_pets:478-506). Returns (params, losses)."""
    s, a, targets = _finite_diff_targets(D)
    L = ctrl.n_ens
    get_probs = ctrl.f_net.extras["get_probs"]
    x = jnp.broadcast_to(
        jnp.concatenate([s, a], axis=-1)[None], (L, s.shape[0], s.shape[1] + a.shape[1])
    )
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        mean, sig = get_probs(params["f"], x)
        ll = -0.5 * ((targets[None] - mean) / sig) ** 2 - jnp.log(sig) - 0.5 * jnp.log(2 * jnp.pi)
        nll = -jnp.sum(ll) / L
        bound_pen = C * jnp.sum(params["f"]["max_logsig"] - params["f"]["min_logsig"])
        return nll + bound_pen

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(n_iter):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return params, losses


def _sample_segments(D: Dataset, key, n_seg: int, W: int):
    """Random (trajectory, start) sub-windows of length W+1."""
    if W + 1 > D.T:
        raise ValueError(
            f"segment window W+1={W + 1} exceeds trajectory length T={D.T} "
            "(jax would clamp the gather and fabricate stationary tail data)"
        )
    k1, k2 = jax.random.split(key)
    traj = jax.random.randint(k1, (n_seg,), 0, D.N)
    # start may reach D.T - 1 - W so the window [start, start+W] can cover
    # the trajectory tail (maxval is exclusive)
    start = jax.random.randint(k2, (n_seg,), 0, D.T - W)
    idx = start[:, None] + jnp.arange(W + 1)[None]
    return (
        D.s[traj[:, None], idx],
        D.a[traj[:, None], idx],
        D.ts[traj[:, None], idx],
    )


def train_dynamics(ctrl: CTRL, params, D: Dataset, key, n_iter: int = 250,
                   H: Optional[float] = None, L: int = 1, lr: float = 1e-3,
                   n_seg: int = 32, kl_w: float = 1.0, substeps: int = 5,
                   log_every: int = 50):
    """Trajectory-segment likelihood fitting for the ODE families
    (ctrl/utils.py train_dynamics:317-413 + dynamics_loss:303-314): simulate
    each segment from its first state under the kernel-interpolated recorded
    actions, score a Gaussian likelihood with the learned noise scale sn.

    Returns (params, losses-in-mse).
    """
    spec = ctrl.env.spec
    H = H if H is not None else 5 * spec.dt  # train_ode (:432)
    W = max(1, int(round(H / spec.dt)))
    L = ctrl.get_L(L)
    n = spec.n_obs  # obs-space dynamics
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, k, s_seg, a_seg, ts_seg):
        ts_rel = ts_seg - ts_seg[:, :1]

        # simulate each segment on its OWN time grid (trajectories may carry
        # irregular/non-identical grids; integrating everything on segment
        # 0's grid would silently misalign targets)
        def sim_one(k_row, s_row, a_row, ts_row):
            def g(s, t):
                a = kernel_interpolate(ts_row, a_row, jnp.reshape(t, (1,)))[0]
                return jnp.broadcast_to(a, s.shape[:-1] + (spec.m,))

            st, _, _ = ctrl.forward_simulate(
                params, k_row, ts_row, s_row[None, 0], g=g, L=L,
                compute_rew=False, substeps=substeps,
            )
            return st[:, 0]  # [L, W, n]

        keys = jax.random.split(k, s_seg.shape[0])
        st_hat = jax.vmap(sim_one)(keys, s_seg, a_seg, ts_rel)  # [B, L, W, n]
        sn = jnp.exp(params["logsn"][:n])
        sq = ((s_seg[:, None, :W] - st_hat) ** 2) / sn**2 / 2.0
        lhood = -sq - jnp.mean(params["logsn"][:n]) - 0.5 * jnp.log(2 * jnp.pi)
        mse = jnp.mean(sq)
        loss = -jnp.sum(lhood) / st_hat.shape[1] + kl_w * ctrl.f_net.kl(params["f"])
        return loss, mse

    @jax.jit
    def step(params, opt_state, k):
        k_seg, k_draw = jax.random.split(k)
        s_seg, a_seg, ts_seg = _sample_segments(D, k_seg, n_seg, W)
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, k_draw, s_seg, a_seg, ts_seg
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, mse

    mses = []
    for i in range(n_iter):
        params, opt_state, mse = step(params, opt_state, jax.random.fold_in(key, i))
        mses.append(float(mse))
        if log_every and i % log_every == 0:
            logger.info("[train_dynamics %s] iter %d mse %.4f", ctrl.name, i, mses[-1])
    return params, mses


def train_policy(ctrl: CTRL, params, D: Dataset, key, n_iter: int = 250,
                 H: float = 2.0, tau: float = 5.0, N: int = 100, L: int = 10,
                 V_const: float = 1.0, lr: float = 1e-3,
                 value_inner_iters: int = 10, target_update_every: int = 100,
                 substeps: int = 5, log_every: int = 50):
    """Actor-critic through imagined rollouts (ctrl/utils.py
    train_policy:216-301): maximize n-step returns rt + e^{-t/tau} V(st)
    under L dynamics draws; fit V to the bootstrapped targets with a frozen
    target copy refreshed every ``target_update_every`` iterations.

    Returns (params, rewards-per-iteration).
    """
    L = ctrl.get_L(L)
    s_pool = D.s.reshape(-1, D.s.shape[-1])
    opt_g = optax.adam(lr)
    opt_v = optax.adam(lr)
    g_state = opt_g.init(params["g"])
    v_state = opt_v.init(params["V"])

    def simulate(params_g, params_other, k, s0):
        p = {**params_other, "g": params_g}
        st, rt, ts = ctrl.forward_simulate(
            p, k, H, s0, L=L, tau=tau, compute_rew=True, substeps=substeps,
        )
        return st, rt, ts

    def policy_loss(params_g, params_other, V_target_params, k, s0):
        st, rt, ts = simulate(params_g, params_other, k, s0)
        gammas = jnp.exp(-ts / tau)
        V_st = ctrl.V_net.apply(V_target_params, st)[..., 0]  # [L,N,T]
        n_step = rt[:, :, 1:] + V_const * V_st[:, :, 1:] * gammas[1:]
        mean_reward = jnp.mean(rt[:, :, -1]) / H
        return -jnp.mean(n_step), (st, rt, ts, mean_reward)

    @partial(jax.jit, donate_argnums=())
    def step(params, g_state, v_state, V_target_params, k):
        k_iv, k_sim, k_td = jax.random.split(k, 3)
        s0 = s_pool[jax.random.randint(k_iv, (N,), 0, s_pool.shape[0])]
        p_other = {kk: v for kk, v in params.items() if kk != "g"}
        (loss, (st, rt, ts, mean_rew)), g_grads = jax.value_and_grad(
            policy_loss, has_aux=True
        )(params["g"], p_other, V_target_params, k_sim, s0)
        updates, g_state = opt_g.update(g_grads, g_state)
        params = {**params, "g": optax.apply_updates(params["g"], updates)}

        # bootstrapped value targets (train_policy :277-285)
        gammas = jnp.exp(-ts / tau)
        last_vals = ctrl.V_net.apply(V_target_params, st)[..., 0]
        Vtargets = jnp.mean(
            jnp.mean(rt[:, :, 1:] + gammas[1:] * last_vals[:, :, 1:], axis=0), axis=-1
        )  # [N]

        def td_step(carry, _):
            v_params, v_state = carry
            td = jax.value_and_grad(
                lambda vp: jnp.mean(
                    (ctrl.V_net.apply(vp, s0)[..., 0] - Vtargets) ** 2
                )
            )
            err, grads = td(v_params)
            updates, v_state = opt_v.update(grads, v_state)
            return (optax.apply_updates(v_params, updates), v_state), err

        (v_params, v_state), errs = jax.lax.scan(
            td_step, (params["V"], v_state), None, length=value_inner_iters
        )
        params = {**params, "V": v_params}
        return params, g_state, v_state, loss, mean_rew, errs[-1]

    rewards = []
    V_target = params["V"]
    for i in range(n_iter):
        if i % target_update_every == 0:
            V_target = params["V"]
        params, g_state, v_state, loss, mean_rew, td_err = step(
            params, g_state, v_state, V_target, jax.random.fold_in(key, i)
        )
        rewards.append(float(mean_rew))
        if log_every and i % log_every == 0:
            logger.info(
                "[train_policy %s] iter %d opt %.3f reward %.3f td %.4f",
                ctrl.name, i, float(loss), rewards[-1], float(td_err),
            )
    return params, rewards

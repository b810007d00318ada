"""Delay-aware Model Predictive Path Integral control, as pure functions.

Functional rebuild of reference planners/mppi_delay.py (MPPIDelay, Williams
et al. 2017 Algorithm 2 with an action-history buffer for delayed systems).
The reference's per-step Python loop over the horizon (:271-296) becomes a
single ``lax.scan``; the K-sample batch is one tensor dimension, shardable
across chips via parallel.sharding.shard_mppi_dynamics.

State that the reference keeps on ``self`` (the receding-horizon control
sequence ``U``, planners/mppi_delay.py:159-164,199-200) is explicit carry
here: ``command`` takes and returns ``U``.

Algorithm (matching :193-224, :232-313, :315-345):
  1. U <- roll(U, -1); U[-1] = u_init
  2. noise ~ N(0, Sigma)  [K, T, nu];  perturbed = U + noise, bounded to
     [u_min, u_max] in scaled units; noise recomputed after bounding
  3. windows: prepend the action history buffer[1:] to the scaled perturbed
     actions; the dynamics at step t sees the sliding window
     full[:, t : t + A, :]  (A = action buffer size)
  4. rollout under the dynamics closure, accumulating running costs
  5. cost += lambda * sum_t U_t . (Sigma^-1 noise_t)
  6. omega = softmax(-(cost - min cost)/lambda); U += sum_k omega_k noise_k
  7. action = u_scale * U[0]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class MPPIConfig:
    """Static planner shape/knobs (hashable; safe to close over in jit)."""

    num_samples: int  # K
    horizon: int  # T
    nu: int
    lambda_: float = 1.0
    u_scale: float = 1.0  # multiplies unit-scale controls into env units
    u_min: float = -1.0  # env units (ACTION_LOW)
    u_max: float = 1.0  # env units (ACTION_HIGH)
    sample_null_action: bool = False
    noise_abs_cost: bool = False
    # time-age channel on the action window (reference mppi_delay.py:279-287):
    # the rollout advances a shared age buffer by dt each horizon step and
    # appends it as an extra channel for time-aware models
    encode_obs_time: bool = False
    dt: float = 0.05
    # M state trajectories per control sequence for stochastic dynamics, with
    # a discounted cost-variance penalty (reference ctor :84-86,:108-112; the
    # reference's own M>1 math is vestigial — this implements the documented
    # intent: cost = mean over M + rollout_var_cost * discounted var over M)
    rollout_samples: int = 1  # M
    rollout_var_cost: float = 0.0
    rollout_var_discount: float = 0.95
    # lax.scan unroll factor for the horizon rollout: >1 lets XLA
    # co-schedule consecutive dynamics steps (more fusion freedom, bigger
    # program). Semantics-neutral; measured verdict in PERF.md.
    scan_unroll: int = 1
    # pass the horizon step index to the dynamics as a third argument
    # (reference step_dependent_dynamics, :82,:187-191)
    step_dependent_dynamics: bool = False
    # number of leading actions returned by command (reference u_per_command,
    # :81,:217-224; 1 returns shape [nu] like the reference default)
    u_per_command: int = 1


class MPPIParams(NamedTuple):
    """Array-valued planner parameters (a pytree)."""

    noise_sigma: jnp.ndarray  # [nu, nu]
    noise_sigma_inv: jnp.ndarray  # [nu, nu]
    noise_chol: jnp.ndarray  # [nu, nu] lower-triangular
    u_init: jnp.ndarray  # [nu]


def make_mppi_params(noise_sigma: jnp.ndarray, u_init: Optional[jnp.ndarray] = None) -> MPPIParams:
    noise_sigma = jnp.atleast_2d(jnp.asarray(noise_sigma))
    nu = noise_sigma.shape[0]
    return MPPIParams(
        noise_sigma=noise_sigma,
        noise_sigma_inv=jnp.linalg.inv(noise_sigma),
        noise_chol=jnp.linalg.cholesky(noise_sigma),
        u_init=jnp.zeros(nu, noise_sigma.dtype) if u_init is None else u_init,
    )


def default_noise_sigma(nu: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Sigma = sigma^2 * (0.5 I + 0.5 * 11^T) (mppi_with_model.py:66-70)."""
    gamma = sigma**2
    off = 0.5 * gamma
    return jnp.ones((nu, nu), dtype) * off + jnp.eye(nu, dtype=dtype) * (gamma - off)


def mppi_reset(key: jax.Array, cfg: MPPIConfig, params: MPPIParams) -> jnp.ndarray:
    """Fresh control sequence U ~ N(0, Sigma) per timestep (:163-164, :230)."""
    z = jax.random.normal(key, (cfg.horizon, cfg.nu), dtype=params.noise_chol.dtype)
    return z @ params.noise_chol.T


def _sample_noise(key, cfg: MPPIConfig, params: MPPIParams) -> jnp.ndarray:
    z = jax.random.normal(
        key, (cfg.num_samples, cfg.horizon, cfg.nu), dtype=params.noise_chol.dtype
    )
    return z @ params.noise_chol.T


def _stack_windows(full: jnp.ndarray, T: int, A: int) -> jnp.ndarray:
    """All T sliding action windows of ``full`` [K, A-1+T, nu] at once:
    windows[k, t, a] = full[k, t + a] -> [K, T, A, nu]. Assembled as A
    contiguous shifted slices, NOT an advanced-index gather — the gather
    lowers to a per-row copy under vmap on TPU (measured 3x slowdown in
    the planner's window build, artifacts/bench_precompute_r3.json)."""
    return jnp.stack([full[:, a : a + T, :] for a in range(A)], axis=2)


def _pvary(x, axis):
    """Promote x to device-varying over ``axis`` names it isn't varying on
    yet (``lax.pcast`` itself rejects already-varying inputs)."""
    names = axis if isinstance(axis, tuple) else (axis,)
    vma = getattr(jax.typeof(x), "vma", frozenset())
    missing = tuple(n for n in names if n not in vma)
    return jax.lax.pcast(x, missing, to="varying") if missing else x


def mppi_command_core(
    cfg: MPPIConfig,
    params: MPPIParams,
    dynamics_fn: Callable,  # (state [K,nx], action_window [K,A,nu]) -> [K,nx]
    running_cost_fn: Callable,  # (state [K,nx], action [K,nu], *cost_args) -> [K]
    U: jnp.ndarray,  # [T, nu] — ALREADY receding-horizon shifted
    obs: jnp.ndarray,  # [nx] current observation
    action_buffer: jnp.ndarray,  # [A, nu] action history (env units)
    noise: jnp.ndarray,  # [K(_local), T, nu] pre-sampled noise
    terminal_state_cost: Optional[Callable] = None,
    dynamics_carry_init: Optional[Callable] = None,
    time_buffer: Optional[jnp.ndarray] = None,  # [A] ages, encode_obs_time
    cost_args: tuple = (),  # extra replicated args for running_cost_fn
    axis=None,  # collective axis name(s) when running inside shard_map
    window_encoder: Optional[Callable] = None,
):
    """The planning step given pre-sampled noise (steps 2-7 of the module
    docstring, minus the U shift and the noise draw).

    ``window_encoder`` hoists the dynamics model's action-window encoding
    out of the horizon scan: every candidate action is known BEFORE the
    rollout (step 3 — the windows are slices of one pre-built tensor), so a
    model whose window processing is state-independent (the NL flagship's
    reverse-GRU, w_nl.py:117-127) can encode all K x T windows in ONE
    batched call instead of T sequential ones inside the scan. When set,
    ``window_encoder(windows [K, T, A, nu(+age)]) -> ctx`` (pytree, leaves
    [K, T, ...]) runs once, and ``dynamics_fn(state, ctx_t)`` receives the
    per-step slice instead of the raw window. Incompatible with
    ``dynamics_carry_init`` (carried models encode history themselves).

    With ``axis=None`` this is the complete single-chip computation. Inside
    ``shard_map`` (parallel.sharding.make_k_sharded_mppi_command) the SAME
    code runs per device on its K/n-slice of ``noise``; the three softmax
    reductions become ``pmin``/``psum`` collectives and the null-action row
    is pinned to the globally-last rollout — every planner feature flag
    (sample_null_action, noise_abs_cost, encode_obs_time, M-samples,
    variance cost, step-dependent dynamics, u_per_command, terminal cost,
    carried dynamics) behaves identically in both regimes because it IS the
    same code.
    """
    T, nu = cfg.horizon, cfg.nu
    K = noise.shape[0]  # local K inside shard_map, global K otherwise
    A = action_buffer.shape[0]

    # 2. bound, recompute noise (:319-328); noise arrives pre-sampled
    perturbed = U[None] + noise
    if cfg.sample_null_action:
        if axis is None:
            perturbed = perturbed.at[K - 1].set(0.0)
        else:
            # zero the globally-last rollout: last local row of the last shard
            n_shards = cfg.num_samples // K
            last = (jnp.arange(K) == K - 1) & (jax.lax.axis_index(axis) == n_shards - 1)
            perturbed = jnp.where(last[:, None, None], 0.0, perturbed)
    perturbed = jnp.clip(perturbed * cfg.u_scale, cfg.u_min, cfg.u_max) / cfg.u_scale
    noise = perturbed - U[None]

    # action perturbation cost (:329-335)
    if cfg.noise_abs_cost:
        action_cost = cfg.lambda_ * jnp.abs(noise) @ params.noise_sigma_inv
    else:
        action_cost = cfg.lambda_ * noise @ params.noise_sigma_inv

    # 3. sliding action windows with prepended history (:256-277). The
    # window at step t is sliced out of ``full`` inside the scan — a
    # pre-gathered [T, K, A, nu] tensor would cost A x the HBM footprint of
    # the action sequences and starts spilling at the K~10^5 regime the
    # reference sweep contemplates (mppi_optim.yaml:12).
    scaled = perturbed * cfg.u_scale  # [K, T, nu] env units
    hist = jnp.broadcast_to(action_buffer[1:][None], (K, A - 1, nu))
    full = jnp.concatenate([hist, scaled], axis=1)  # [K, A-1+T, nu]

    def window_at(t):
        return lax.dynamic_slice_in_dim(full, t, A, axis=1)  # [K, A, nu]

    # 4. rollout (:271-296) as one scan over the horizon. With M > 1 the
    # batch fed to the dynamics is M*K (closures are batch-size-agnostic);
    # costs reshape to [M, K] for the mean/variance aggregation.
    M = cfg.rollout_samples
    state0 = jnp.broadcast_to(obs[None], (M * K,) + obs.shape)
    if axis is not None:
        # obs is replicated, so state0 starts device-INVARIANT; the rollout
        # carry becomes varying after one dynamics step (per-shard actions)
        # and shard_map's vma check rightly demands the initial carry match
        state0 = _pvary(state0, axis)

    def tile_window(window):
        return window if M == 1 else jnp.tile(window, (M, 1, 1))

    def call_dynamics(state, window, t):
        if cfg.step_dependent_dynamics:
            return dynamics_fn(state, window, t)
        return dynamics_fn(state, window)

    def cost_stats(c, t, cost_var):
        """Accumulate the per-step cost over M and the discounted variance
        (reference :290-292 intent)."""
        if M == 1:
            return c, cost_var
        cM = c.reshape(M, K)
        cost_var = cost_var + jnp.var(cM, axis=0) * cfg.rollout_var_discount**t
        return jnp.mean(cM, axis=0), cost_var

    def augment_window(window, ages):
        """Append the (shared) age channel to the action window (:282-287)."""
        if not cfg.encode_obs_time:
            return window
        a = jnp.broadcast_to(ages[None, :, None], (window.shape[0], A, 1))
        return jnp.concatenate([window, a.astype(window.dtype)], axis=2)

    def step_ages(ages):
        """time_buffer += dt; roll; newest age = 0 (:279-281)."""
        ages = ages + cfg.dt
        return jnp.roll(ages, -1).at[-1].set(0.0)

    ages0 = (
        time_buffer
        if time_buffer is not None
        else jnp.flip(jnp.arange(A, dtype=scaled.dtype)) * cfg.dt
    )

    ctx_scan = None
    if window_encoder is not None:
        assert dynamics_carry_init is None, (
            "window_encoder is for state-independent window encodings; "
            "carried dynamics encode history themselves"
        )
        # build every horizon window at once (_stack_windows). Costs A x
        # the HBM footprint of the action sequences plus the encoder's
        # activations at K*T rows — at the K~10^5 sweep regime prefer
        # window_encoder=None.
        windows_all = _stack_windows(full, T, A)  # [K, T, A, nu]
        if cfg.encode_obs_time:
            # the ages the scan would see at step t: ages0 advanced t+1
            # times (rollout_step advances BEFORE augmenting); T is static
            ages_list, ages_t = [], ages0
            for _ in range(T):
                ages_t = step_ages(ages_t)
                ages_list.append(ages_t)
            ages_all = jnp.stack(ages_list)  # [T, A]
            aug = jnp.broadcast_to(
                ages_all[None, :, :, None], (K, T, A, 1)
            ).astype(windows_all.dtype)
            windows_all = jnp.concatenate([windows_all, aug], axis=-1)
        ctx = window_encoder(windows_all)
        # time-leading for the scan; tile rows for the M trajectory samples
        ctx_scan = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, 0, 1)
            if M == 1
            else jnp.tile(
                jnp.moveaxis(x, 0, 1), (1, M) + (1,) * (x.ndim - 2)
            ),
            ctx,
        )

    var0 = jnp.zeros((K,), state0.dtype)
    if axis is not None and M > 1:
        var0 = _pvary(var0, axis)  # accumulates varying costs
    tidx = jnp.arange(T)
    # per-step states are only materialized when a terminal cost consumes
    # them — recording [T, M*K, nx] through the scan costs an HBM write per
    # step that matters at large K
    record_states = terminal_state_cost is not None

    def outputs(c, state):
        return (c, state) if record_states else (c, None)

    if dynamics_carry_init is None:

        def rollout_step(carry, xs):
            t, ctx_t = xs if ctx_scan is not None else (xs, None)
            window = window_at(t)
            state, ages, cost_var = carry
            ages = step_ages(ages)
            dyn_in = (
                ctx_t
                if ctx_t is not None
                else tile_window(augment_window(window, ages))
            )
            state = call_dynamics(state, dyn_in, t)
            u = tile_window(window)[:, -1, :]  # current executed action (:288)
            c = running_cost_fn(state, u, *cost_args)
            c, cost_var = cost_stats(c, t, cost_var)
            return (state, ages, cost_var), outputs(c, state)

        xs_scan = tidx if ctx_scan is None else (tidx, ctx_scan)
        (_, _, cost_var), (costs, states) = lax.scan(
            rollout_step, (state0, ages0, var0), xs_scan,
            unroll=cfg.scan_unroll,
        )
    else:

        def rollout_step_carried(carry, t):
            window = window_at(t)
            dyn_carry, state, ages, cost_var = carry
            ages = step_ages(ages)
            w = tile_window(augment_window(window, ages))
            if cfg.step_dependent_dynamics:
                dyn_carry, state = dynamics_fn(dyn_carry, state, w, t)
            else:
                dyn_carry, state = dynamics_fn(dyn_carry, state, w)
            c = running_cost_fn(state, tile_window(window)[:, -1, :], *cost_args)
            c, cost_var = cost_stats(c, t, cost_var)
            return (dyn_carry, state, ages, cost_var), outputs(c, state)

        dyn_carry0 = dynamics_carry_init(state0)
        if axis is not None:
            # a carry built from zeros/constants starts invariant even though
            # the rollout makes it varying — promote every leaf
            dyn_carry0 = jax.tree_util.tree_map(
                lambda x: _pvary(x, axis), dyn_carry0
            )
        (_, _, _, cost_var), (costs, states) = lax.scan(
            rollout_step_carried,
            (dyn_carry0, state0, ages0, var0),
            tidx,
            unroll=cfg.scan_unroll,
        )
    cost_total = jnp.sum(costs, axis=0)  # [K]

    if terminal_state_cost is not None:
        # states: [T, M*K, nx] -> per-M [K, T, nx]; actions [K, T, nu]
        # (:306-308); with M > 1 the terminal cost averages over the M
        # trajectory samples like the running cost. full[:, t+A-1] is the
        # step-t action, i.e. the scaled sequence itself.
        acts = scaled
        states_m = states.reshape(T, M, K, states.shape[-1])
        term = jax.vmap(
            lambda s: terminal_state_cost(jnp.swapaxes(s, 0, 1), acts), in_axes=1
        )(states_m)
        cost_total = cost_total + jnp.mean(term, axis=0)

    # discounted cost-variance penalty across the M rollouts (:108-112)
    cost_total = cost_total + cost_var * cfg.rollout_var_cost

    # 5. perturbation cost (:343-344)
    cost_total = cost_total + jnp.sum(U[None] * action_cost, axis=(1, 2))

    # 6. softmax weighting + control update (:210-216); under sharding the
    # three reductions are the only cross-device communication of the whole
    # planning step — two scalars (pmin, psum) and one [T, nu] psum on ICI
    if axis is None:
        beta = jnp.min(cost_total)
        weights = jnp.exp(-(cost_total - beta) / cfg.lambda_)
        omega = weights / jnp.sum(weights)
        U = U + jnp.sum(omega[:, None, None] * noise, axis=0)
    else:
        beta = jax.lax.pmin(jnp.min(cost_total), axis)
        weights = jnp.exp(-(cost_total - beta) / cfg.lambda_)
        omega = weights / jax.lax.psum(jnp.sum(weights), axis)
        U = U + jax.lax.psum(jnp.sum(omega[:, None, None] * noise, axis=0), axis)

    # 7. leading action(s), env units (:217-224)
    if cfg.u_per_command == 1:
        action = U[0] * cfg.u_scale
    else:
        action = U[: cfg.u_per_command] * cfg.u_scale
    aux = {"cost_total": cost_total, "omega": omega}
    return action, U, aux


def mppi_command(
    cfg: MPPIConfig,
    params: MPPIParams,
    dynamics_fn: Callable,  # (state [K,nx], action_window [K,A,nu]) -> [K,nx]
    running_cost_fn: Callable,  # (state [K,nx], action [K,nu]) -> cost [K]
    U: jnp.ndarray,  # [T, nu] carry
    obs: jnp.ndarray,  # [nx] current observation
    action_buffer: jnp.ndarray,  # [A, nu] action history (env units)
    key: jax.Array,
    terminal_state_cost: Optional[Callable] = None,
    dynamics_carry_init: Optional[Callable] = None,
    time_buffer: Optional[jnp.ndarray] = None,  # [A] ages, encode_obs_time
    cost_args: tuple = (),
    window_encoder: Optional[Callable] = None,
):
    """One planning step. Returns (action [nu] in env units, new U, aux).

    If ``dynamics_carry_init`` is given, the dynamics closure is stateful
    within the rollout: ``carry0 = dynamics_carry_init(state0)`` and
    ``dynamics_fn(carry, state, window) -> (carry, next_state)`` — used by
    history-conditioned models like the latent-ODE
    (models.latent_ode.make_carried_dynamics).

    ``window_encoder`` pre-encodes all K x T action windows in one batched
    call before the rollout scan (see mppi_command_core).
    """
    # 1. receding horizon shift
    U = jnp.roll(U, -1, axis=0).at[-1].set(params.u_init)
    noise = _sample_noise(key, cfg, params)
    return mppi_command_core(
        cfg, params, dynamics_fn, running_cost_fn, U, obs, action_buffer, noise,
        terminal_state_cost=terminal_state_cost,
        dynamics_carry_init=dynamics_carry_init,
        time_buffer=time_buffer,
        cost_args=cost_args,
        window_encoder=window_encoder,
    )


def mppi_rollout_states(
    cfg: MPPIConfig,
    dynamics_fn: Callable,
    obs: jnp.ndarray,
    U: jnp.ndarray,
    action_buffer: jnp.ndarray,
    num_rollouts: int = 1,
) -> jnp.ndarray:
    """Visualize the current plan: roll U (no noise) through the dynamics.

    Counterpart of MPPIDelay.get_rollouts (reference :358-381), generalized
    to the delay-aware window format.
    """
    A = action_buffer.shape[0]
    T = U.shape[0]
    scaled = jnp.broadcast_to(U[None] * cfg.u_scale, (num_rollouts, T, cfg.nu))
    hist = jnp.broadcast_to(action_buffer[1:][None], (num_rollouts, A - 1, cfg.nu))
    full = jnp.concatenate([hist, scaled], axis=1)
    windows = jnp.swapaxes(_stack_windows(full, T, A), 0, 1)  # [T, K, A, nu]
    state0 = jnp.broadcast_to(obs[None], (num_rollouts,) + obs.shape)

    def step(state, window):
        state = dynamics_fn(state, window)
        return state, state

    _, states = lax.scan(step, state0, windows)
    return jnp.swapaxes(states, 0, 1)  # [num_rollouts, T, nx]


def run_mppi(
    env,
    cfg: MPPIConfig,
    params: MPPIParams,
    make_dynamics: Callable,
    running_cost: Callable,
    model_params,
    key: jax.Array,
    retrain_dynamics: Optional[Callable] = None,
    retrain_after_iter: int = 50,
    iters: int = 200,
    action_buffer_size: int = 4,
    delay: int = 0,
):
    """Online MPPI control with periodic dynamics retraining.

    Working functional equivalent of reference planners/mppi_delay.py:
    384-410 ``run_mppi`` — unused dead code there, and not callable as
    written (it invokes ``mppi.command(state)`` without the action buffer
    its own class requires). Here: run the real environment under MPPI,
    ring-buffer the visited (obs, action) pairs exactly like the reference
    (pre-step obs + commanded action, cleared every cycle), and every
    ``retrain_after_iter`` steps hand the dataset to the host callback
    ``retrain_dynamics(dataset, model_params) -> model_params`` (arbitrary
    optimization allowed), after which the planner dynamics closure is
    rebuilt via ``make_dynamics(model_params)`` and the command re-jitted.

    The environment stepping matches the evaluation loop (single Euler step
    per dt, envs.base.env_step) with the standard delay buffer semantics
    (mppi_with_model.py:25-28 get_action). Returns ``(total_reward,
    dataset)`` with dataset [retrain_after_iter, n_obs + nu], as the
    reference does.
    """
    import numpy as np

    from ..envs.base import env_step

    spec = env.spec
    nx, nu = spec.n_obs, spec.m
    A = action_buffer_size

    def make_command(mp):
        dynamics = make_dynamics(mp)

        @jax.jit
        def command(U, obs, buffer, k):
            return mppi_command(cfg, params, dynamics, running_cost, U, obs, buffer, k)

        return command

    command = make_command(model_params)
    k_reset, k_u0, key = jax.random.split(key, 3)
    raw = env.reset(k_reset)
    U = mppi_reset(k_u0, cfg, params)
    buffer = jnp.zeros((A, nu))
    dataset = np.zeros((retrain_after_iter, nx + nu), dtype=np.float64)
    total_reward = 0.0
    for i in range(iters):
        obs = env.observe(raw)
        action, U, _ = command(U, obs, buffer, jax.random.fold_in(key, i))
        # delay buffer: the env executes the action commanded `delay` ticks ago
        buffer = jnp.roll(buffer, -1, axis=0).at[-1].set(action)
        applied = buffer[-(delay + 1)]
        raw = env_step(env, raw, applied, spec.dt)
        total_reward += float(env.diff_reward(env.observe(raw), applied))
        di = i % retrain_after_iter
        if di == 0 and i > 0 and retrain_dynamics is not None:
            model_params = retrain_dynamics(dataset, model_params)
            command = make_command(model_params)
            dataset[:] = 0.0
        dataset[di, :nx] = np.asarray(obs)
        dataset[di, nx:] = np.asarray(action)
    return total_reward, dataset

"""Multi-chip sharding: device meshes, sharded training steps, and a
K-sharded MPPI planner.

The reference has no distributed-tensor layer at all (SURVEY.md §2.4): its
parallelism is a CPU process pool over the experiment grid. The TPU-native
equivalents here are:

- data-parallel + tensor-parallel training over a ("dp", "tp") mesh:
  the batch shards over dp; the Laplace-representation MLP's hidden
  dimension shards over tp (weights annotated with NamedSharding, XLA
  inserts the all-reduces on ICI),
- the MPPI rollout batch K shards over all devices via ``shard_map`` with
  ``psum``/``pmin`` for the softmax-weight reduction — this is what scales
  the planner to the K=262144 regime contemplated by the reference's sweep
  (mppi_optim.yaml:12).

Pipeline/expert parallelism are not meaningful for these model sizes
(two-layer MLPs / GRUs, <100k params); dp x tp x K-sharding covers every
axis the workload has.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 2) -> Mesh:
    """Build a ("dp", "tp") mesh over the first n_devices devices."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    tp = min(tp, n)
    dp = n // tp
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _is_mlp_stack(node) -> bool:
    """A list of >=2 linear-layer dicts ({"w": 2-D, "b": 1-D}) — the shape
    models.common.mlp_init produces (NL's laplace_rep, NODE's ode_func)."""
    return (
        isinstance(node, (list, tuple))
        and len(node) >= 2
        and all(
            isinstance(el, dict)
            and set(el) == {"w", "b"}
            and getattr(el["w"], "ndim", 0) == 2
            for el in node
        )
    )


def derive_param_pspecs(params, tp_size: int = 2) -> dict:
    """Model-agnostic PartitionSpecs: every MLP stack in the tree gets
    Megatron-style alternating column/row tensor parallelism over "tp"
    (even layers shard the output dim + bias, odd layers shard the input
    dim; XLA inserts the all-reduce after each row-parallel layer).
    Everything else — GRU stacks (64-160 wide, not worth splitting gate
    blocks), scalars, embeddings — is replicated, i.e. dp-only.

    Layers whose to-be-sharded dim does not divide tp stay replicated.
    Models with no MLP stack (rnn / delta_t_rnn) come back fully
    replicated: data-parallel only, which make_sharded_train_step handles
    identically (the batch still shards over dp); a log line records the
    fallback.
    """

    def spec_for_stack(stack):
        out = []
        for i, layer in enumerate(stack):
            w = layer["w"]
            if i % 2 == 0 and w.shape[1] % tp_size == 0:
                out.append({"w": P(None, "tp"), "b": P("tp")})
            elif i % 2 == 1 and w.shape[0] % tp_size == 0:
                out.append({"w": P("tp", None), "b": P()})
            else:
                out.append({"w": P(), "b": P()})
        return out

    found = [False]

    def walk(node):
        if _is_mlp_stack(node):
            found[0] = True
            return spec_for_stack(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return P()

    specs = walk(params)
    if not found[0]:
        import logging

        logging.getLogger(__name__).info(
            "derive_param_pspecs: no MLP stack found — params fully "
            "replicated (dp-only training)"
        )
    return specs


def nl_param_pspecs(params) -> dict:
    """Back-compat alias: the NL param tree's specs via the generic rule
    (laplace_rep is the one MLP stack; encoder GRU replicated)."""
    return derive_param_pspecs(params)


def shard_params(params, mesh: Mesh):
    tp = mesh.shape.get("tp", 1)
    specs = derive_param_pspecs(params, tp_size=tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_sharded_train_step(model_apply: Callable, optimizer, mesh: Mesh):
    """Jitted dp+tp training step: batch sharded over dp, NL hidden over tp.

    Gradients reduce over dp automatically (XLA inserts the psum for the
    mean-loss backward); tp-sharded weights get their activations
    all-reduced on ICI.
    """
    batch_sharding = NamedSharding(mesh, P("dp"))

    @partial(jax.jit)
    def step(params, opt_state, s0, a0, sn, ts):
        s0 = jax.lax.with_sharding_constraint(s0, batch_sharding)

        def loss_fn(p):
            pred = model_apply(p, s0, a0, ts)
            return jnp.mean((pred - (sn - s0)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_k_sharded_mppi_command(cfg, params, dynamics_fn, running_cost_fn, mesh: Mesh):
    """MPPI command with the K rollout batch sharded over every mesh device.

    Inside ``shard_map`` each device owns K/n rollouts; the softmax
    normalization needs two collectives (pmin for beta, psum for eta and the
    weighted noise sum) which ride ICI. Numerically identical to the
    single-chip planners.mppi_delay.mppi_command for the same per-shard
    noise draws.
    """
    n_dev = mesh.devices.size
    assert cfg.num_samples % n_dev == 0, "K must divide the device count"
    # the sharded rollout implements the DEFAULT planner configuration; the
    # extended feature flags of mppi_command are not wired here — fail loud
    # rather than silently diverge from the single-chip baseline
    unsupported = {
        "sample_null_action": cfg.sample_null_action,
        "noise_abs_cost": cfg.noise_abs_cost,
        "encode_obs_time": cfg.encode_obs_time,
        "rollout_samples>1": cfg.rollout_samples > 1,
        "rollout_var_cost": cfg.rollout_var_cost != 0.0,
        "step_dependent_dynamics": cfg.step_dependent_dynamics,
        "u_per_command>1": cfg.u_per_command > 1,
    }
    bad = [k for k, v in unsupported.items() if v]
    if bad:
        raise NotImplementedError(
            f"K-sharded MPPI does not implement: {bad}; use the single-chip "
            "planners.mppi_delay.mppi_command (vmap/shard the caller instead)"
        )
    axis = ("dp", "tp")

    def local_command(U, obs, action_buffer, noise_local):
        K_local, T, nu = noise_local.shape
        A = action_buffer.shape[0]
        perturbed = U[None] + noise_local
        perturbed = jnp.clip(perturbed * cfg.u_scale, cfg.u_min, cfg.u_max) / cfg.u_scale
        noise_local = perturbed - U[None]
        action_cost = cfg.lambda_ * noise_local @ params.noise_sigma_inv

        scaled = perturbed * cfg.u_scale
        hist = jnp.broadcast_to(action_buffer[1:][None], (K_local, A - 1, nu))
        full = jnp.concatenate([hist, scaled], axis=1)
        state0 = jnp.broadcast_to(obs[None], (K_local,) + obs.shape)
        # obs is replicated, so state0 starts device-INVARIANT; the rollout
        # scan's carry becomes varying after one dynamics step (per-shard
        # actions), and shard_map's vma check rightly demands the initial
        # carry match — promote it explicitly
        state0 = jax.lax.pcast(state0, axis, to="varying")

        def rollout_step(state, t):
            # slice the window per step (planners/mppi_delay.py:150-157 —
            # a pre-gathered [T, K, A, nu] tensor spills at large K, the
            # regime this sharded path exists for)
            window = jax.lax.dynamic_slice_in_dim(full, t, A, axis=1)
            state = dynamics_fn(state, window)
            return state, running_cost_fn(state, window[:, -1, :])

        _, costs = jax.lax.scan(rollout_step, state0, jnp.arange(T))
        cost = jnp.sum(costs, axis=0) + jnp.sum(U[None] * action_cost, axis=(1, 2))

        beta = jax.lax.pmin(jnp.min(cost), axis)
        w = jnp.exp(-(cost - beta) / cfg.lambda_)
        eta = jax.lax.psum(jnp.sum(w), axis)
        omega = w / eta
        dU = jax.lax.psum(jnp.sum(omega[:, None, None] * noise_local, axis=0), axis)
        U_new = U + dU
        return U_new, U_new[0] * cfg.u_scale

    from jax import shard_map

    sharded = shard_map(
        local_command,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(("dp", "tp"))),
        out_specs=(P(), P()),
    )

    def command(U, obs, action_buffer, key):
        z = jax.random.normal(
            key, (cfg.num_samples, cfg.horizon, cfg.nu), dtype=params.noise_chol.dtype
        )
        noise = z @ params.noise_chol.T
        U = jnp.roll(U, -1, axis=0).at[-1].set(params.u_init)
        U_new, action = sharded(U, obs, action_buffer, noise)
        return action, U_new

    return command

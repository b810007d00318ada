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


def make_k_sharded_mppi_command(
    cfg,
    params,
    dynamics_fn,
    running_cost_fn,
    mesh: Mesh,
    terminal_state_cost=None,
    dynamics_carry_init=None,
    window_encoder=None,
):
    """MPPI command with the K rollout batch sharded over every mesh device.

    Inside ``shard_map`` each device owns K/n rollouts and runs the SAME
    planning code as the single chip — planners.mppi_delay.mppi_command_core
    with ``axis`` set, so every planner feature flag (null action, abs-noise
    cost, encode_obs_time, M-samples + variance cost, step-dependent
    dynamics, u_per_command, terminal cost, carried dynamics) is supported
    identically. The softmax normalization needs three collectives (pmin for
    beta, psum for eta and the weighted noise sum) which ride ICI.
    Numerically identical to the single-chip command for the same noise
    draw: the [K, T, nu] noise tensor is sampled globally and sharded by
    ``in_specs``, so sharded-vs-single results match to reduction rounding.

    Returned signature matches mppi_command minus the key-internal noise:
    ``command(U, obs, action_buffer, key, time_buffer=None, cost_args=())
    -> (action, U_new, aux)`` with aux's per-rollout fields K-sharded.
    """
    n_dev = mesh.devices.size
    assert cfg.num_samples % n_dev == 0, "device count must divide K (num_samples)"
    axis = tuple(mesh.axis_names)

    def local_command(U, obs, action_buffer, time_buffer, noise_local, cost_args):
        from ..planners.mppi_delay import mppi_command_core

        return mppi_command_core(
            cfg, params, dynamics_fn, running_cost_fn,
            U, obs, action_buffer, noise_local,
            terminal_state_cost=terminal_state_cost,
            dynamics_carry_init=dynamics_carry_init,
            time_buffer=time_buffer,
            cost_args=cost_args,
            axis=axis,
            # per-device: encodes only the local K/n-slice of windows
            window_encoder=window_encoder,
        )

    from jax import shard_map

    sharded = shard_map(
        local_command,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P()),
        out_specs=(P(), P(), {"cost_total": P(axis), "omega": P(axis)}),
    )

    def command(U, obs, action_buffer, key, time_buffer=None, cost_args=()):
        # draw through the planner's own sampler so a future change to the
        # noise distribution can't silently break sharded==single parity
        from ..planners.mppi_delay import _sample_noise

        noise = _sample_noise(key, cfg, params)
        U = jnp.roll(U, -1, axis=0).at[-1].set(params.u_init)
        return sharded(U, obs, action_buffer, time_buffer, noise, cost_args)

    return command


def make_grid_sharded_episodes(
    env,
    dynamics_fn,
    mppi_cfg,
    mppi_params,
    settings,
    mesh: Mesh,
    terminal_state_cost=None,
    dynamics_carry_init=None,
):
    """Full control episodes sharded over a 2-D ``("seeds", "k")`` mesh:
    independent seed-episodes spread over the "seeds" axis while EACH
    episode's K rollout batch shards over the "k" axis.

    This composes the two parallelism regimes evaluate_policy exposes
    separately (``shard_seeds`` — XLA-partitioned vmap; ``shard_rollouts``
    — K-sharded shard_map run sequentially per seed): on a pod slice the
    evaluation grid and the big-K planner scale on orthogonal mesh axes,
    the TPU-native replacement for the reference's 12-worker eval pool
    (run_exp_multi.py:144-165) crossed with its K-batched planner
    (planners/mppi_delay.py:232-313).

    Design: ONE ``shard_map`` over both axes wraps the whole episode batch.
    Each device owns S/n_s seeds x K/n_k rollouts; the planner's softmax
    collectives (pmin/psum in mppi_command_core) reduce over "k" only, so
    episode state stays private to a seed while every k-group's devices
    hold identical replicas of it (the per-step env integration is
    recomputed per k-shard — trivially cheap next to the K/n_k rollouts).
    The [K, T, nu] noise tensor is drawn per (seed, step) from the
    episode's own key stream and every k-shard slices its block, so the
    planned actions match the single-chip episode exactly (same draw, same
    order; only the cost-reduction rounding differs).

    Returns a jitted ``episodes(keys [S, 2]) -> (totals [S], records)``
    with outputs sharded over "seeds".
    """
    from ..planners.mppi_delay import _sample_noise, mppi_command_core
    from ..training.rollout import (
        build_goal_running_cost,
        build_running_cost,
        make_episode_fn,
    )

    assert set(mesh.axis_names) == {"seeds", "k"}, mesh.axis_names
    n_k = mesh.shape["k"]
    assert mppi_cfg.num_samples % n_k == 0, (
        "k-axis size must divide K (num_samples)"
    )
    k_local = mppi_cfg.num_samples // n_k

    cost_fn = (
        build_goal_running_cost(env)
        if settings.change_goal
        else build_running_cost(env, state_constraint=settings.state_constraint)
    )

    def command(U, obs, action_buffer, key, time_buffer=None, cost_args=()):
        noise = _sample_noise(key, mppi_cfg, mppi_params)  # global K draw
        i_k = jax.lax.axis_index("k")
        noise_local = jax.lax.dynamic_slice_in_dim(
            noise, i_k * k_local, k_local, axis=0
        )
        U = jnp.roll(U, -1, axis=0).at[-1].set(mppi_params.u_init)
        return mppi_command_core(
            mppi_cfg, mppi_params, dynamics_fn, cost_fn,
            U, obs, action_buffer, noise_local,
            terminal_state_cost=terminal_state_cost,
            dynamics_carry_init=dynamics_carry_init,
            time_buffer=time_buffer,
            cost_args=cost_args,
            axis=("k",),
        )

    episode = make_episode_fn(
        env, dynamics_fn, mppi_cfg, mppi_params, settings,
        dynamics_carry_init=dynamics_carry_init, command_fn=command,
        vary_axis="seeds",
    )

    def local_batch(keys_local):
        return jax.vmap(episode)(keys_local)

    from jax import shard_map

    sharded = shard_map(
        local_batch,
        mesh=mesh,
        in_specs=(P("seeds"),),
        out_specs=(P("seeds"), P("seeds")),
    )
    return jax.jit(sharded)

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


def nl_param_pspecs(params) -> dict:
    """PartitionSpecs for NL-model params: shard the Laplace MLP's hidden
    dimension over tp (layer0 output dim, layer1 both dims, layer2 input
    dim); everything else replicated."""

    def replicate(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    specs = replicate(params)
    if "laplace_rep" in params:
        mlp = params["laplace_rep"]
        mlp_specs = [dict(s) for s in replicate(mlp)]
        if len(mlp) >= 3:
            mlp_specs[0]["w"] = P(None, "tp")
            mlp_specs[0]["b"] = P("tp")
            mlp_specs[1]["w"] = P("tp", None)
            mlp_specs[1]["b"] = P()
            mlp_specs[2]["w"] = P(None, "tp")
            mlp_specs[2]["b"] = P("tp")
        specs = dict(specs)
        specs["laplace_rep"] = mlp_specs
    return specs


def shard_params(params, mesh: Mesh):
    specs = nl_param_pspecs(params)
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
        # the GRU scan inside the learned dynamics initializes its carry
        # from a replicated zero while xs are per-shard; disable the
        # varying-manual-axes check rather than pcast-ing inside the model
        check_vma=False,
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

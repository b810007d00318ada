"""Uncertainty-aware function approximators for the ODE-RL stack.

Pure-function rebuilds of reference envs/oderl/utils/{bnn,enn,benn,ibnn,
dropout_bnn}.py. Every family is a frozen ``ApproxNet`` of pure functions:

    params = net.init(key)
    noise  = net.draw_noise(params, key, L)   # None for deterministic draws
    y      = net.apply(params, x, noise)      # x [L,N,n_in] -> [L,N,n_out]
    kl     = net.kl(params)                   # scalar (0 where not defined)

The function-draw dimension L rides a leading batch axis (the reference
closes over per-draw weights in Python closures; here a draw is data —
noise tensors or member indices — so the same jitted apply serves any L and
everything batches onto the MXU as one einsum per layer). Ensemble members
live on axis 0 of the ensemble params (vmapped init), matching the
reference's [Nens, in, out] weight layout (enn.py:36-38).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

_ACTS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "linear": lambda x: x,
}


def get_act(name: str) -> Callable:
    """reference envs/oderl/utils/utils.py get_act."""
    return _ACTS[name]


@dataclass(frozen=True)
class ApproxNet:
    name: str
    init: Callable  # key -> params
    apply: Callable  # (params, x [L,N,in], noise) -> [L,N,out]
    draw_noise: Callable  # (params, key, L) -> noise pytree or None
    kl: Callable  # params -> scalar
    shuffle: Callable  # (params, key) -> params (permute ensemble members)
    n_ens: int = 1
    extras: Any = None  # family-specific callables (e.g. EPNN get_probs)


def _layer_dims(n_in, n_out, n_hid_layers, n_hidden):
    dims = [n_in] + n_hid_layers * [n_hidden] + [n_out]
    return list(zip(dims[:-1], dims[1:]))


def _init_layer(key, n_in, n_out, gain=1.0):
    """Xavier-uniform weight + fan-in-bounded uniform bias
    (enn.py:49-56 / bnn.py:74-81)."""
    k_w, k_b = jax.random.split(key)
    a = gain * math.sqrt(6.0 / (n_in + n_out))
    W = jax.random.uniform(k_w, (n_in, n_out), minval=-a, maxval=a)
    bound = 1.0 / math.sqrt(n_in)
    b = jax.random.uniform(k_b, (1, n_out), minval=-bound, maxval=bound)
    return {"W": W, "b": b}


def _acts_for(n_hid_layers, n_layers, act):
    return [get_act(act) if i < n_hid_layers else get_act("linear") for i in range(n_layers)]


# ---------------------------------------------------------------------------
# Plain MLP / variational BNN (reference bnn.py)
# ---------------------------------------------------------------------------

def make_mlp(n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu") -> ApproxNet:
    """Deterministic MLP — the reference BNN with bnn=False (used for the
    policy and value nets, ctrl/policy.py:18, ctrl/ctrl.py:47-53)."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)

    def init(key):
        keys = jax.random.split(key, len(shapes))
        return [_init_layer(k, i, o) for k, (i, o) in zip(keys, shapes)]

    def apply(params, x, noise=None):
        for p, a in zip(params, acts):
            x = a(x @ p["W"] + p["b"])
        return x

    return ApproxNet(
        name="mlp", init=init, apply=apply,
        draw_noise=lambda params, key, L: None,
        kl=lambda params: jnp.zeros(()),
        shuffle=lambda params, key: params,
    )


def make_bnn(n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu",
             logsig0=-3.0) -> ApproxNet:
    """Mean-field variational BNN (bnn.py with bnn=True): every weight/bias
    has (mu, logsig); a function draw samples W = mu + eps * softplus-sig;
    kl() is KL(q || N(0,1)) summed over parameters (bnn.py:159-171)."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)

    def init(key):
        keys = jax.random.split(key, 2 * len(shapes))
        layers = []
        for j, (i, o) in enumerate(shapes):
            mu = _init_layer(keys[2 * j], i, o)
            ls_w = jax.random.uniform(keys[2 * j + 1], (i, o),
                                      minval=logsig0 - 1, maxval=logsig0 + 1)
            ls_b = jax.random.uniform(jax.random.fold_in(keys[2 * j + 1], 1),
                                      (1, o), minval=logsig0 - 1, maxval=logsig0 + 1)
            layers.append({"W_mu": mu["W"], "b_mu": mu["b"],
                           "W_ls": ls_w, "b_ls": ls_b})
        return layers

    def _sig(logsig):
        return jnp.log1p(jnp.exp(logsig))  # softplus (bnn.py:70-72)

    def draw_noise(params, key, L):
        noise = []
        for j, p in enumerate(params):
            k = jax.random.fold_in(key, j)
            kw, kb = jax.random.split(k)
            noise.append({
                "W": jax.random.normal(kw, (L,) + p["W_mu"].shape),
                "b": jax.random.normal(kb, (L,) + p["b_mu"].shape),
            })
        return noise

    def apply(params, x, noise):
        # x [L,N,in]; per-draw weights [L,in,out] -> one batched matmul
        for p, nz, a in zip(params, noise, acts):
            W = p["W_mu"][None] + nz["W"] * _sig(p["W_ls"])[None]
            b = p["b_mu"][None] + nz["b"] * _sig(p["b_ls"])[None]
            x = a(jnp.einsum("lni,lio->lno", x, W) + b)
        return x

    def kl(params):
        total = 0.0
        for p in params:
            for mu, ls in ((p["W_mu"], p["W_ls"]), (p["b_mu"], p["b_ls"])):
                sig = _sig(ls)
                total = total + jnp.sum(
                    jnp.log(1.0 / sig) + (sig**2 + mu**2) / 2.0 - 0.5
                )
        return total

    return ApproxNet(
        name="bnn", init=init, apply=apply, draw_noise=draw_noise, kl=kl,
        shuffle=lambda params, key: params,
    )


# ---------------------------------------------------------------------------
# Deep ensembles (reference enn.py ENN / EPNN)
# ---------------------------------------------------------------------------

def _ens_apply(acts):
    def apply(params, x, noise=None):
        # x [L,N,in] with L == n_ens; per-member weights (enn.py:128-138)
        for p, a in zip(params, acts):
            x = a(jnp.einsum("lni,lio->lno", x, p["W"]) + p["b"])
        return x

    return apply


def _ens_shuffle(params, key):
    n_ens = params[0]["W"].shape[0]
    perm = jax.random.permutation(key, n_ens)
    return jax.tree_util.tree_map(lambda w: w[perm], params)


def make_enn(n_ens, n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu") -> ApproxNet:
    """Deep ensemble: n_ens independent MLPs, weights stacked on axis 0
    (enn.py:95-143). A function draw IS the ensemble — L must equal n_ens."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)

    def init(key):
        member_keys = jax.random.split(key, n_ens)

        def init_one(k):
            ks = jax.random.split(k, len(shapes))
            return [_init_layer(kk, i, o) for kk, (i, o) in zip(ks, shapes)]

        return jax.vmap(init_one)(member_keys)

    return ApproxNet(
        name="enn", init=init, apply=_ens_apply(acts),
        draw_noise=lambda params, key, L: None,
        kl=lambda params: jnp.zeros(()),
        shuffle=_ens_shuffle, n_ens=n_ens,
    )


def make_epnn(n_ens, n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu") -> ApproxNet:
    """Probabilistic ensemble (PETS): each member outputs (mean, logvar)
    with learnable logvar bounds applied through the double-softplus clamp
    (enn.py:146-203); a draw samples mean + eps * sig."""
    shapes = _layer_dims(n_in, 2 * n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)
    base_apply = _ens_apply(acts)

    def init(key):
        member_keys = jax.random.split(key, n_ens)

        def init_one(k):
            ks = jax.random.split(k, len(shapes))
            return [_init_layer(kk, i, o) for kk, (i, o) in zip(ks, shapes)]

        return {
            "layers": jax.vmap(init_one)(member_keys),
            "max_logsig": jnp.ones(n_out),
            "min_logsig": -2.0 * jnp.ones(n_out),
        }

    def get_probs(params, x):
        out = base_apply(params["layers"], x)
        mean, logvar = out[..., :n_out], out[..., n_out:]
        logvar = params["max_logsig"] - jax.nn.softplus(params["max_logsig"] - logvar)
        logvar = params["min_logsig"] + jax.nn.softplus(logvar - params["min_logsig"])
        return mean, jnp.exp(logvar)

    def draw_noise(params, key, L):
        return key  # per-draw Gaussian noise is sampled inside apply

    def apply(params, x, noise):
        mean, sig = get_probs(params, x)
        eps = jax.random.normal(noise, mean.shape) if noise is not None else 0.0
        return mean + eps * sig

    def shuffle(params, key):
        return {**params, "layers": _ens_shuffle(params["layers"], key)}

    return ApproxNet(
        name="epnn", init=init, apply=apply, draw_noise=draw_noise,
        kl=lambda params: jnp.zeros(()),
        shuffle=shuffle, n_ens=n_ens,
        extras={"get_probs": get_probs},
    )


# ---------------------------------------------------------------------------
# Batch ensemble (reference benn.py)
# ---------------------------------------------------------------------------

def make_benn(n_ens, n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu") -> ApproxNet:
    """Batch ensemble: one shared weight matrix per layer plus rank-1 fast
    weights r (input scale) and s (output scale) per member; member m
    computes act(((x * r_m) @ W + b) * s_m) (benn.py:69-84)."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)

    def init(key):
        layers = []
        for j, (i, o) in enumerate(shapes):
            k = jax.random.fold_in(key, j)
            k1, k2, k3 = jax.random.split(k, 3)
            p = _init_layer(k1, i, o)
            p["r"] = 1.0 + 0.25 * jax.random.normal(k2, (n_ens, 1, i))
            p["s"] = 1.0 + 0.25 * jax.random.normal(k3, (n_ens, 1, o))
            layers.append(p)
        return layers

    def apply(params, x, noise=None):
        for p, a in zip(params, acts):
            x = a(((x * p["r"]) @ p["W"] + p["b"]) * p["s"])
        return x

    def shuffle(params, key):
        perm = jax.random.permutation(key, n_ens)
        return [
            {**p, "r": p["r"][perm], "s": p["s"][perm]} for p in params
        ]

    return ApproxNet(
        name="benn", init=init, apply=apply,
        draw_noise=lambda params, key, L: None,
        kl=lambda params: jnp.zeros(()),
        shuffle=shuffle, n_ens=n_ens,
    )


# ---------------------------------------------------------------------------
# Implicit BNN (reference ibnn.py)
# ---------------------------------------------------------------------------

def make_ibnn(n_ens, n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu") -> ApproxNet:
    """Implicit BNN: shared weights; per-member multiplicative input noise
    z = z_mu + eps * (exp(z_logsig) + 1e-6) at every layer (ibnn.py:79-106);
    kl() compares the member-aggregated z distribution to N(1, 1)
    (ibnn.py:113-122). L must be a multiple of n_ens."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)
    in_dims = [i for i, _ in shapes]

    def init(key):
        layers = []
        for j, (i, o) in enumerate(shapes):
            k = jax.random.fold_in(key, j)
            k1, k2, k3 = jax.random.split(k, 3)
            p = _init_layer(k1, i, o)
            p["z_mu"] = 1.0 + 0.25 * jax.random.normal(k2, (n_ens, 1, i))
            p["z_logsig"] = -2.0 + 0.01 * jax.random.normal(k3, (n_ens, 1, i))
            layers.append(p)
        return layers

    def draw_noise(params, key, L):
        return [
            jax.random.normal(jax.random.fold_in(key, j), (L, 1, d))
            for j, d in enumerate(in_dims)
        ]

    def _z(p, eps):
        # eps [L,1,in] -> [L/n_ens, n_ens, 1, in] pairs with members
        sig = jnp.exp(p["z_logsig"]) + 1e-6
        e = eps.reshape((-1,) + p["z_mu"].shape)
        z = p["z_mu"][None] + e * sig[None]
        return z.reshape(eps.shape)

    def apply(params, x, noise):
        for p, eps, a in zip(params, noise, acts):
            x = a((x * _z(p, eps)) @ p["W"] + p["b"])
        return x

    def kl(params):
        total = 0.0
        for p in params:
            mu = jnp.mean(p["z_mu"], axis=0)[0]
            sig = jnp.sqrt(jnp.mean((jnp.exp(p["z_logsig"]) + 1e-6) ** 2, axis=0)[0])
            total = total + jnp.sum(
                jnp.log(1.0 / sig) + (sig**2 + (mu - 1.0) ** 2) / 2.0 - 0.5
            )
        return total

    def shuffle(params, key):
        perm = jax.random.permutation(key, n_ens)
        return [
            {**p, "z_mu": p["z_mu"][perm], "z_logsig": p["z_logsig"][perm]}
            for p in params
        ]

    return ApproxNet(
        name="ibnn", init=init, apply=apply, draw_noise=draw_noise, kl=kl,
        shuffle=shuffle, n_ens=n_ens,
    )


# ---------------------------------------------------------------------------
# MC dropout (reference dropout_bnn.py)
# ---------------------------------------------------------------------------

def make_dropout_bnn(n_in, n_out, n_hid_layers=2, n_hidden=100, act="relu",
                     dropout_rate=0.05) -> ApproxNet:
    """MC-dropout BNN: a function draw is a set of per-layer Bernoulli masks
    held fixed along the trajectory (dropout_bnn.py; DeepPILCO uses this)."""
    shapes = _layer_dims(n_in, n_out, n_hid_layers, n_hidden)
    acts = _acts_for(n_hid_layers, len(shapes), act)
    hid_dims = [o for _, o in shapes[:-1]]

    def init(key):
        keys = jax.random.split(key, len(shapes))
        return [_init_layer(k, i, o) for k, (i, o) in zip(keys, shapes)]

    def draw_noise(params, key, L):
        keep = 1.0 - dropout_rate
        masks = []
        for j, d in enumerate(hid_dims):
            k = jax.random.fold_in(key, j)
            masks.append(
                jax.random.bernoulli(k, keep, (L, 1, d)).astype(jnp.float32) / keep
            )
        return masks

    def apply(params, x, noise):
        for j, (p, a) in enumerate(zip(params, acts)):
            x = a(x @ p["W"] + p["b"])
            if j < len(hid_dims) and noise is not None:
                x = x * noise[j]
        return x

    return ApproxNet(
        name="dropout_bnn", init=init, apply=apply, draw_noise=draw_noise,
        kl=lambda params: jnp.zeros(()),
        shuffle=lambda params, key: params,
    )

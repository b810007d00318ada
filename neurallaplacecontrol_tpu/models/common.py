"""Shared neural-net primitives (raw-pytree params, no framework).

Parameters are plain nested dicts of jnp arrays so sharding annotations,
serialization, and surgery stay trivial. Initializers follow the reference's
choices: xavier-uniform for explicitly-initialized linear weights
(w_nl.py:23,48-50), PyTorch-default U(-1/sqrt(fan), 1/sqrt(fan)) elsewhere.

The GRU uses the standard gate equations (reset/update/candidate with the
candidate's hidden path gated by reset) and runs as a ``lax.scan`` over time
— one fused step per timestep, batched over B, so XLA maps the three gate
matmuls onto the MXU as a single [B, 3H] product.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=dtype)


def linear_init(key, in_dim: int, out_dim: int, xavier: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    if xavier:
        bound = math.sqrt(6.0 / (in_dim + out_dim))
    else:
        bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": _uniform(kb, (out_dim,), 1.0 / math.sqrt(in_dim), dtype),
    }


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


def mlp_init(key, sizes: Sequence[int], xavier: bool = True, dtype=jnp.float32):
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        linear_init(k, sizes[i], sizes[i + 1], xavier=xavier, dtype=dtype)
        for i, k in enumerate(keys)
    ]


def mlp_apply_tanh(layers, x):
    """Linear-tanh stack with a linear final layer (w_nl.py:40-46 shape)."""
    for layer in layers[:-1]:
        x = jnp.tanh(linear_apply(layer, x))
    return linear_apply(layers[-1], x)


def gru_init(key, in_dim: int, hidden: int, num_layers: int = 1, dtype=jnp.float32):
    params = []
    for layer in range(num_layers):
        k = jax.random.fold_in(key, layer)
        k_ih, k_hh, k_bi, k_bh = jax.random.split(k, 4)
        d_in = in_dim if layer == 0 else hidden
        bound = 1.0 / math.sqrt(hidden)
        params.append(
            {
                "w_ih": _uniform(k_ih, (d_in, 3 * hidden), bound, dtype),
                "w_hh": _uniform(k_hh, (hidden, 3 * hidden), bound, dtype),
                "b_ih": _uniform(k_bi, (3 * hidden,), bound, dtype),
                "b_hh": _uniform(k_bh, (3 * hidden,), bound, dtype),
            }
        )
    return params


def gru_gates(gi, gh, h):
    """Gate nonlinearity shared by every GRU cell implementation (r/z/n
    block order; torch semantics — the candidate's hidden path is gated by
    reset AFTER the hidden matmul + ITS OWN bias). ops/quant.py's int8 cell
    reuses this so the gate math has exactly one home."""
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _gru_cell(p, h, x):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    return gru_gates(gi, gh, h)


def gru_apply(params, xs, unroll_limit: int = 8):
    """Run a (possibly multi-layer) GRU over ``xs`` [B, T, D].

    Returns the last-layer hidden state at the final timestep [B, H].

    For short static sequences (T <= unroll_limit — the action buffer is
    length 4) the recurrence is unrolled in Python and the input-side
    projections of each layer run as ONE [B, T, D] x [D, 3H] matmul instead
    of T scan steps; only the h @ w_hh chain stays sequential. This keeps
    the hidden state fused across steps instead of round-tripping a stacked
    [T, B, H] through HBM per layer — the GRU was ~75% of the NL forward at
    planner batch sizes before this.
    """
    B, T = xs.shape[0], xs.shape[1]
    if T <= unroll_limit:
        # step-synchronous stacked layers: at each step the layer chain runs
        # bottom-up on that step's input, so no [B, T, 3H] projection or
        # [T, B, H] layer output is ever materialized — peak live tensor is
        # one [B, 3H] gate block and the per-layer [B, H] carries
        hs = [
            jnp.zeros((B, p["w_hh"].shape[0]), dtype=xs.dtype) for p in params
        ]
        for t in range(T):
            x = xs[:, t]
            for li, p in enumerate(params):
                hs[li] = _gru_cell(p, hs[li], x)
                x = hs[li]
        return hs[-1]

    h_seq = xs
    for p in params:
        hidden = p["w_hh"].shape[0]
        h0 = jnp.zeros((B, hidden), dtype=xs.dtype)

        def step(h, x, p=p):
            h_new = _gru_cell(p, h, x)
            return h_new, h_new

        _, outs = lax.scan(step, h0, jnp.swapaxes(h_seq, 0, 1))
        h_seq = jnp.swapaxes(outs, 0, 1)
    return h_seq[:, -1, :]


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def cast_params(params, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

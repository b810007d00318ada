"""Explicit PRNG-key discipline.

The reference seeds three global RNGs (reference config.py:421-434
``seed_all``); here every sampling site takes an explicit ``jax.random`` key,
so experiments are reproducible per-task without global state and parallel
workers can never collide.
"""

from __future__ import annotations

import jax


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split_for(key: jax.Array, *names: str) -> dict:
    """Split a key into named subkeys: ``split_for(k, 'noise', 'reset')``."""
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}

"""Parameter-pytree checkpointing as .npz artifacts.

Replaces torch.save(state_dict) checkpoints (reference train_utils.py:
440-443, 489-490). Filenames encode the full task identity exactly like the
reference (:172-181) so trained models are load-or-train cached.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _path_part(p) -> str:
    # DictKey -> .key, SequenceKey -> .idx, GetAttrKey (namedtuples /
    # dataclass pytrees) -> .name
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten(params) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        "/".join(_path_part(p) for p in path): np.asarray(leaf)
        for path, leaf in flat
    }


def save_pytree(path, params) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(params))


def load_pytree(path, like):
    """Load into the structure of ``like`` (keys must match)."""
    with np.load(path) as z:
        flat = dict(z)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for p, leaf in leaves_with_path:
        key = "/".join(_path_part(q) for q in p)
        arr = flat[key]
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_sharded(path, params) -> str:
    """Orbax checkpoint of a (possibly mesh-sharded) params pytree.

    The production multi-chip path (SURVEY.md §5: checkpoint artifacts as
    sharded arrays instead of pickled .pt files): each host writes its own
    shards, no gather through host memory. The .npz path above stays the
    portable single-host format.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, params, force=True)
    return str(path)


def load_sharded(path, like=None, shardings=None):
    """Restore an orbax checkpoint; ``shardings`` (a pytree of NamedSharding)
    restores each leaf directly onto its mesh placement."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if shardings is not None:
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings
        )
        return ckptr.restore(Path(path).absolute(), restore_args=restore_args)
    return ckptr.restore(Path(path).absolute())


def model_checkpoint_name(
    model_name: str,
    env_name: str,
    delay: int,
    ts_grid: str,
    model_seed: int,
    train_with_expert: bool,
    training_epochs=None,
    samples_used=None,
) -> str:
    """Mirrors reference train_utils.py:172-180."""
    name = (
        f"{model_name}_{env_name}_delay-{delay}_ts-grid-{ts_grid}_{model_seed}"
        f"_train-with-expert-trajectories-{train_with_expert}"
    )
    if training_epochs is not None:
        name += f"_training_for_epochs-{training_epochs}"
    if samples_used is not None:
        name += f"_samples_used-{samples_used}"
    return name + ".npz"

"""Multi-chip parallelism: meshes, sharded train steps, K-sharded MPPI."""

from .sharding import (  # noqa: F401
    make_mesh,
    nl_param_pspecs,
    shard_params,
    make_sharded_train_step,
    make_grid_sharded_episodes,
    make_k_sharded_mppi_command,
)
from .multihost import initialize, process_slice, global_mesh  # noqa: F401

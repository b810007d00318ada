"""Data generation: synthetic batched integration, expert MPPI collection,
replay-buffer artifacts."""

from .synthetic import (  # noqa: F401
    generate_irregular_data,
    generate_irregular_data_delay,
    generate_irregular_data_delay_latent,
    generate_irregular_data_delay_time_multi,
    default_samples_per_dim,
)
from .collector import (  # noqa: F401
    collect_expert_data,
    load_expert_irregular_data_delay_time_multi,
)
from .replay import (  # noqa: F401
    replay_buffer_filename,
    save_replay_buffer,
    load_replay_buffer,
)
from .validation import (  # noqa: F401
    compute_val_data_delay,
    get_val_loss_delay_time_multi,
    get_val_loss_delay_precomputed,
)

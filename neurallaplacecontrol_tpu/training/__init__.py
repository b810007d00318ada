"""Training, evaluation, and on-device episode rollouts."""

from .rollout import (  # noqa: F401
    EpisodeSettings,
    EpisodeRecords,
    make_episode_fn,
    make_batched_episode_fn,
    build_learned_dynamics,
    build_oracle_dynamics,
    build_running_cost,
)
from .eval import evaluate_policy, EVAL_MODELS  # noqa: F401
from .train import train_model, make_optimizer, make_train_segment_fn  # noqa: F401,E402
from .ensemble import train_model_ensemble  # noqa: F401
from .sweep import SweepSpec, run_mppi_sweep  # noqa: F401

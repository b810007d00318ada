"""Shared utilities: PRNG discipline, structured result logging, timing."""

from .prng import key_from_seed, split_for  # noqa: F401
from .logging import setup_logger, JsonlWriter, results_table  # noqa: F401
from .timing import Timer  # noqa: F401

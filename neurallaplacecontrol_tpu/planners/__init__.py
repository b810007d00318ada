"""Planners: delay-aware MPPI."""

from .mppi_delay import (  # noqa: F401
    MPPIConfig,
    MPPIParams,
    make_mppi_params,
    default_noise_sigma,
    mppi_reset,
    mppi_command,
    mppi_command_core,
    mppi_rollout_states,
    run_mppi,
)

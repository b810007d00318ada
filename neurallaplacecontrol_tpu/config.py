"""Experiment configuration as a typed dataclass pytree.

Mirrors the reference's layered dict config (reference: config.py:9-75
``default_config`` and the argparse mirror at config.py:78-255) but as a frozen
dataclass with real booleans, plus helpers to build it from CLI arguments.
Unlike the reference there is no global mutable config object and no
stringly-typed bools; anything jitted receives only the fields it needs.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass(frozen=True)
class Config:
    """All experiment knobs. Defaults follow reference config.py:9-75."""

    # experiment grid
    seed_runs: int = 20
    seed_start: int = 0
    baselines: Sequence[str] = (
        "nl",
        "oracle",
        "random",
        "delta_t_rnn",
        "node",
        "latent_ode",
    )
    dt: float = 0.05

    # training
    learning_rate: float = 1e-4
    training_epochs: int = 10_000_000
    training_batch_size: int = 16
    iters_per_log: int = 500
    clip_grad_norm: float = 0.1
    # Reject-don't-clip guard for exploding batches (beyond-reference; the
    # reference trains its ILT heads in torch f64 where the dehoog/cme QD
    # rails never overflow — train_utils.py:407 clips but never rejects).
    # An update whose batch loss exceeds skip_factor x the previous
    # segment's MEDIAN loss (or is non-finite) is skipped outright: params
    # AND Adam moments stay untouched, so one railed f32 overflow batch
    # cannot yank a converged model off its basin (observed: dehoog
    # pendulum-d1, loss 4e-4 -> 1e18 kicks recurring from epoch ~22,
    # artifacts/ilt_train_r5/). None or 0 disables the factor cap
    # (non-finite losses are always skipped).
    training_loss_skip_factor: Optional[float] = 100.0
    normalize: bool = True
    normalize_time: bool = True
    train_dt_multiple: float = 1.0
    ts_grid: str = "exp"  # ['fixed', 'uniform', 'exp']
    train_samples_per_dim: int = 10
    weight_decay: float = 0.0
    lr_scheduler_step_size: int = 20
    lr_scheduler_gamma: float = 0.1
    use_lr_scheduler: bool = False
    iters_per_evaluation: float = 1e15
    end_training_after_seconds: Optional[float] = 180.0
    sweep_mode: bool = False
    training_use_only_samples: Optional[int] = None
    train_with_expert_trajectories: bool = True
    rand_sample: bool = True
    reuse_state_actions_when_sampling_times: bool = False

    # expert data collection
    collect_expert_samples: float = 1e6
    collect_expert_ts_grid: str = "exp"
    collect_expert_force_generate_new_data: bool = False
    collect_expert_random_action_noise: Optional[float] = 1.0
    collect_expert_cores_per_env_sampler: int = 20
    collect_expert_episodes_per_sampler_task: int = 1

    # model hyperparameters
    nl_ilt_algorithm: str = "fourier"
    nl_hidden_units: int = 128
    nl_s_recon_terms: int = 17
    # mixed precision for the NL matmul stack (GRU + trunk MLP): "bfloat16"
    # runs the network compute in bf16 with f32 accumulation on the MXU,
    # while normalization, sphere angles, and the ILT combine stay f32.
    # Measured on v5e: see artifacts/bench_bf16_r3.json; planning accuracy
    # is noise-dominated (tests/test_models.py::test_nl_bf16_compute)
    nl_compute_dtype: str = "float32"
    node_method: str = "euler"
    node_augment_dim: int = 1
    node_hidden_units: int = 270
    rnn_hidden_units: int = 160
    latent_ode_hidden_units: int = 128
    latent_ode_obsrv_std: float = 0.01

    # MPPI planner
    mppi_roll_outs: int = 1000
    mppi_time_steps: int = 40
    mppi_lambda: float = 1.0
    mppi_sigma: float = 1.0
    # lax.scan unroll factor for the planner's horizon rollout (semantics
    # neutral; measured verdict in PERF.md)
    mppi_scan_unroll: int = 1
    # run the NL planner dynamics through the single fused Pallas kernel
    # (ops.pallas_nl; TPU only, fourier ILT only — see scripts/bench_pallas.py
    # for the measured speedup); training still uses the XLA apply
    fused_nl_planner: bool = False
    # hoist the NL reverse-GRU action encoding out of the MPPI horizon scan:
    # all K x T candidate windows are known before the rollout, so they
    # encode in ONE batched call instead of T sequential ones
    # (planners.mppi_delay window_encoder; same math, different GEMM
    # batching — tests/test_precompute_planner.py pins parity). MEASURED
    # verdict on v5e (artifacts/bench_precompute_r3.json): stays OFF — the
    # [K*T, 3H] gate tensors spill to HBM while the in-scan batches stay
    # VMEM-resident and fuse with the decode (0.35x episode throughput at
    # the reference shape, 0.73x isolated at hidden=512)
    nl_planner_precompute: bool = False

    # episode / env protocol
    encode_obs_time: bool = False
    action_buffer_size: int = 4
    observation_noise: float = 0.0
    friction: bool = False

    # bookkeeping
    saved_models_path: str = "./saved_models/"
    offline_datasets_path: str = "./offlinedata/"
    log_folder: str = "logs"
    save_video: bool = False
    model_seed: int = 0
    multi_process_results: bool = True
    retrain: bool = False
    force_retrain: bool = False
    start_from_checkpoint: bool = True
    print_settings: bool = False

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def _add_bool_flag(parser: argparse.ArgumentParser, name: str, default: bool):
    parser.add_argument(
        f"--{name}",
        type=lambda v: v.lower() in ("true", "1", "yes"),
        default=default,
    )


def parse_args(argv: Optional[Sequence[str]] = None) -> Config:
    """Build a Config from CLI args (every scalar field is exposed)."""
    defaults = Config()
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        default = getattr(defaults, f.name)
        if f.type in ("bool",) or isinstance(default, bool):
            _add_bool_flag(parser, f.name, default)
        elif isinstance(default, int):
            parser.add_argument(f"--{f.name}", type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(f"--{f.name}", type=float, default=default)
        elif isinstance(default, str):
            parser.add_argument(f"--{f.name}", type=str, default=default)
        elif default is None:
            # Optional fields: respect the annotated scalar type so e.g.
            # --training_use_only_samples 1000 arrives as an int (a float
            # would crash slicing and leak '1000.0' into checkpoint names)
            opt_type = int if "int" in str(f.type) else float
            parser.add_argument(f"--{f.name}", type=opt_type, default=None)
        # sequences (baselines) are not exposed on the CLI
    ns, _ = parser.parse_known_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    overrides = {k: v for k, v in vars(ns).items() if k in known}
    return Config(**overrides)


def cme_reconstruction_terms() -> tuple:
    """Valid CME term counts (reference: config.py:278-418).

    The CME ILT only supports odd orders assembled from the published table;
    `snap_cme_terms` mirrors the snapping logic at reference w_nl.py:86-88.
    """
    base = tuple(range(3, 76))
    mid = tuple(range(101, 212, 10)) + (216,) + tuple(range(221, 392, 10)) + (396,)
    high = tuple(range(401, 482, 20)) + tuple(range(501, 1002, 20))
    return base + mid + high


def snap_cme_terms(s_recon_terms: int) -> int:
    """Snap a requested term count to a valid CME order (w_nl.py:86-88)."""
    import numpy as np

    terms = np.asarray(cme_reconstruction_terms())
    return int(terms[np.argmin(terms < s_recon_terms) - 2])

"""Trajectory and result plotting.

Replaces the plotting surface of the reference (baseline_models/
latent_ode_lib/plotting.py trajectory plots; process_results/plot_util.py
normalized-return constants live in results.process). Matplotlib Agg only —
no display server needed on a TPU host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_trajectories(ts, true_traj, pred_traj=None, dims: Optional[Sequence[int]] = None,
                      path: Optional[str] = None, title: str = ""):
    """Per-dimension true-vs-predicted trajectory panels
    (latent_ode_lib/plotting.py style). true/pred: [T, D] or [N, T, D]
    (first trajectory is drawn)."""
    plt = _plt()
    true_traj = np.asarray(true_traj)
    if true_traj.ndim == 3:
        true_traj = true_traj[0]
    if pred_traj is not None:
        pred_traj = np.asarray(pred_traj)
        if pred_traj.ndim == 3:
            pred_traj = pred_traj[0]
    ts = np.asarray(ts)
    dims = list(dims) if dims is not None else list(range(true_traj.shape[-1]))
    fig, axes = plt.subplots(len(dims), 1, figsize=(6, 2 * len(dims)), squeeze=False)
    for ax, d in zip(axes[:, 0], dims):
        ax.plot(ts, true_traj[:, d], "k-", lw=1.5, label="true")
        if pred_traj is not None:
            ax.plot(ts, pred_traj[:, d], "C0--", lw=1.5, label="pred")
        ax.set_ylabel(f"dim {d}")
    axes[0, 0].legend(loc="best")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig


def plot_episode_returns(records: Sequence[dict], path: Optional[str] = None):
    """Bar chart of mean episode return per (model, delay) from result
    records (the table of results.process as a figure)."""
    plt = _plt()
    by = {}
    for r in records:
        if r.get("errored"):
            continue
        by.setdefault((r["model_name"], r["delay"]), []).append(r["total_reward"])
    labels = [f"{m}\nd={d}" for (m, d) in by]
    means = [float(np.mean(v)) for v in by.values()]
    stds = [float(np.std(v)) for v in by.values()]
    fig, ax = plt.subplots(figsize=(max(6, len(labels)), 3.2))
    ax.bar(range(len(labels)), means, yerr=stds, color="#6080c0")
    ax.set_xticks(range(len(labels)), labels, fontsize=8)
    ax.set_ylabel("episode return")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig

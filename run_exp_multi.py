"""Full experiment grid driver: {envs} x {delays} x {models} x {seeds}.

Rebuild of reference run_exp_multi.py. The reference fans 1440 evaluation
tasks over a 12-worker CPU process pool (:144-165) and a separate training
pool (:103-132); here each (env, delay, model) task trains on-device and
evaluates ALL seeds in one vmapped episode batch, so the whole grid is a
simple sequential loop over compiled launches on a single chip (shard the
seed batch over a mesh for multi-chip, parallel.sharding).

Per-task exception quarantine mirrors :46-56/:82-92 — a failed cell logs
the traceback and records {"errored": True} instead of killing the run.

Usage:
    python run_exp_multi.py [--envs ...] [--delays 0,1,2,3]
                            [--models nl,oracle,random,...] [--retrain true]
Results land in logs/results.jsonl; summarize with
    python -m neurallaplacecontrol_tpu.results.summarize logs/results.jsonl
"""

import argparse
import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from neurallaplacecontrol_tpu.config import parse_args  # noqa: E402
from neurallaplacecontrol_tpu.training import (  # noqa: E402
    evaluate_policy,
    train_model,
    train_model_ensemble,
)
from neurallaplacecontrol_tpu.utils.logging import JsonlWriter, setup_logger  # noqa: E402

ENVIRONMENTS = ["oderl-pendulum", "oderl-cartpole", "oderl-acrobot"]
DELAYS = [0, 1, 2, 3]
MODELS = ["nl", "oracle", "random", "delta_t_rnn", "node", "latent_ode"]
TRAIN_SECONDS_PER_MODEL = 1350 * 6  # reference run_exp_multi.py:214


def ensemble_gate_check(
    model_name, env_name, delay, model_apply, params, config,
    *, seeds=5, margin_stds=1.0, evaluate=None, random_result=None,
):
    """Control-eval a freshly ensemble-trained cell against the random policy.

    Returns ``(ok, r_model, r_random)`` where ``ok`` means the model's mean
    return over ``seeds`` episodes clears ``random_mean + margin_stds *
    random_std``. This is the driver-level guard for the delay-ensemble
    trainer's documented failure mode: a draw that matches train MSE yet
    plans worse than random (training/ensemble.py CAVEAT,
    artifacts/run_nl_d3_diag.log). Kept as a free function so tests can
    plant a bad draw through ``evaluate`` and assert the retrain fires.

    ``random_result`` supplies a precomputed random-policy eval dict — the
    baseline depends only on (env, delay, seeds, config), so the driver
    caches it per cell instead of re-running the model-independent episode
    batch (a fresh shape costs the 60-120 s remote compile on this TPU)
    once per gated family.
    """
    evaluate = evaluate or evaluate_policy
    eval_seeds = list(range(seeds))
    r_m = evaluate(
        model_name, env_name, delay, seeds=eval_seeds, config=config,
        model_apply=model_apply, params=params,
    )
    r_r = random_result
    if r_r is None:
        r_r = evaluate("random", env_name, delay, seeds=eval_seeds, config=config)
    threshold = r_r["total_reward"] + margin_stds * r_r.get("total_reward_std", 0.0)
    return r_m["total_reward"] >= threshold, r_m, r_r


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--envs", type=str, default=",".join(ENVIRONMENTS))
    parser.add_argument("--delays", type=str, default=",".join(map(str, DELAYS)))
    parser.add_argument("--models", type=str, default=",".join(MODELS))
    parser.add_argument("--results", type=str, default="logs/results.jsonl")
    parser.add_argument(
        "--train_seconds", type=float, default=TRAIN_SECONDS_PER_MODEL
    )
    parser.add_argument(
        "--ensemble_delays", type=str, default="false",
        help="train all requested delays of each (env, model) as one vmapped "
        "parameter ensemble (training.ensemble) instead of sequentially",
    )
    parser.add_argument(
        "--ensemble_gate", type=str, default="nl",
        help="comma-separated model families to sanity-check after ensemble "
        "training with a multi-seed control eval against the random policy; a "
        "gated model that fails to beat random by the margin (the NL-d3 "
        "failure mode of the vmapped-trajectory draw, see training/ensemble.py "
        "CAVEAT) is retrained individually. Default gates only the flagship, "
        "which is ALSO excluded from ensemble training by default "
        "(--ensemble_exclude nl, the known-good path) — so with both defaults "
        "the gate is intentionally inert and only engages if you ensemble-"
        "train NL by clearing the exclude. Weak baselines legitimately score "
        "near/below random, so gating them by default would trigger futile "
        "retrains. 'none' disables.",
    )
    parser.add_argument(
        "--ensemble_gate_seeds", type=int, default=5,
        help="control-eval seeds for the gate; 2 was statistically thin vs "
        "random's per-seed spread (cartpole random std ~±35 normalized)",
    )
    parser.add_argument(
        "--ensemble_gate_margin", type=float, default=1.0,
        help="gate threshold in units of the random policy's per-seed return "
        "std: model must score >= random_mean + margin*random_std. The "
        "documented failure this catches (NL pendulum d3, same train MSE, "
        "-799 vs random's -140, artifacts/run_nl_d3_diag.log) fails ANY "
        "margin >= 0; the +1-std default also rejects bad-but-lucky draws.",
    )
    parser.add_argument(
        "--train_gate", type=str, default="nl",
        help="comma-separated model families control-evaled against the "
        "random policy after INDIVIDUAL (per-delay) training; a draw that "
        "fails the margin is retrained with model_seed+attempt. Guards the "
        "bad-draw landmine on the main training path — observed twice: the "
        "NL-d3 ensemble draw (artifacts/run_nl_d3_diag.log) and the cme "
        "pendulum-d1 individual draw (artifacts/ilt_train_r5/, train loss "
        "5.5e-4 yet -793 < random, seed-1 retrain recovered). Uses the "
        "--ensemble_gate_seeds/_margin knobs. 'none' disables.",
    )
    parser.add_argument(
        "--train_gate_retries", type=int, default=2,
        help="max reseeded retrains per cell when --train_gate fails; the "
        "last draw is kept (with a warning) if all retries fail",
    )
    parser.add_argument(
        "--ensemble_exclude", type=str, default="nl",
        help="model families trained per-delay individually even when "
        "--ensemble_delays is true. Defaults to the flagship: the delay "
        "ensemble is semantically but not numerically equivalent to "
        "train_model (training/ensemble.py CAVEAT), and per-delay training "
        "is the known-good path for NL (scripts/run_matrix_r2b.sh).",
    )
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a JAX platform (e.g. 'cpu') before first device use — "
        "the reliable switch on images whose site hooks override the "
        "JAX_PLATFORMS env var (CLAUDE.md TPU facts)",
    )
    parser.add_argument(
        "--shard", type=str, default="none",
        help="multi-chip evaluation sharding: 'seeds' spreads the seed "
        "episodes over the device mesh, 'rollouts' shards each planner's K "
        "batch over ALL devices, 'grid:NSxNK' composes both on a 2-D mesh "
        "(parallel.make_grid_sharded_episodes). Wraps evaluate_policy's "
        "shard_* flags; 'none' runs single-chip. The random policy has no "
        "rollout batch, so 'rollouts'/'grid' cells fall back to unsharded "
        "for it. Composes with --multihost: each process then shards its "
        "own cells over jax.local_devices() (cell fan-out on DCN, per-cell "
        "sharding on the host-local ICI mesh), so axis sizes must fit the "
        "PER-HOST device count.",
    )
    parser.add_argument(
        "--multihost", type=str, default=None,
        help="run the grid multi-host over DCN: 'coordinator_host:port,N' "
        "initializes jax.distributed across N processes (launch the same "
        "command on every host with distinct --process_id) and splits the "
        "(env x delay x model) cell grid round-robin by process "
        "(parallel.multihost.process_slice) — the TPU-pod replacement for "
        "the reference's 12-worker Pool (run_exp_multi.py:144-165). Each "
        "process trains and evaluates its own cells and writes "
        "<results>.pN; after a cross-host barrier process 0 merges the "
        "shards into --results and prints the table (shared-filesystem "
        "results dir assumed, as on pod NFS). ALL hosts must pass an "
        "identical grid and train flags — the barrier timeout and cell "
        "split are derived from each host's own argv. Incompatible with "
        "--ensemble_delays (its training couples delays across cells).",
    )
    parser.add_argument(
        "--process_id", type=int,
        default=int(os.environ.get("NLC_PROCESS_ID", "0")),
        help="this host's process index for --multihost (or env NLC_PROCESS_ID)",
    )
    parser.add_argument(
        "--profile_trace_dir", type=str, default=None,
        help="capture a jax.profiler trace of each cell's evaluation into "
        "<dir>/<env>_<model>_d<delay>/ (utils/timing.py profile_trace; "
        "view in Perfetto — see artifacts/trace_nl_episode_r3/). The "
        "reference has no tracing at all (SURVEY.md §5).",
    )
    ns, rest = parser.parse_known_args(argv)
    config = parse_args(rest)

    if ns.platform:
        import jax

        jax.config.update("jax_platforms", ns.platform)

    pid, pcount = 0, 1
    if ns.multihost:
        addr, _, n = ns.multihost.partition(",")
        if not n:
            parser.error("--multihost must be 'coordinator_host:port,N'")
        # validate flag combinations BEFORE spinning up jax.distributed: a
        # plain argument error must not require tearing down a live
        # coordination service on every host. The ensemble only engages
        # with >1 delay (use_ensemble below), so a single-delay grid with
        # --ensemble_delays true is safe.
        if ns.ensemble_delays.lower() == "true" and len(ns.delays.split(",")) > 1:
            parser.error("--multihost is incompatible with --ensemble_delays "
                         "(ensemble training couples delays across cells)")
        # must precede ANY backend use (parallel.multihost.initialize docs)
        import jax

        from neurallaplacecontrol_tpu.parallel import multihost

        multihost.initialize(addr, int(n), ns.process_id)
        pid, pcount = jax.process_index(), jax.process_count()

    shard_kwargs = {}
    if pcount > 1 and ns.shard != "none":
        # DCN x ICI composition: --multihost splits the grid by CELL, so
        # each process enters evaluate_policy alone — its shard meshes must
        # cover only the devices THIS host owns (a global mesh would wait
        # for peers that are busy with their own cells). This is the pod
        # story: cell fan-out over DCN, per-cell sharding over local ICI.
        import jax

        shard_kwargs["devices"] = jax.local_devices()
    if ns.shard == "seeds":
        shard_kwargs = {"shard_seeds": True}
    elif ns.shard == "rollouts":
        shard_kwargs = {"shard_rollouts": True}
    elif ns.shard.startswith("grid:"):
        try:
            n_s, _, n_k = ns.shard[len("grid:"):].lower().partition("x")
            shard_grid = (int(n_s), int(n_k))
            if min(shard_grid) < 1:
                raise ValueError(shard_grid)
        except ValueError:
            parser.error(
                f"--shard grid axes must be positive ints 'grid:NSxNK', got {ns.shard!r}"
            )
        shard_kwargs = {"shard_grid": shard_grid}
    elif ns.shard != "none":
        parser.error(f"--shard must be none|seeds|rollouts|grid:NSxNK, got {ns.shard!r}")

    logger = setup_logger(__file__, log_folder=config.log_folder)
    results_path = ns.results if pcount == 1 else f"{ns.results}.p{pid}"
    if pcount > 1:
        # the shard is per-run scratch: JsonlWriter appends, so a stale
        # shard left by an earlier (or aborted) run at the same --results
        # path would be re-merged as duplicate records
        Path(results_path).unlink(missing_ok=True)
    results = JsonlWriter(results_path)
    envs = ns.envs.split(",")
    delays = [int(d) for d in ns.delays.split(",")]
    models = ns.models.split(",")
    seeds = list(range(config.seed_start, config.seed_start + config.seed_runs))
    run_records = []  # this run's records (the JSONL file is append-mode)

    owned_cells = None
    if pcount > 1:
        from neurallaplacecontrol_tpu.parallel import multihost

        cells = [(e, d, m) for e in envs for d in delays for m in models]
        owned_cells = set(multihost.process_slice(cells, pid, pcount))
        logger.info(
            "[multihost] process %d/%d owns %d/%d grid cells",
            pid, pcount, len(owned_cells), len(cells),
        )

    def owned(env_name, delay, model_name) -> bool:
        return owned_cells is None or (env_name, delay, model_name) in owned_cells

    trained = {}
    use_ensemble = ns.ensemble_delays.lower() == "true" and len(delays) > 1
    excluded = set(ns.ensemble_exclude.lower().split(",")) if use_ensemble else set()
    ens_models = [m for m in models if m not in excluded] if use_ensemble else []
    seq_models = [m for m in models if m not in ens_models]
    if (config.retrain or config.force_retrain) and use_ensemble:
        gated_families = set(ns.ensemble_gate.lower().split(","))
        if not gated_families.intersection(ens_models):
            logger.warning(
                "--ensemble_gate %s gates none of the ensemble-trained "
                "families %s (the gated families train per-delay via "
                "--ensemble_exclude) — no bad-draw protection this run",
                ns.ensemble_gate, ens_models,
            )
        random_cache = {}  # (env, delay) -> random-policy eval (model-free)
        for env_name in envs:
            for model_name in ens_models:
                if model_name in ("oracle", "random"):
                    continue
                try:
                    t0 = time.time()
                    out = train_model_ensemble(
                        model_name, env_name, config, delays=delays,
                        retrain=True, force_retrain=config.force_retrain,
                        model_seed=config.model_seed,
                        start_from_checkpoint=config.start_from_checkpoint,
                        end_training_after_seconds=ns.train_seconds,
                    )
                    for delay, (model, params, res) in out.items():
                        trained[(env_name, delay, model_name)] = (model, params)
                        logger.info(
                            "[trained %s %s d=%d] loss=%g (ensemble, %.0fs)",
                            env_name, model_name, delay,
                            res["best_val_loss"], time.time() - t0,
                        )
                    if model_name in gated_families:
                        for delay in list(out):
                            model, params = trained[(env_name, delay, model_name)]
                            apply = model if model_name == "latent_ode" else model.apply
                            ok, r_m, r_r = ensemble_gate_check(
                                model_name, env_name, delay, apply, params,
                                config, seeds=ns.ensemble_gate_seeds,
                                margin_stds=ns.ensemble_gate_margin,
                                random_result=random_cache.get((env_name, delay)),
                            )
                            random_cache[(env_name, delay)] = r_r
                            if ok:
                                continue
                            logger.warning(
                                "[ensemble gate %s %s d=%d] model fails the "
                                "random-control margin (%.1f < %.1f + %g*%.1f)"
                                " — retraining individually",
                                env_name, model_name, delay,
                                r_m["total_reward"], r_r["total_reward"],
                                ns.ensemble_gate_margin,
                                r_r.get("total_reward_std", 0.0),
                            )
                            model, params, res = train_model(
                                model_name, env_name, config, delay=delay,
                                retrain=True, force_retrain=True,
                                model_seed=config.model_seed,
                                start_from_checkpoint=False,
                                end_training_after_seconds=ns.train_seconds,
                            )
                            trained[(env_name, delay, model_name)] = (model, params)
                            logger.info(
                                "[trained %s %s d=%d] loss=%g (gate retrain)",
                                env_name, model_name, delay, res["best_val_loss"],
                            )
                except Exception:  # noqa: BLE001 — quarantine (:46-56)
                    logger.error(
                        "[train FAILED %s %s ensemble]\n%s",
                        env_name, model_name, traceback.format_exc(),
                    )
    if config.retrain or config.force_retrain:
        # per-delay individual training: all models when not ensembling,
        # plus the --ensemble_exclude families (default: the NL flagship)
        train_gated = set(ns.train_gate.lower().split(",")) - {"none", ""}
        gate_rand_cache = {}  # (env, delay) -> random-policy eval (model-free)
        for env_name in envs:
            for delay in delays:
                for model_name in seq_models:
                    if model_name in ("oracle", "random"):
                        continue
                    if not owned(env_name, delay, model_name):
                        continue
                    try:
                        t0 = time.time()
                        model, params, res = train_model(
                            model_name, env_name, config, delay=delay,
                            retrain=True, force_retrain=config.force_retrain,
                            model_seed=config.model_seed,
                            start_from_checkpoint=config.start_from_checkpoint,
                            end_training_after_seconds=ns.train_seconds,
                        )
                        logger.info(
                            "[trained %s %s d=%d] loss=%g (%.0fs)",
                            env_name, model_name, delay,
                            res["best_val_loss"], time.time() - t0,
                        )
                        if model_name in train_gated:
                            # bad-draw gate for the MAIN training path: a
                            # draw can hit train MSE yet plan below random
                            # (seen twice — artifacts/run_nl_d3_diag.log,
                            # artifacts/ilt_train_r5/). Control-eval vs the
                            # random policy; reseed-retrain on failure.
                            apply = (
                                model if model_name == "latent_ode"
                                else model.apply
                            )
                            for attempt in range(ns.train_gate_retries + 1):
                                ok, r_m, r_r = ensemble_gate_check(
                                    model_name, env_name, delay, apply,
                                    params, config,
                                    seeds=ns.ensemble_gate_seeds,
                                    margin_stds=ns.ensemble_gate_margin,
                                    random_result=gate_rand_cache.get(
                                        (env_name, delay)
                                    ),
                                )
                                gate_rand_cache[(env_name, delay)] = r_r
                                if ok:
                                    break
                                if attempt == ns.train_gate_retries:
                                    logger.warning(
                                        "[train gate %s %s d=%d] all %d "
                                        "reseeded retrains failed the "
                                        "random-control margin — keeping "
                                        "the last draw",
                                        env_name, model_name, delay,
                                        ns.train_gate_retries,
                                    )
                                    break
                                next_seed = config.model_seed + attempt + 1
                                logger.warning(
                                    "[train gate %s %s d=%d] draw fails the "
                                    "random-control margin (%.1f < %.1f + "
                                    "%g*%.1f) — retraining with "
                                    "model_seed=%d",
                                    env_name, model_name, delay,
                                    r_m["total_reward"], r_r["total_reward"],
                                    ns.ensemble_gate_margin,
                                    r_r.get("total_reward_std", 0.0),
                                    next_seed,
                                )
                                model, params, res = train_model(
                                    model_name, env_name, config, delay=delay,
                                    retrain=True, force_retrain=True,
                                    model_seed=next_seed,
                                    start_from_checkpoint=False,
                                    end_training_after_seconds=ns.train_seconds,
                                )
                                apply = (
                                    model if model_name == "latent_ode"
                                    else model.apply
                                )
                        trained[(env_name, delay, model_name)] = (model, params)
                    except Exception:  # noqa: BLE001 — quarantine (:46-56)
                        logger.error(
                            "[train FAILED %s %s d=%d]\n%s",
                            env_name, model_name, delay, traceback.format_exc(),
                        )

    for env_name in envs:
        for delay in delays:
            for model_name in models:
                if not owned(env_name, delay, model_name):
                    continue
                try:
                    extra = {}
                    if model_name not in ("oracle", "random"):
                        if (env_name, delay, model_name) in trained:
                            model, params = trained[(env_name, delay, model_name)]
                        else:
                            model, params, _ = train_model(
                                model_name, env_name, config, delay=delay,
                                retrain=False, model_seed=config.model_seed,
                            )
                        extra = dict(
                            model_apply=model if model_name == "latent_ode" else model.apply,
                            params=params,
                        )
                    if ns.profile_trace_dir:
                        extra["profile_trace_dir"] = (
                            f"{ns.profile_trace_dir}/"
                            f"{env_name}_{model_name}_d{delay}"
                        )
                    # evaluate_policy itself falls back to unsharded for the
                    # random policy under rollout/grid sharding
                    extra.update(shard_kwargs)
                    r = evaluate_policy(
                        model_name, env_name, delay, seeds=seeds, config=config, **extra
                    )
                    r["errored"] = False
                    results.write(r)
                    run_records.append(r)
                    logger.info(
                        "[Model Completed evaluation mppi] %s", {
                            k: r[k] for k in (
                                "model_name", "env_name", "delay",
                                "total_reward", "total_reward_std",
                            )
                        },
                    )
                except Exception:  # noqa: BLE001
                    logger.error(
                        "[eval FAILED %s %s d=%d]\n%s",
                        env_name, model_name, delay, traceback.format_exc(),
                    )
                    rec = {
                        "model_name": model_name,
                        "env_name": env_name,
                        "delay": delay,
                        "errored": True,
                    }
                    results.write(rec)
                    run_records.append(rec)

    if pcount > 1:
        # cross-host barrier, then process 0 merges the per-process shards
        # into the requested results file (shared results dir assumed).
        # The barrier must outlast the SLOWEST host: cell round-robin can
        # alias with the model list so one process owns every trainable
        # cell — scale the timeout to the worst per-process training load
        # (train budget + collection/eval allowance per trainable cell)
        # instead of trusting the 1 h default.
        from neurallaplacecontrol_tpu.parallel import multihost

        no_train = {"oracle", "random"}
        worst_trainable = max(
            sum(1 for c in multihost.process_slice(cells, p, pcount) if c[2] not in no_train)
            for p in range(pcount)
        )
        # eval-only runs (no retrain) skip the per-cell training term — a
        # genuinely dead host should error at the 1 h floor, not after the
        # full scaled training allowance (advisor r4)
        if config.retrain or config.force_retrain:
            barrier_timeout = max(
                3600.0, worst_trainable * (ns.train_seconds + 900.0) + 1800.0
            )
        else:
            barrier_timeout = 3600.0
        multihost.barrier("nlc_grid_eval_done", timeout_s=barrier_timeout)
        if pid != 0:
            logger.info("Fin (process %d; shard %s).", pid, results_path)
            return
        # parse EVERY shard before writing or unlinking anything: a torn
        # line (killed writer) must fail the merge up front, not after
        # earlier shards were already consumed (advisor r4)
        shard_records = []
        for i in range(pcount):
            shard = Path(f"{ns.results}.p{i}")
            if not shard.exists():  # a process can own zero surviving cells
                continue
            shard_records.append(
                (shard, [json.loads(line) for line in shard.read_text().splitlines()])
            )
        merged = JsonlWriter(ns.results)
        run_records = []
        for shard, recs in shard_records:
            for rec in recs:
                merged.write(rec)
                run_records.append(rec)
            shard.unlink()  # consumed — a later run must not re-merge it
        logger.info(
            "[multihost] merged %d records from %d shards into %s",
            len(run_records), pcount, ns.results,
        )

    # summary table over THIS run's records only (the results file is
    # append-mode and may hold earlier runs with different configs)
    from neurallaplacecontrol_tpu.results.process import latex_table

    recs = [r for r in run_records if not r.get("errored")]
    if recs:
        try:
            logger.info("Normalized-return table:\n%s", latex_table(recs))
        except Exception:  # noqa: BLE001 — summary must not kill a finished run
            logger.error("summary table failed\n%s", traceback.format_exc())
    logger.info("Fin.")


if __name__ == "__main__":
    main()

"""Serving demo: per-tick controller latency with the shipped NL flagship.

Builds the deployment controller (neurallaplacecontrol_tpu.serving) around
the round-2 matrix checkpoint, warms it up, then measures the per-tick
planner latency distribution (p50/p90/p99) the way a plant would see it —
one observation in, one action out, host-synchronous each tick. Optionally
writes the jax.export artifact and demonstrates the persistent compile
cache (second process start compiles from disk).

Usage:
    python scripts/serve_demo.py [--ticks 300] [--model nl] [--env
    oderl-cartpole] [--delay 1] [--export artifacts/controller.jaxexport]
    [--cache_dir /tmp/nlc-xla-cache] [--roll_outs 1000] [--time_steps 40]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=300)
    p.add_argument("--model", default="nl")
    p.add_argument("--env", default="oderl-cartpole")
    p.add_argument("--delay", type=int, default=1)
    p.add_argument("--export", default=None)
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--roll_outs", type=int, default=None)
    p.add_argument("--time_steps", type=int, default=None)
    p.add_argument("--chained", type=int, default=100,
                   help="ticks to chain in one on-device scan (amortized "
                        "device tick time, no host round-trip); 0 disables")
    p.add_argument("--ticklog", default=None,
                   help="record per-tick telemetry [t_rel_s, tick_ms, "
                        "action..., obs...] into this native mmap ring log "
                        "(runtime/ticklog.cc; tail live with "
                        "runtime.ticklog.TickLog.open)")
    p.add_argument("--ticklog_capacity", type=int, default=65536)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neurallaplacecontrol_tpu import serving
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.envs import make_env
    from neurallaplacecontrol_tpu.models import make_model
    from neurallaplacecontrol_tpu.utils.checkpoint import (
        load_pytree,
        model_checkpoint_name,
        resolve_checkpoint,
    )

    if args.cache_dir:
        cache = serving.persistent_compile_cache(args.cache_dir)
        print(f"persistent compile cache: {cache}", file=sys.stderr)

    config = Config()
    env = make_env(args.env, dt=config.dt)
    spec = env.spec

    model_apply = params = None
    if args.model != "oracle":
        model = make_model(args.model, args.env, spec.n_obs, spec.m,
                           spec.action_high, config)
        params = model.init(jax.random.PRNGKey(0))
        ckpt = resolve_checkpoint(
            model_checkpoint_name(args.model, args.env, args.delay, "exp", 0, True)
        )
        if os.path.exists(ckpt):
            params = load_pytree(ckpt, params)
            print(f"loaded checkpoint {ckpt}", file=sys.stderr)
        else:
            print(f"WARNING: no checkpoint at {ckpt}; untrained params",
                  file=sys.stderr)
        model_apply = model.apply

    ctrl = serving.make_controller(
        args.model, args.env, args.delay, config,
        model_apply=model_apply, params=params,
        roll_outs=args.roll_outs, time_steps=args.time_steps,
    )

    if args.export:
        t0 = time.perf_counter()
        blob = serving.export_controller(ctrl, path=args.export)
        print(f"exported {len(blob)} bytes to {args.export} "
              f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # closed-loop tick latency: plant sim on host (one Euler step), planner
    # on device, synchronized each tick like a real control loop
    import jax.numpy as jnp
    import numpy as np

    state = ctrl.reset(jax.random.PRNGKey(42))
    raw = jnp.asarray([jnp.pi, 1.0]) if spec.name == "pendulum" else env.reset(
        jax.random.PRNGKey(7))

    t0 = time.perf_counter()
    action, state = ctrl.step(state, env.observe(raw))
    jax.block_until_ready(action)
    compile_s = time.perf_counter() - t0

    tlog = None
    if args.ticklog:
        from neurallaplacecontrol_tpu.runtime.ticklog import TickLog

        # t_rel_s (seconds since the log's epoch, NOT an absolute unix
        # time — ~1.8e9 s has a 128 s ulp in the record's float32),
        # tick_ms, action, obs. The epoch persists in a sidecar file so a
        # crash-restarted process resuming the SAME ring keeps one
        # monotone timebase instead of restarting t_rel at zero.
        width = 2 + spec.m + spec.n_obs
        tlog = TickLog.create(args.ticklog, args.ticklog_capacity, width)
        epoch_path = args.ticklog + ".epoch"
        if os.path.exists(epoch_path) and tlog.count > 0:
            with open(epoch_path) as f:
                tlog_epoch = float(f.read())
        else:
            tlog_epoch = time.time()
            with open(epoch_path, "w") as f:
                f.write(repr(tlog_epoch))
        tlog_base = time.time() - tlog_epoch
        tlog_t0 = time.perf_counter()
        print(f"tick log: {args.ticklog} (width {width}, "
              f"epoch_unix_s {tlog_epoch:.3f})", file=sys.stderr)

    lat = []
    for _ in range(args.ticks):
        obs = env.observe(raw)
        t0 = time.perf_counter()
        action, state = ctrl.step(state, obs)
        action = jax.block_until_ready(action)
        tick_s = time.perf_counter() - t0
        lat.append(tick_s)
        if tlog is not None:
            tlog.append(np.concatenate([
                [tlog_base + time.perf_counter() - tlog_t0, tick_s * 1e3],
                np.asarray(action), np.asarray(obs),
            ]))
        executed = state.action_buffer[-(args.delay + 1)]
        raw = raw + spec.dt * env.rhs(raw, executed)

    lat_ms = np.asarray(lat) * 1e3
    if tlog is not None:
        tlog.sync()
        print(f"tick log holds {tlog.count} records", file=sys.stderr)
        tlog.close()

    # amortized device tick: chain N controller steps in one lax.scan launch.
    # The gap between this and the host-sync p50 is the per-call dispatch /
    # tunnel round-trip, not planner compute (on the axon-tunneled chip the
    # round-trip dominates; co-located deployment sees the chained number).
    chained_ms = None
    if args.chained > 0:
        from jax import lax

        @jax.jit
        def run_chained(state0, obs):
            def body(s, _):
                a, s2 = ctrl.step(s, obs)
                return s2, a
            s_final, acts = lax.scan(body, state0, None, length=args.chained)
            return acts

        obs0 = env.observe(raw)
        jax.block_until_ready(run_chained(state, obs0))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(run_chained(state, obs0))
        chained_ms = (time.perf_counter() - t0) * 1e3 / args.chained

    out = {
        "model": args.model,
        "env": args.env,
        "delay": args.delay,
        "roll_outs": ctrl.mppi_cfg.num_samples,
        "time_steps": ctrl.mppi_cfg.horizon,
        "ticks": args.ticks,
        "first_tick_compile_s": round(compile_s, 3),
        "tick_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
        "tick_ms_p90": round(float(np.percentile(lat_ms, 90)), 3),
        "tick_ms_p99": round(float(np.percentile(lat_ms, 99)), 3),
        "tick_ms_mean": round(float(lat_ms.mean()), 3),
        "tick_ms_device_amortized": (
            round(float(chained_ms), 3) if chained_ms is not None else None
        ),
        "control_rate_hz": round(1e3 / float(np.median(lat_ms)), 1),
        "realtime_ok": bool(np.percentile(lat_ms, 99) < spec.dt * 1e3),
        "backend": jax.devices()[0].platform,
        "ticklog": args.ticklog,
        "ticklog_epoch_unix_s": (
            round(tlog_epoch, 3) if args.ticklog else None
        ),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

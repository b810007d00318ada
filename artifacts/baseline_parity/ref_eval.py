"""Planner-level parity cross-check (VERDICT r3 item 3).

Runs the REFERENCE's own evaluation loop — `mppi_with_model.
mppi_with_model_evaluate_single_step` (/root/reference/mppi_with_model.py:
31-325): its torch MPPIDelay planner, its CT environments, its episode
stepping — with trained weights SHARED with our framework, to answer the
last open parity question: do the weak baseline planning rows (latent_ode,
rnn on pendulum/acrobot) reflect the reference stack's own behavior
(expressivity floor) or a planner-model coupling bug on our side?

Design: identical weights on both sides, identical protocol (K, T, seeds),
two planners.

- model=rnn:        transplant OUR trained checkpoint (saved_models/*.npz,
                    the 20-seed-row weights) into the reference's RNN class
                    via interop.rnn_state_dict_from_params (forward parity
                    pinned to 1e-12 in tests/test_ref_weight_parity.py).
- model=latent_ode: load the reference's OWN trained .pt produced by
                    ref_train_ode.py --save (reference classes, reference
                    hyperparameters, same expert buffer as our training).
- model=oracle:     no weights — harness sanity control; should land near
                    BASELINE.md oracle rows, validating the shimmed env +
                    planner before the weak-row runs mean anything.

Environment shims (no torchdiffeq/gym/wandb/pyvirtualdisplay in this image;
all are interface stubs, ZERO model/planner/env math is replaced except
odeint, which tdeq_shim implements faithfully):

    python ref_eval.py --model oracle --env oderl-pendulum --delay 0 \
        --k 200 --t 20 --seeds 0,1,2 --out ref_eval_results.jsonl

The mirror run on our side uses the same K/T/seeds through
training.eval.evaluate_policy (see ours_eval.py).
"""

import argparse
import ast
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

HERE = Path(__file__).resolve().parent
REPO = HERE.parent.parent
REF = Path("/root/reference")

# --- interface shims (only non-reference code on the eval path) ------------
sys.path.insert(0, str(HERE))
import tdeq_shim  # noqa: E402

tdeq_mod = types.ModuleType("torchdiffeq")
tdeq_mod.odeint = tdeq_shim.odeint
sys.modules["torchdiffeq"] = tdeq_mod

tl_mod = types.ModuleType("torchlaplace")
tl_mod.laplace_reconstruct = None  # not on the rnn/latent_ode/oracle path
sys.modules["torchlaplace"] = tl_mod


class _WandbStub(types.ModuleType):
    def __getattr__(self, name):  # log/init/... all no-ops
        return lambda *a, **k: None


sys.modules["wandb"] = _WandbStub("wandb")

gym_mod = types.ModuleType("gym")


class _GymEnv:
    metadata = {"render.modes": []}


class _Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        low = np.asarray(low, dtype=np.float64)
        high = np.asarray(high, dtype=np.float64)
        if shape is not None:
            low = np.broadcast_to(low, shape).copy()
            high = np.broadcast_to(high, shape).copy()
        self.low, self.high, self.shape = low, high, low.shape

    def sample(self):
        return np.random.uniform(self.low, self.high).astype(np.float64)


gym_mod.Env = _GymEnv
gym_mod.make = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError)
spaces_mod = types.ModuleType("gym.spaces")
spaces_mod.Box = _Box
gym_mod.spaces = spaces_mod
utils_mod = types.ModuleType("gym.utils")
seeding_mod = types.ModuleType("gym.utils.seeding")


def _np_random(seed=None):
    return np.random.RandomState(seed), seed


seeding_mod.np_random = _np_random
utils_mod.seeding = seeding_mod
gym_mod.utils = utils_mod
sys.modules["gym"] = gym_mod
sys.modules["gym.spaces"] = spaces_mod
sys.modules["gym.utils"] = utils_mod
sys.modules["gym.utils.seeding"] = seeding_mod

# envs/oderl/utils/utils.py imports TorchDiffEqPack at module load; its
# odesolve is only reached by the vendored BNN training helpers, never by
# the eval path (which integrates through torchdiffeq.odeint)
tdp_mod = types.ModuleType("TorchDiffEqPack")
tdp_solver = types.ModuleType("TorchDiffEqPack.odesolver")
tdp_solver.odesolve = lambda *a, **k: (_ for _ in ()).throw(
    NotImplementedError("TorchDiffEqPack stub: not on the eval path")
)
tdp_mod.odesolver = tdp_solver
sys.modules["TorchDiffEqPack"] = tdp_mod
sys.modules["TorchDiffEqPack.odesolver"] = tdp_solver

pv_mod = types.ModuleType("pyvirtualdisplay")


class _Display:
    def __init__(self, *a, **k):
        pass

    def start(self):
        return self


pv_mod.Display = _Display
sys.modules["pyvirtualdisplay"] = pv_mod

sys.path.insert(0, str(REF))
import mppi_with_model  # noqa: E402  (reference module, shimmed imports)
from config import dotdict, seed_all  # noqa: E402  (reference config.py)

STATS = {  # /root/reference/train_utils.py:187-215
    "oderl-cartpole": (
        np.zeros(5),
        np.array([2.88646771, 11.54556671, 0.70729307, 0.70692035, 17.3199048]),
        3.0,
        5,
    ),
    "oderl-pendulum": (
        np.zeros(3),
        np.array([0.70634571, 0.70784512, 2.89072771]),
        2.0,
        3,
    ),
    "oderl-acrobot": (
        np.zeros(6),
        np.array(
            [0.70711024, 0.70710328, 0.7072186, 0.7069949, 2.88642115, 2.88627309]
        ),
        5.0,
        6,
    ),
}


def build_rnn(env: str, delay: int):
    """Reference RNN class (train_utils.py:552-586, exec'd verbatim) loaded
    with OUR trained 20-seed-row weights."""
    src = (REF / "train_utils.py").read_text()
    tree = ast.parse(src)
    nodes = [n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "RNN"]
    ns = {"torch": torch, "nn": torch.nn, "np": np, "device": torch.device("cpu")}
    exec(compile(ast.Module(body=nodes, type_ignores=[]), "<ref RNN>", "exec"), ns)

    sys.path.insert(0, str(REPO))
    from neurallaplacecontrol_tpu.interop import rnn_state_dict_from_params
    from neurallaplacecontrol_tpu.utils.checkpoint import load_pytree, model_checkpoint_name

    import jax

    jax.config.update("jax_platforms", "cpu")
    from neurallaplacecontrol_tpu.config import Config
    from neurallaplacecontrol_tpu.models import make_model

    state_mean, state_std, action_high, n_obs = STATS[env]
    cfg = Config()
    ours = make_model("rnn", env, n_obs, 1, action_high, cfg)
    params = load_pytree(
        str(REPO / "saved_models" / model_checkpoint_name("rnn", env, delay, "exp", 0, True)),
        ours.init(jax.random.PRNGKey(0)),
    )
    sd = rnn_state_dict_from_params(params)

    ref = ns["RNN"](
        n_obs,
        1,
        hidden_units=cfg.rnn_hidden_units,
        encode_obs_time=False,
        state_mean=state_mean,
        state_std=state_std,
        action_mean=np.zeros(1),
        action_std=np.array([action_high / 2.0]),
        normalize=True,
    ).double()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all("mean" in m or "std" in m or m == "dt" for m in missing), missing
    return ref


def build_latent_ode(env: str, ckpt: str):
    """Reference GeneralLatentODEOfficial with the reference-trained .pt."""
    import w_latent_ode

    state_mean, state_std, action_high, n_obs = STATS[env]
    ref = w_latent_ode.GeneralLatentODEOfficial(
        n_obs,
        1,
        n_obs,
        hidden_units=128,
        state_mean=state_mean,
        state_std=state_std,
        action_mean=np.zeros(1),
        action_std=np.array([action_high / 2.0]),
        normalize=True,
        normalize_time=True,
        dt=0.05,
    ).double()
    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    ref.load_state_dict(sd)
    return ref


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("oracle", "random", "rnn", "latent_ode"), required=True)
    p.add_argument("--env", default="oderl-pendulum")
    p.add_argument("--delay", type=int, default=0)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--t", type=int, default=20)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--ckpt", default=None, help="latent_ode: reference .pt path")
    p.add_argument("--threads", type=int, default=6)
    p.add_argument("--out", default=str(HERE / "ref_eval_results.jsonl"))
    args = p.parse_args()
    torch.set_num_threads(args.threads)

    model = None
    if args.model == "rnn":
        model = build_rnn(args.env, args.delay)
    elif args.model == "latent_ode":
        assert args.ckpt, "--ckpt required for latent_ode"
        model = build_latent_ode(args.env, args.ckpt)
    if model is not None:
        model.eval()

    for seed in (int(s) for s in args.seeds.split(",")):
        seed_all(seed)  # reference seeding (config.py), as run_exp_multi does
        t0 = time.perf_counter()
        res = mppi_with_model.mppi_with_model_evaluate_single_step(
            args.model,
            args.env,
            args.delay,
            roll_outs=args.k,
            time_steps=args.t,
            dt=0.05,
            model=model,
            uniq=f"refeval_{seed}",
            config=dotdict(
                {
                    "friction": False,
                    "observation_noise": 0.0,
                    "model_seed": 0,
                    "multi_process_results": True,
                }
            ),
            seed=seed,
        )
        rec = {
            "harness": "reference",
            "seed": seed,
            "wall_s": round(time.perf_counter() - t0, 1),
            **{
                k: res[k]
                for k in (
                    "model_name", "env_name", "roll_outs", "time_steps",
                    "delay", "total_reward_raw", "total_reward",
                )
            },
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

"""Cross-run the REFERENCE's own latent_ode / node torch code on our data.

VERDICT r2 item 1: the headline table's latent_ode and node rows need the
same gold-standard evidence the rnn family got — run the reference
implementation itself (not our rebuild) on the same 1M-transition expert
replay buffer and record where its training loss plateaus.

What runs here is the reference's code, verbatim:
- node: classes `xOdeFuncInXAndU` + `NODE` extracted by ast from
  /root/reference/train_utils.py:637-738 and exec'd unmodified.
- latent_ode: `w_latent_ode.GeneralLatentODEOfficial` imported from the
  reference tree (train_step path, /root/reference/w_latent_ode.py:97-131),
  pulling in the vendored Rubanova latent_ode_lib.
The only substitutions are environment shims: `tdeq_shim.odeint` for the
missing torchdiffeq package and a stub torchlaplace module (never called on
the latent_ode/node paths).

Training mirrors /root/reference/train_utils.py:159-492 exactly for these
families: float64, Adam lr=1e-4 wd=0, grad-clip 0.1, batch_size=1 (the
reference forces bs=1 for any model with "ode" in the name, :319-322),
normalize=True stats from :187-215, latent_ode history windows built with
`unfold` (:371-378, including the reference's window/target pairing), loss
logged every 500 iters as cum_loss/iters.

Usage:
  python ref_train_ode.py --model node --env oderl-cartpole --delay 1 \
      --seconds 7200 --buffer /root/repo/offlinedata/... --out ref_node.log
"""

import argparse
import ast
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch
from torch import nn

HERE = Path(__file__).resolve().parent

# --- environment shims (the ONLY non-reference code on the model path) ---
sys.path.insert(0, str(HERE))
import tdeq_shim  # noqa: E402

tdeq_mod = types.ModuleType("torchdiffeq")
tdeq_mod.odeint = tdeq_shim.odeint
sys.modules["torchdiffeq"] = tdeq_mod

tl_mod = types.ModuleType("torchlaplace")


def _no_laplace(*a, **k):
    raise RuntimeError("laplace_reconstruct is not on the latent_ode/node path")


tl_mod.laplace_reconstruct = _no_laplace
sys.modules["torchlaplace"] = tl_mod

sys.path.insert(0, "/root/reference")

DEVICE = torch.device("cpu")

STATS = {  # /root/reference/train_utils.py:187-215
    "oderl-cartpole": (
        np.zeros(5),
        np.array([2.88646771, 11.54556671, 0.70729307, 0.70692035, 17.3199048]),
        3.0,
    ),
    "oderl-pendulum": (
        np.zeros(3),
        np.array([0.70634571, 0.70784512, 2.89072771]),
        2.0,
    ),
    "oderl-acrobot": (
        np.zeros(6),
        np.array([0.70711024, 0.70710328, 0.7072186, 0.7069949, 2.88642115, 2.88627309]),
        5.0,
    ),
}


def build_node(state_dim, action_dim):
    """Exec the reference NODE classes (train_utils.py:637-738) unmodified."""
    src = Path("/root/reference/train_utils.py").read_text()
    tree = ast.parse(src)
    wanted = {"xOdeFuncInXAndU", "NODE"}
    nodes = [n for n in tree.body if isinstance(n, ast.ClassDef) and n.name in wanted]
    assert {n.name for n in nodes} == wanted
    ns = {
        "torch": torch,
        "nn": nn,
        "np": np,
        "odeint": tdeq_shim.odeint,
        "device": DEVICE,
    }
    exec(compile(ast.Module(body=nodes, type_ignores=[]), "<ref train_utils.py>", "exec"), ns)
    state_mean, state_std, action_high = STATS[ARGS.env]
    # get_node_model (/root/reference/train_utils.py:101-125): defaults from
    # config.py — hidden 270, augment_dim 1, euler, normalize(+time)=True.
    return ns["NODE"](
        state_dim,
        action_dim,
        state_dim,
        hidden_units=270,
        state_mean=state_mean,
        state_std=state_std,
        action_mean=np.zeros(action_dim),
        action_std=np.array([action_high / 2.0]),
        normalize=True,
        normalize_time=True,
        encode_obs_time=False,
        method="euler",
        augment_dim=1,
    )


def build_latent_ode(state_dim, action_dim):
    import w_latent_ode  # reference module, shimmed imports

    state_mean, state_std, action_high = STATS[ARGS.env]
    # get_latent_ode_model (/root/reference/train_utils.py:128-156)
    return w_latent_ode.GeneralLatentODEOfficial(
        state_dim,
        action_dim,
        state_dim,
        hidden_units=128,
        state_mean=state_mean,
        state_std=state_std,
        action_mean=np.zeros(action_dim),
        action_std=np.array([action_high / 2.0]),
        normalize=True,
        normalize_time=True,
        dt=0.05,
        classif_per_tp=False,
        n_labels=1,
        obsrv_std=0.01,
    )


def main():
    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(ARGS.threads)
    d = np.load(ARGS.buffer)
    s0 = torch.from_numpy(d["s0"]).double()
    a0 = torch.from_numpy(d["a0"]).double()
    sn = torch.from_numpy(d["sn"]).double()
    ts = torch.from_numpy(d["ts"]).double()
    state_dim, action_dim = s0.shape[1], a0.shape[2]
    absize = a0.shape[1]

    out = open(ARGS.out, "a", buffering=1)

    def log(msg):
        print(msg)
        out.write(msg + "\n")

    log(f"# model={ARGS.model} env={ARGS.env} delay={ARGS.delay} buffer={ARGS.buffer}")
    log(f"# N={len(s0)} state_dim={state_dim} action_dim={action_dim}")

    if ARGS.model == "node":
        model = build_node(state_dim, action_dim).double()
    else:
        model = build_latent_ode(state_dim, action_dim).double()
    n_params = sum(p.numel() for p in model.parameters())
    log(f"# params={n_params}")

    # train_utils.py:297-301 / :319-322
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=0)
    batch_size = 1
    loss_func = nn.MSELoss()

    if ARGS.model == "latent_ode":
        # train_utils.py:326-338 + :371-378 (verbatim pairing, incl. the
        # reference's window/target alignment)
        observed_ts = (
            torch.arange(-(absize - 1), 1, 1, device=DEVICE, dtype=torch.double) * 0.05
        ).view(1, -1)
        current_a0 = a0[:, -1, :]
        history_s0 = s0.unfold(dimension=0, size=absize, step=1).permute(0, 2, 1)
        history_a0 = current_a0.unfold(dimension=0, size=absize, step=1).permute(0, 2, 1)
        sn_t, ts_t = sn[: -(absize - 1)], ts[: -(absize - 1)]
        n = history_s0.shape[0]
    else:
        n = s0.shape[0]

    t_start = time.perf_counter()
    cum_loss, iters, it_total = 0.0, 0, 0
    stop = False
    while not stop:  # epoch loop (train_utils.py:345)
        permutation = torch.randperm(n)
        for iter_i in range(n // batch_size):
            opt.zero_grad()
            idx = permutation[iter_i * batch_size : (iter_i + 1) * batch_size]
            if ARGS.model == "latent_ode":
                bh_s0, bh_a0, bsn, bts = (
                    history_s0[idx],
                    history_a0[idx],
                    sn_t[idx],
                    ts_t[idx],
                )
                bsd = bsn - bh_s0[:, -1, :]
                loss = model.train_step(bh_s0, bh_a0, bts, observed_ts, bsd)
            else:
                bs0, ba0, bsn, bts = s0[idx], a0[idx], sn[idx], ts[idx]
                bsd = bsn - bs0
                pred_sd = model(bs0, ba0, bts)
                loss = loss_func(pred_sd.squeeze(), bsd.squeeze())
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 0.1)
            opt.step()
            cum_loss += loss.item()
            iters += 1
            it_total += 1
            if it_total % 500 == 0:
                el = time.perf_counter() - t_start
                log(f"t={int(el)}s it={it_total} loss={cum_loss / iters:.6f}")
                cum_loss, iters = 0.0, 0
                if el > ARGS.seconds:
                    stop = True
                    break
            if it_total % ARGS.eval_every == 0:
                heldout_mse(model, locals())
        else:
            continue
        break
    el = time.perf_counter() - t_start
    log(f"# done after {int(el)}s, {it_total} iters")
    heldout_mse(model, locals())
    if ARGS.save:
        torch.save(model.state_dict(), ARGS.save)
        log(f"# saved state_dict to {ARGS.save}")


@torch.no_grad()
def heldout_mse(model, env_locals):
    """One-step prediction MSE on fixed held-out rows, the cross-model metric.

    For node this is the same quantity as its train loss; for latent_ode it
    is the planner-facing number: `forward` (w_latent_ode.py:145-196, the
    path MPPI calls) vs the reference's own training target.
    """
    g = torch.Generator().manual_seed(1234)
    model.eval()
    n = env_locals["n"]
    idx = torch.randperm(n, generator=g)[: ARGS.eval_samples]
    errs = []
    if ARGS.model == "latent_ode":
        history_s0 = env_locals["history_s0"]
        history_a0 = env_locals["history_a0"]
        sn_t, ts_t = env_locals["sn_t"], env_locals["ts_t"]
        for i in idx.tolist():
            bsd = (sn_t[i] - history_s0[i, -1, :]).view(1, -1)
            pred = model(
                history_s0[i].unsqueeze(0),
                history_a0[i].unsqueeze(0),
                ts_t[i].view(1, 1),
            ).view(1, -1)
            errs.append(float(((pred - bsd) ** 2).mean()))
    else:
        s0, a0, sn, ts = (
            env_locals["s0"],
            env_locals["a0"],
            env_locals["sn"],
            env_locals["ts"],
        )
        for i in idx.tolist():
            bsd = (sn[i] - s0[i]).view(1, -1)
            pred = model(s0[i].unsqueeze(0), a0[i].unsqueeze(0), ts[i].view(1, 1)).view(1, -1)
            errs.append(float(((pred - bsd) ** 2).mean()))
    model.train()
    m = float(np.mean(errs))
    msg = f"heldout_mse={m:.6f} over {len(errs)} samples"
    print(msg)
    with open(ARGS.out, "a") as f:
        f.write(msg + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["node", "latent_ode"], required=True)
    p.add_argument("--env", default="oderl-cartpole")
    p.add_argument("--delay", type=int, default=1)
    p.add_argument("--buffer", required=True)
    p.add_argument("--seconds", type=float, default=7200)
    p.add_argument("--out", required=True)
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=20000)
    p.add_argument("--eval_samples", type=int, default=256)
    p.add_argument("--save", default=None, help="path to torch.save the trained state_dict")
    ARGS = p.parse_args()
    main()

"""Checkpoint interop with the reference torch implementation.

Reference users carry trained `NeuralLaplaceModel` checkpoints (torch
`state_dict`s saved by reference train_utils.py:442,490 and reloaded at
train_utils.py:283-288). This module maps
those to our NL pytree layout and back, so switching frameworks does not
mean retraining:

    params = nl_params_from_state_dict(torch.load("nl.pt"))   # import
    sd     = nl_state_dict_from_params(params)                # export

The mapping is exact (tests/test_ref_weight_parity.py pins forward parity
to f64 round-off against the reference's own torch modules):

- torch `nn.GRU` stores gate blocks row-stacked ``[3H, D]`` in (reset,
  update, candidate) order with separate ih/hh bias vectors — the same
  convention as models/common.py's ``_gru_cell``, so each matrix maps by
  transpose and biases map verbatim.
- `nn.Linear` weights are ``[out, in]`` (transpose), biases verbatim.
- Normalization stats / dt live in registered buffers on the reference
  module (w_nl.py:112-116) but are **constructor arguments** of
  `make_nl_model` here — they are intentionally NOT part of the params
  pytree and are dropped on import / re-emitted on export.

Functions take/return plain array mappings; torch is only needed by the
caller to `torch.load` the file (`load_torch_state_dict` wraps that when
torch is importable).

Also covered: `rnn_params_from_state_dict` (reference RNN and DeltaTRNN,
train_utils.py:552-631), `node_params_from_state_dict` (reference NODE,
train_utils.py:637-738), and `latent_ode_params_from_state_dict`
(reference GeneralLatentODEOfficial, w_latent_ode.py:22-76 over the
vendored Rubanova lib). The latent-ODE mapping targets the
reference-LAYOUT twin `models/latent_ode_ref.py` — our primary latent-ODE
rebuild (models/latent_ode.py) deviates architecturally (carried planner
history, per-row horizons) and keeps its own trained checkpoints; use
``make_model("latent_ode_ref", ...)`` to plan with transplanted reference
weights.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_GRU_LAYERS = 2  # reference w_nl.py:21 (nn.GRU(..., 2, batch_first=True))
_MLP_SLOTS = (0, 2, 4)  # Linear positions inside the linear_tanh_stack


def _np(x) -> np.ndarray:
    """Coerce a torch tensor / array-like to a float numpy array."""
    if hasattr(x, "detach"):  # torch.Tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def nl_params_from_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Reference `NeuralLaplaceModel.state_dict()` -> our NL params pytree.

    Accepts torch tensors or numpy arrays as values. Ignores the reference's
    normalization/dt buffers (constructor config here, see module docstring).
    Raises KeyError naming the first missing weight for malformed inputs.
    """
    import jax.numpy as jnp

    sd = {k: _np(v) for k, v in sd.items()}
    gru = [
        {
            "w_ih": jnp.asarray(sd[f"action_encoder.gru.weight_ih_l{layer}"].T),
            "w_hh": jnp.asarray(sd[f"action_encoder.gru.weight_hh_l{layer}"].T),
            "b_ih": jnp.asarray(sd[f"action_encoder.gru.bias_ih_l{layer}"]),
            "b_hh": jnp.asarray(sd[f"action_encoder.gru.bias_hh_l{layer}"]),
        }
        for layer in range(_GRU_LAYERS)
    ]
    out = {
        "w": jnp.asarray(sd["action_encoder.linear_out.weight"].T),
        "b": jnp.asarray(sd["action_encoder.linear_out.bias"]),
    }
    mlp = [
        {
            "w": jnp.asarray(sd[f"laplace_rep_func.linear_tanh_stack.{i}.weight"].T),
            "b": jnp.asarray(sd[f"laplace_rep_func.linear_tanh_stack.{i}.bias"]),
        }
        for i in _MLP_SLOTS
    ]
    return {"encoder": {"gru": gru, "out": out}, "laplace_rep": mlp}


def nl_state_dict_from_params(
    params: Mapping, norm=None, dt: float | None = None
) -> Dict[str, np.ndarray]:
    """Our NL params pytree -> reference-format state_dict (numpy values).

    Pass ``norm`` (a models.base.NormStats) and ``dt`` to also emit the
    reference's registered buffers so `load_state_dict` succeeds with
    `strict=True` on a reference `NeuralLaplaceModel`; omit them to emit
    weights only (load with ``strict=False``).
    """
    sd: Dict[str, np.ndarray] = {}
    for layer, p in enumerate(params["encoder"]["gru"]):
        sd[f"action_encoder.gru.weight_ih_l{layer}"] = _np(p["w_ih"]).T
        sd[f"action_encoder.gru.weight_hh_l{layer}"] = _np(p["w_hh"]).T
        sd[f"action_encoder.gru.bias_ih_l{layer}"] = _np(p["b_ih"])
        sd[f"action_encoder.gru.bias_hh_l{layer}"] = _np(p["b_hh"])
    sd["action_encoder.linear_out.weight"] = _np(params["encoder"]["out"]["w"]).T
    sd["action_encoder.linear_out.bias"] = _np(params["encoder"]["out"]["b"])
    for slot, p in zip(_MLP_SLOTS, params["laplace_rep"]):
        sd[f"laplace_rep_func.linear_tanh_stack.{slot}.weight"] = _np(p["w"]).T
        sd[f"laplace_rep_func.linear_tanh_stack.{slot}.bias"] = _np(p["b"])
    if norm is not None:
        sd["state_mean"] = _np(norm.state_mean)
        sd["state_std"] = _np(norm.state_std)
        sd["action_mean"] = _np(norm.action_mean)
        sd["action_std"] = _np(norm.action_std)
    if dt is not None:
        sd["dt"] = np.asarray(dt)
    return sd


def nl_arch_from_state_dict(
    sd: Mapping[str, "np.ndarray"], state_dim: int, ilt_algorithm: str = "fourier"
) -> dict:
    """Recover the `make_nl_model` kwargs a checkpoint was trained with.

    Returns {"s_recon_terms", "hidden_units", "gru_in"} — the knobs that
    must match between the checkpoint and `make_nl_model` or the forward
    fails with an opaque shape error deep in the planner.

    ``s_recon_terms`` is the value to PASS to the constructor for the given
    ``ilt_algorithm`` (the one the checkpoint was trained with — it is not
    recoverable from the weights). The head stores the EFFECTIVE node count
    (post CME-snap, w_nl.py:86-88), and the snap always steps the valid-term
    table back by two entries — it is NOT idempotent — so for "cme" the
    returned request is the table entry two places AFTER the stored count
    (a cme/17 reference run stores a 15-term head and must be re-requested
    as 17; tests/test_ref_weight_parity.py round-trips this).
    """
    head = _np(sd["laplace_rep_func.linear_tanh_stack.4.weight"])
    trunk = _np(sd["laplace_rep_func.linear_tanh_stack.0.weight"])
    gru_ih = _np(sd["action_encoder.gru.weight_ih_l0"])
    terms = int(head.shape[0] // (2 * state_dim))
    if ilt_algorithm == "cme":
        from .config import cme_reconstruction_terms

        table = cme_reconstruction_terms()
        idx = table.index(terms)  # ValueError = head size is no CME order
        if idx + 2 >= len(table):
            raise ValueError(f"CME head of {terms} terms exceeds the valid table")
        terms = table[idx + 2]
    return {
        "s_recon_terms": terms,
        "hidden_units": int(trunk.shape[0]),
        "gru_in": int(gru_ih.shape[1]),
    }


def rnn_params_from_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Reference `RNN` / `DeltaTRNN` state_dict -> our params pytree.

    Both reference classes (train_utils.py:552-631) are a single-layer GRU
    plus one linear head; the layout maps 1:1 onto models/rnn.py's
    {"gru": [layer0], "out": {...}} (DeltaTRNN only differs by head width,
    which the weights carry).
    """
    import jax.numpy as jnp

    sd = {k: _np(v) for k, v in sd.items()}
    return {
        "gru": [
            {
                "w_ih": jnp.asarray(sd["gru.weight_ih_l0"].T),
                "w_hh": jnp.asarray(sd["gru.weight_hh_l0"].T),
                "b_ih": jnp.asarray(sd["gru.bias_ih_l0"]),
                "b_hh": jnp.asarray(sd["gru.bias_hh_l0"]),
            }
        ],
        "out": {
            "w": jnp.asarray(sd["linear_out.weight"].T),
            "b": jnp.asarray(sd["linear_out.bias"]),
        },
    }


def rnn_state_dict_from_params(params: Mapping, norm=None, dt: float | None = None) -> Dict[str, np.ndarray]:
    """Our RNN/DeltaTRNN params pytree -> reference-format state_dict
    (inverse of rnn_params_from_state_dict; same buffer policy as the NL
    export — pass ``norm``/``dt`` to emit the registered buffers of
    train_utils.py:560-570)."""
    p = params["gru"][0]
    sd: Dict[str, np.ndarray] = {
        "gru.weight_ih_l0": _np(p["w_ih"]).T,
        "gru.weight_hh_l0": _np(p["w_hh"]).T,
        "gru.bias_ih_l0": _np(p["b_ih"]),
        "gru.bias_hh_l0": _np(p["b_hh"]),
        "linear_out.weight": _np(params["out"]["w"]).T,
        "linear_out.bias": _np(params["out"]["b"]),
    }
    if norm is not None:
        sd["state_mean"] = _np(norm.state_mean)
        sd["state_std"] = _np(norm.state_std)
        sd["action_mean"] = _np(norm.action_mean)
        sd["action_std"] = _np(norm.action_std)
    if dt is not None:
        sd["dt"] = np.asarray(dt)
    return sd


def node_params_from_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Reference `NODE` state_dict -> our params pytree.

    The learnable part is the vector-field MLP (train_utils.py:637-662);
    solver settings are constructor config on both sides.
    """
    import jax.numpy as jnp

    sd = {k: _np(v) for k, v in sd.items()}
    prefix = "x_ode_func_in_x_and_u.linear_tanh_stack"
    return {
        "ode_func": [
            {
                "w": jnp.asarray(sd[f"{prefix}.{i}.weight"].T),
                "b": jnp.asarray(sd[f"{prefix}.{i}.bias"]),
            }
            for i in _MLP_SLOTS
        ]
    }


_LO_ENC = "model.encoder_z0"
_LO_GATES = ("update", "reset")  # sigmoid-headed GRU_unit nets
_NET3 = (0, 2, 4)  # create_net(n_layers=1): Linear,Tanh,Linear,Tanh,Linear
_NET2 = (0, 2)  # hand-built Sequential(Linear,Tanh,Linear[,Sigmoid])


def _lin_in(sd, prefix: str) -> dict:
    import jax.numpy as jnp

    return {
        "w": jnp.asarray(sd[f"{prefix}.weight"].T),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _seq_in(sd, prefix: str, slots) -> list:
    return [_lin_in(sd, f"{prefix}.{i}") for i in slots]


def latent_ode_params_from_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Reference `GeneralLatentODEOfficial.state_dict()` -> the
    models/latent_ode_ref.py pytree.

    Key layout follows create_latent_ode_model.py:17-160 under the module's
    ``model`` attribute (w_latent_ode.py:55-66): GRU_unit gate nets and
    transform_z0 are 2-Linear Sequentials (slots 0, 2), both ODE nets are
    create_net 3-Linear stacks (slots 0, 2, 4), the decoder is one Linear.
    Normalization/dt buffers are constructor config here and are dropped
    (same policy as the NL mapping above).
    """
    sd = {k: _np(v) for k, v in sd.items()}
    return {
        "rec_ode": _seq_in(sd, f"{_LO_ENC}.z0_diffeq_solver.ode_func.gradient_net", _NET3),
        "gru": {
            "update": _seq_in(sd, f"{_LO_ENC}.GRU_update.update_gate", _NET2),
            "reset": _seq_in(sd, f"{_LO_ENC}.GRU_update.reset_gate", _NET2),
            "state": _seq_in(sd, f"{_LO_ENC}.GRU_update.new_state_net", _NET2),
        },
        "transform_z0": _seq_in(sd, f"{_LO_ENC}.transform_z0", _NET2),
        "gen_ode": _seq_in(sd, "model.diffeq_solver.ode_func.gradient_net", _NET3),
        "decoder": _lin_in(sd, "model.decoder.decoder.0"),
    }


def latent_ode_state_dict_from_params(
    params: Mapping, norm=None, dt: float | None = None
) -> Dict[str, np.ndarray]:
    """models/latent_ode_ref.py pytree -> reference-format state_dict.

    As with the NL export, pass ``norm``/``dt`` to emit the registered
    buffers (w_latent_ode.py:48-52) for `load_state_dict(strict=True)`.
    """
    sd: Dict[str, np.ndarray] = {}

    def put_seq(prefix: str, slots, layers):
        for slot, p in zip(slots, layers):
            sd[f"{prefix}.{slot}.weight"] = _np(p["w"]).T
            sd[f"{prefix}.{slot}.bias"] = _np(p["b"])

    put_seq(f"{_LO_ENC}.z0_diffeq_solver.ode_func.gradient_net", _NET3, params["rec_ode"])
    for gate in (*_LO_GATES, "state"):
        key = "new_state_net" if gate == "state" else f"{gate}_gate"
        put_seq(f"{_LO_ENC}.GRU_update.{key}", _NET2, params["gru"][gate])
    put_seq(f"{_LO_ENC}.transform_z0", _NET2, params["transform_z0"])
    put_seq("model.diffeq_solver.ode_func.gradient_net", _NET3, params["gen_ode"])
    sd["model.decoder.decoder.0.weight"] = _np(params["decoder"]["w"]).T
    sd["model.decoder.decoder.0.bias"] = _np(params["decoder"]["b"])
    if norm is not None:
        sd["state_mean"] = _np(norm.state_mean)
        sd["state_std"] = _np(norm.state_std)
        sd["action_mean"] = _np(norm.action_mean)
        sd["action_std"] = _np(norm.action_std)
    if dt is not None:
        sd["dt"] = np.asarray(dt)
    return sd


def latent_ode_arch_from_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Recover `make_ref_latent_ode_model` kwargs from a checkpoint:
    {"state_dim", "action_dim", "hidden_units", "rec_dims"}. latents =
    state_dim + 2 is the reference's hard rule (w_latent_ode.py:41-44);
    input_dim = state_dim + action_dim comes off the decoder head."""
    update0 = _np(sd[f"{_LO_ENC}.GRU_update.update_gate.0.weight"])
    update2 = _np(sd[f"{_LO_ENC}.GRU_update.update_gate.2.weight"])
    dec = _np(sd["model.decoder.decoder.0.weight"])
    latents = int(dec.shape[1])
    state_dim = latents - 2
    return {
        "state_dim": state_dim,
        "action_dim": int(dec.shape[0]) - state_dim,
        "hidden_units": int(update0.shape[0]),
        "rec_dims": int(update2.shape[0]),
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """`torch.load` a reference checkpoint file into a numpy state_dict.

    The reference trainer saves bare state_dicts (train_utils.py:442,490);
    a {"model_state_dict": ...} wrapper is unwrapped for convenience.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: _np(v) for k, v in obj.items()}

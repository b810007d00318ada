"""neurallaplacecontrol_tpu — a TPU-native Neural Laplace Control framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
samholt/NeuralLaplaceControl (AISTATS 2023): continuous-time dynamics models of
delayed control systems, trained from offline MPPI-expert data, planned with a
delay-aware MPPI controller — designed TPU-first:

- the differentiable inverse Laplace transform (ILT) operators are batched
  XLA/Pallas kernels (`ops.ilt`, `ops.pallas_ilt`),
- all environment physics is pure JAX so episodes run fully on-device
  (`envs`), with the 200-step control episode compiled as a single
  `lax.scan` (`training.eval`),
- the MPPI planner is one fused, jittable scan with the K-rollout batch
  shardable across chips (`planners.mppi_delay`, `parallel.sharding`),
- training is a jitted optax step with explicit PRNG keys and pytree configs
  (`training.train`).

Reference layer map: see SURVEY.md at the repo root. Citations in docstrings
(`file:line`) point into the reference tree for behavioural parity checks.
"""

__version__ = "0.1.0"

from . import ops, envs, models, planners, data, training, parallel, utils  # noqa: F401,E402
from .config import Config, parse_args  # noqa: F401,E402
from .envs import make_env  # noqa: F401,E402
from .models import make_model  # noqa: F401,E402
from .training import evaluate_policy, train_model  # noqa: F401,E402

# heavier sub-stacks import lazily on attribute access
_LAZY = {"oderl", "results", "serving", "tune"}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

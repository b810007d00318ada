import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, optax
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.data import collect_expert_data
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.training.train import make_optimizer, make_train_segment_fn

cfg = Config(collect_expert_samples=2e5, offline_datasets_path="artifacts/offlinedata/")
s0, a0, sn, ts = collect_expert_data("oderl-pendulum", 1, config=cfg)
model = make_model("nl", "oderl-pendulum", 3, 1, 2.0, cfg)
params = model.init(jax.random.PRNGKey(0))
opt = make_optimizer(cfg)
st = opt.init(params)
seg = make_train_segment_fn(model, opt)
key = jax.random.PRNGKey(1)
perm = jax.random.permutation(key, s0.shape[0])
batches = perm[:500*16*4].reshape(4, 500, 16)
for i in range(4):
    params, st, losses = seg(params, st, s0, a0, sn, ts, batches[i])
    print(f"seg {i}: mean loss {float(jnp.mean(losses)):.4e} last {float(losses[-1]):.4e}")

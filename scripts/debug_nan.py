import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.data import collect_expert_data
from neurallaplacecontrol_tpu.models import make_model
from neurallaplacecontrol_tpu.envs import make_env

cfg = Config(collect_expert_samples=2e5, offline_datasets_path="artifacts/offlinedata/")
s0, a0, sn, ts = collect_expert_data("oderl-pendulum", 1, config=cfg)
print("ts stats: min %.2e max %.2e mean %.4f" % (float(ts.min()), float(ts.max()), float(ts.mean())))
print("s0 finite:", bool(jnp.all(jnp.isfinite(s0))), "sn:", bool(jnp.all(jnp.isfinite(sn))))

env = make_env("oderl-pendulum")
model = make_model("nl", "oderl-pendulum", 3, 1, 2.0, cfg)
params = model.init(jax.random.PRNGKey(0))
b = slice(0, 16)
s0b, a0b, snb, tsb = s0[b].astype(jnp.float32), a0[b].astype(jnp.float32), sn[b].astype(jnp.float32), ts[b].astype(jnp.float32)
pred = model.apply(params, s0b, a0b, tsb)
print("pred range:", float(jnp.abs(pred).max()), "finite:", bool(jnp.all(jnp.isfinite(pred))))

def loss_fn(p):
    pr = model.apply(p, s0b, a0b, tsb)
    return jnp.mean((jnp.squeeze(pr) - jnp.squeeze(snb - s0b))**2)
loss, grads = jax.value_and_grad(loss_fn)(params)
import optax
gn = optax.global_norm(grads)
print("loss:", float(loss), "gnorm:", float(gn))
fin = jax.tree_util.tree_map(lambda g: bool(jnp.all(jnp.isfinite(g))), grads)
bad = [k for k,v in jax.tree_util.tree_flatten_with_path(fin)[0] if not v]
print("nonfinite grads:", bad[:5] if bad else "none")
# smallest-ts batch
order = jnp.argsort(ts[:,0])
bidx = order[:16]
s0b, a0b, snb, tsb = (x[bidx].astype(jnp.float32) for x in (s0,a0,sn,ts))
print("tiny ts batch:", float(tsb.min()), float(tsb.max()))
loss, grads = jax.value_and_grad(lambda p: jnp.mean((jnp.squeeze(model.apply(p,s0b,a0b,tsb))-jnp.squeeze(snb-s0b))**2))(params)
print("tiny-ts loss:", float(loss), "gnorm:", float(optax.global_norm(grads)))

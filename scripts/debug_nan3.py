import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.data import collect_expert_data
from neurallaplacecontrol_tpu.models import make_model

cfg = Config(collect_expert_samples=2e5, offline_datasets_path="artifacts/offlinedata/")
s0, a0, sn, ts = collect_expert_data("oderl-pendulum", 1, config=cfg)
model = make_model("nl", "oderl-pendulum", 3, 1, 2.0, cfg)
params = model.init(jax.random.PRNGKey(0))
app = jax.jit(model.apply)
bad_rows = []
for i in range(0, s0.shape[0], 20000):
    pred = app(params, s0[i:i+20000], a0[i:i+20000], ts[i:i+20000])
    fin = jnp.all(jnp.isfinite(pred), axis=-1)
    idx = jnp.where(~fin)[0]
    if idx.size: bad_rows.extend((int(j)+i) for j in np.asarray(idx)[:5])
    if len(bad_rows) > 5: break
print("bad rows:", bad_rows[:10])
if bad_rows:
    j = bad_rows[0]
    print("ts:", float(ts[j,0]), "s0:", np.asarray(s0[j]), "a0:", np.asarray(a0[j]).ravel())
    # drill: which intermediate goes bad
    from neurallaplacecontrol_tpu.ops.ilt import ilt_query_points
    from neurallaplacecontrol_tpu.ops.sphere import complex_to_spherical
    tnorm = jnp.maximum(ts[j:j+1,0]/0.4, 2.5e-3)
    s = ilt_query_points(tnorm.astype(jnp.float32), 17, "fourier")
    th, ph = complex_to_spherical(s)
    print("tnorm", float(tnorm[0]), "s finite:", bool(jnp.all(jnp.isfinite(s.real))), bool(jnp.all(jnp.isfinite(s.imag))))
    print("theta_s:", np.asarray(th)[0][:5], "phi_s:", np.asarray(ph)[0][:5])
else:
    print("all forward passes finite -> NaN only in grads")

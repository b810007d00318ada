import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.data import load_replay_buffer, replay_buffer_filename
from neurallaplacecontrol_tpu.models import make_model
cfg = Config()
path = os.path.join("artifacts/offlinedata", replay_buffer_filename("oderl-pendulum", 1))
s0,a0,sn,ts = load_replay_buffer(path)
model = make_model("nl","oderl-pendulum",3,1,2.0,cfg,dtype=jnp.float32)
params = model.init(jax.random.PRNGKey(0))
app = jax.jit(model.apply)
rows = jnp.asarray([67,75,115])
p_small = app(params, s0[rows].astype(jnp.float32), a0[rows].astype(jnp.float32), ts[rows].astype(jnp.float32))
print("small batch pred:", np.asarray(p_small).ravel()[:4], "finite:", bool(jnp.all(jnp.isfinite(p_small))))
chunk = app(params, s0[:20000].astype(jnp.float32), a0[:20000].astype(jnp.float32), ts[:20000].astype(jnp.float32))
fin = jnp.all(jnp.isfinite(chunk), axis=-1)
bad = np.asarray(jnp.where(~fin)[0])
print("bad in chunk:", bad[:10], "count:", bad.size)
if bad.size:
    j = int(bad[0])
    print("row", j, "ts", float(ts[j,0]))
    pj = app(params, s0[j:j+1].astype(jnp.float32), a0[j:j+1].astype(jnp.float32), ts[j:j+1].astype(jnp.float32))
    print("same row alone:", np.asarray(pj))
    # check ILT sub-pieces on TPU under jit for that row
    from neurallaplacecontrol_tpu.ops.ilt import ilt_query_points, ilt_combine
    from neurallaplacecontrol_tpu.ops.sphere import complex_to_spherical
    @jax.jit
    def probe(trow):
        t = jnp.maximum(trow/0.4, 2.5e-3)
        s = ilt_query_points(t, 17, "fourier")
        th, ph = complex_to_spherical(s)
        F = jnp.ones(t.shape+(3,17), jnp.complex64)
        return s, th, ph, ilt_combine(F, t, 17, "fourier")
    s_, th_, ph_, comb = probe(ts[j:j+1,0].astype(jnp.float32))
    print("|s|max", float(jnp.abs(s_).max()), "th fin", bool(jnp.all(jnp.isfinite(th_))), "ph fin", bool(jnp.all(jnp.isfinite(ph_))), "comb", np.asarray(comb).ravel())

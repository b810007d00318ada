import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from neurallaplacecontrol_tpu.ops.pallas_ilt import nl_head_fused, pack_head_weights
from neurallaplacecontrol_tpu.ops.ilt import ilt_combine
from neurallaplacecontrol_tpu.ops.sphere import spherical_to_complex

D, terms, H, t = 5, 17, 128, 0.125
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (H, 2*D*terms), jnp.float32)*0.05
b = jax.random.normal(jax.random.fold_in(key,1), (2*D*terms,), jnp.float32)*0.05
packed = pack_head_weights(np.asarray(w), np.asarray(b), D, terms, t)

@jax.jit
def xla_head(x):
    out = x @ w + b
    out = out.reshape(x.shape[0], 2*D, terms)
    theta = jnp.tanh(out[:, :D, :]) * jnp.pi
    phi = jnp.tanh(out[:, D:, :]) * (jnp.pi/2)
    F = spherical_to_complex(theta, phi)
    return ilt_combine(F, jnp.full((x.shape[0],), t, jnp.float32), terms, "fourier")

fused = jax.jit(lambda x: nl_head_fused(x, packed, D))

for B in (1024, 16384, 131072):
    x = jax.random.normal(jax.random.fold_in(key,2), (B, H), jnp.float32)
    a = xla_head(x); a.block_until_ready()
    c = fused(x); c.block_until_ready()
    err = float(jnp.max(jnp.abs(a - c)))
    n = 200
    t0=time.perf_counter()
    for _ in range(n): a = xla_head(x)
    a.block_until_ready(); xla_t = (time.perf_counter()-t0)/n
    t0=time.perf_counter()
    for _ in range(n): c = fused(x)
    c.block_until_ready(); pal_t = (time.perf_counter()-t0)/n
    print(f"B={B:7d} xla {xla_t*1e6:8.1f}us  pallas {pal_t*1e6:8.1f}us  speedup {xla_t/pal_t:.2f}x  maxdiff {err:.2e}")

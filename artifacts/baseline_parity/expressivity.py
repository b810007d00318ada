"""Expressivity floor of the reference RNN/DeltaTRNN class on pendulum-d0.

The class is diff = B@obs + f(action_buffer, dt) (head Linear([GRU(actions),
obs, dt]) -- additive, linear in obs). Compare ridge fits:
  A: linear class features  [obs, poly(a_last, dt)]           (the model class)
  B: + obs x (a,dt) interactions and obs x obs products        (outside it)
"""
import numpy as np
d = np.load('/root/repo/offlinedata/replay_buffer_env-name-oderl-pendulum_delay-0_model-name-oracle_encode-obs-time-False_action-buffer-size-4_ts-grid-exp_random-action-noise-1.0_observation-noise-0.0_friction-False.npz')
n = 300000
s0 = d['s0'][:n].astype(np.float64); a = d['a0'][:n,-1,0].astype(np.float64)
ts = d['ts'][:n,0].astype(np.float64); y = (d['sn'][:n]-s0).astype(np.float64)

def ridge(X, y, lam=1e-6):
    XtX = X.T@X + lam*np.eye(X.shape[1]); Xty = X.T@y
    W = np.linalg.solve(XtX, Xty)
    return ((X@W - y)**2).mean()

one = np.ones_like(a)
# rich f(a, dt): polynomial basis in (a, dt) up to degree 4
fa = [one]
for i in range(1,5):
    for j in range(0,5-i+1):
        fa.append(a**i * ts**j)
for j in range(1,5): fa.append(ts**j)
FA = np.stack(fa,1)
XA = np.concatenate([s0, FA],1)
print("class-A (linear-in-obs, rich f(a,dt)) MSE:", ridge(XA, y))

# add obs interactions: obs x dt, obs x a, obs_i x obs_j, obs x obs x dt
inter = [s0*ts[:,None], s0*a[:,None], s0*(a*ts)[:,None]]
prods = [ (s0[:,i]*s0[:,j])[:,None] for i in range(3) for j in range(i,3) ]
prods_t = [ (s0[:,i]*s0[:,j]*ts)[:,None] for i in range(3) for j in range(i,3) ]
XB = np.concatenate([XA]+inter+prods+prods_t,1)
print("class-B (+obs interactions) MSE:", ridge(XB, y))
print("zero-predictor MSE:", (y**2).mean())

"""ODE-RL stack tests: approximator families, GP interpolants, forward
simulation, CTRL container, and the training loops.

Reference: envs/oderl/{utils,ctrl}/ (SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurallaplacecontrol_tpu.envs import make_env
from neurallaplacecontrol_tpu.oderl import (
    CTRL,
    Dataset,
    collect_data,
    draw_from_gp,
    gradient_match,
    kernel_interpolate,
    make_benn,
    make_bnn,
    make_ctrl,
    make_dropout_bnn,
    make_enn,
    make_epnn,
    make_ibnn,
    make_kernel_interpolate_policy,  # noqa: F401 — public-API surface check
    make_mlp,
    simulate_deep_pilco,
    simulate_enode,
    simulate_pets,
    train_deep_pilco,  # noqa: F401 — public-API surface check
    train_dynamics,
    train_pets,
    train_policy,
)
from neurallaplacecontrol_tpu.oderl.nets import ApproxNet


# ---------------------------------------------------------------- nets


def _apply_L(net, params, key, x_LNn, L):
    noise = net.draw_noise(params, key, L)
    return net.apply(params, x_LNn, noise)


@pytest.mark.parametrize("family,n_ens", [
    ("mlp", 1), ("bnn", 1), ("enn", 4), ("epnn", 4),
    ("benn", 4), ("ibnn", 4), ("dropout_bnn", 1),
])
def test_net_shapes_and_draw_diversity(key, family, n_ens):
    n_in, n_out, L, N = 3, 2, 4, 5
    makers = {
        "mlp": lambda: make_mlp(n_in, n_out, n_hidden=16),
        "bnn": lambda: make_bnn(n_in, n_out, n_hidden=16),
        "enn": lambda: make_enn(n_ens, n_in, n_out, n_hidden=16),
        "epnn": lambda: make_epnn(n_ens, n_in, n_out, n_hidden=16),
        "benn": lambda: make_benn(n_ens, n_in, n_out, n_hidden=16),
        "ibnn": lambda: make_ibnn(n_ens, n_in, n_out, n_hidden=16),
        "dropout_bnn": lambda: make_dropout_bnn(n_in, n_out, n_hidden=16,
                                                dropout_rate=0.3),
    }
    net = makers[family]()
    params = net.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (L, N, n_in))
    y = _apply_L(net, params, jax.random.fold_in(key, 2), x, L)
    assert y.shape == (L, N, n_out)
    assert np.all(np.isfinite(np.asarray(y)))
    if family != "mlp":
        # different draws/members map the same input differently
        x_same = jnp.broadcast_to(x[:1], x.shape)
        y_same = _apply_L(net, params, jax.random.fold_in(key, 3), x_same, L)
        spread = float(jnp.abs(y_same - y_same[:1]).max())
        assert spread > 1e-6, f"{family} draws are identical"
    kl = net.kl(params)
    assert np.isfinite(float(kl))
    if family in ("bnn", "ibnn"):
        assert float(kl) > 0.0


def test_epnn_sigma_bounds(key):
    net = make_epnn(3, 4, 2, n_hidden=16)
    params = net.init(key)
    x = jax.random.normal(key, (3, 7, 4)) * 100.0  # extreme inputs
    mean, sig = net.extras["get_probs"](params, x)
    logvar = jnp.log(sig)
    # the double-softplus clamp overshoots max by exactly log1p(e^{min-max})
    # at the upper end (same slack as the reference enn.py:185-187)
    mx, mn = float(params["max_logsig"].max()), float(params["min_logsig"].min())
    slack = float(jnp.log1p(jnp.exp(mn - mx)))
    assert float(logvar.max()) <= mx + slack + 1e-6
    assert float(logvar.min()) >= mn - 1e-6


def test_ensemble_shuffle_permutes_members(key):
    net = make_enn(5, 3, 2, n_hidden=8)
    params = net.init(key)
    shuffled = net.shuffle(params, key)
    w0 = np.asarray(params[0]["W"])
    w1 = np.asarray(shuffled[0]["W"])
    assert not np.array_equal(w0, w1)
    assert np.allclose(np.sort(w0.ravel()), np.sort(w1.ravel()))  # same set


# ---------------------------------------------------------------- dataset


def test_kernel_interpolate_hits_knots(key):
    ts = jnp.linspace(0.0, 1.0, 8)
    ys = jnp.sin(3 * ts)[:, None]
    out = kernel_interpolate(ts, ys, ts, ell=0.3, sf=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ys), atol=1e-3)


def test_gp_draw_smoothness(key):
    ts = jnp.linspace(0.0, 2.0, 50)
    y_smooth = draw_from_gp(key, ts, ell=1.0)
    y_rough = draw_from_gp(key, ts, ell=0.01)
    d_smooth = float(jnp.abs(jnp.diff(y_smooth[:, 0])).mean())
    d_rough = float(jnp.abs(jnp.diff(y_rough[:, 0])).mean())
    assert d_smooth < d_rough


def test_collect_data_shapes_and_bounds(key):
    env = make_env("oderl-pendulum")
    D = collect_data(key, env, H=0.5, N=3)
    T = int(0.5 / env.spec.dt)
    assert D.s.shape == (3, T, 3) and D.a.shape == (3, T, 1)  # obs-space
    assert D.r.shape == (3, T, 1) and D.ts.shape == (3, T)
    assert float(jnp.abs(D.a).max()) <= env.spec.action_high + 1e-6
    D2 = collect_data(jax.random.fold_in(key, 1), env, H=0.5, N=2, D=D)
    assert D2.N == 5


# ---------------------------------------------------------------- dynamics


def _true_rhs_net(env):
    """Fake ApproxNet evaluating the TRUE env rhs — isolates the integrator."""
    n = env.spec.n_obs  # obs-space dynamics (trig form rhs dispatch)

    return ApproxNet(
        name="true",
        init=lambda key: {},
        apply=lambda params, x, noise: env.rhs(x[..., :n], x[..., n:]),
        draw_noise=lambda params, key, L: None,
        kl=lambda params: jnp.zeros(()),
        shuffle=lambda params, key: params,
    )


def test_simulate_enode_matches_true_integration(key):
    """With the true pendulum rhs as the 'learned' field and a constant
    policy, rk4-with-substeps must track a dense Euler reference closely,
    and the reward integral must match a trapezoid-free Riemann sum."""
    env = make_env("oderl-pendulum")
    net = _true_rhs_net(env)
    g = lambda s, t: jnp.ones(s.shape[:-1] + (1,))  # noqa: E731
    s0 = env.observe(jnp.asarray([[jnp.pi / 2, 0.0]]))
    st, rt, ts = simulate_enode(net, {}, env, g, s0, key, H=0.5, L=2,
                                substeps=20, method="rk4")
    assert st.shape == (2, 1, 10, 3) and rt.shape == (2, 1, 10)
    # dense Euler reference in the same (trig obs) space; the recorded grid
    # covers t_0 .. t_{T-1} = H - dt (reference dynamics.py:174-176 st[:T])
    s = env.observe(jnp.asarray([jnp.pi / 2, 0.0]))
    h = env.spec.dt / 200
    for _ in range(int(round((0.5 - env.spec.dt) / h))):
        s = s + h * env.rhs(s, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(st[0, 0, -1]), np.asarray(s), atol=2e-2)
    # both draws identical (deterministic field)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(st[1]), atol=1e-12)
    # reward integral increases in magnitude over time
    assert abs(float(rt[0, 0, -1])) > abs(float(rt[0, 0, 1]))


def test_simulate_pets_shapes_and_particle_spread(key):
    env = make_env("oderl-pendulum")
    net = make_epnn(3, 4, 3, n_hidden=16)
    params = net.init(key)
    g = lambda s, t: jnp.zeros(s.shape[:-1] + (1,))  # noqa: E731
    s0 = env.observe(jnp.asarray([[0.3, 0.0], [2.0, 1.0]]))
    st, rt, ts = simulate_pets(net, params, env, g, s0, key, H=0.25, P=4)
    assert st.shape == (12, 2, 5, 3) and rt.shape == (12, 2, 5)
    # stochastic heads spread the particles
    assert float(jnp.std(st[:, 0, -1, 0])) > 1e-6


def test_simulate_deep_pilco_moment_matching(key):
    env = make_env("oderl-pendulum")
    net = make_dropout_bnn(4, 3, n_hidden=16, dropout_rate=0.2)
    params = net.init(key)
    g = lambda s, t: jnp.zeros(s.shape[:-1] + (1,))  # noqa: E731
    s0 = env.observe(jnp.asarray([[1.0, 0.0]]))
    st, rt, ts = simulate_deep_pilco(net, params, env, g, s0, key, H=0.25, L=8)
    assert st.shape == (8, 1, 5, 3)
    assert np.all(np.isfinite(np.asarray(st)))


# ---------------------------------------------------------------- ctrl+train


@pytest.mark.parametrize("dynamics", ["enode", "benode", "ibnode", "pets", "deep_pilco"])
def test_ctrl_families_simulate(key, dynamics):
    env = make_env("oderl-pendulum")
    ctrl = make_ctrl(env, dynamics, n_ens=2, nn_f=16, nn_g=8, nn_V=8)
    params = ctrl.init(key)
    s0 = env.observe(jnp.asarray([[0.4, 0.0], [3.0, -1.0]]))
    st, rt, ts = ctrl.forward_simulate(params, key, 0.2, s0, L=2,
                                       compute_rew=True, substeps=2)
    assert st.shape[1] == 2 and st.shape[-1] == 3
    assert np.all(np.isfinite(np.asarray(st)))
    a = ctrl.policy_apply(params, s0)
    assert float(jnp.abs(a).max()) <= env.spec.action_high


def test_ctrl_save_load_roundtrip(key, tmp_path):
    env = make_env("oderl-pendulum")
    ctrl = make_ctrl(env, "enode", n_ens=2, nn_f=8, nn_g=8, nn_V=8)
    params = ctrl.init(key)
    path = str(tmp_path / "ctrl.npz")
    ctrl.save(params, path)
    loaded = ctrl.load(path)
    eq = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: jnp.allclose(a, b), params, loaded)
    )
    assert bool(eq)


def test_gradient_match_fits_linear_system(key):
    """ds/dt = -s + a is learnable: gradient matching must cut the loss by
    10x on data from the true system."""
    env = make_env("oderl-pendulum")
    ctrl = make_ctrl(env, "enode", n_ens=2, nl_f=1, nn_f=32, nn_g=8, nn_V=8)
    params = ctrl.init(key)
    # synthetic trajectories consistent with ds/dt = -s + a (a broadcast);
    # 3-dim "state" to match the obs-space net input
    k1, k2 = jax.random.split(key)
    s0s = jax.random.normal(k1, (4, 3))
    a = jax.random.normal(k2, (4, 30, 1))
    dt = 0.05
    ts = jnp.broadcast_to(dt * jnp.arange(30), (4, 30))

    def roll(s0, arow):
        def step(s_, a_):
            return s_ + dt * (-s_ + a_), s_

        _, traj = jax.lax.scan(step, s0, arow)
        return traj

    s = jax.vmap(roll)(s0s, a)
    D = Dataset(s=s, a=a, r=jnp.zeros((4, 30, 1)), ts=ts)
    params, losses = gradient_match(ctrl, params, D, key, n_iter=150, L=2, lr=3e-3)
    assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])


def test_train_pets_reduces_nll(key):
    env = make_env("oderl-pendulum")
    ctrl = make_ctrl(env, "pets", n_ens=2, nl_f=1, nn_f=32, nn_g=8, nn_V=8)
    params = ctrl.init(key)
    D = collect_data(key, env, H=0.5, N=4)
    params, losses = train_pets(ctrl, params, D, key, n_iter=100, lr=3e-3)
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_train_dynamics_and_policy_smoke(key):
    """End-to-end mini ODE-RL round on the pendulum: collect -> fit dynamics
    -> improve policy through imagined rollouts. Asserts learning signal
    (dynamics mse drops) and that the policy update runs and moves params."""
    env = make_env("oderl-pendulum")
    ctrl = make_ctrl(env, "enode", n_ens=2, nl_f=1, nn_f=32, nn_g=16, nn_V=16)
    params = ctrl.init(key)
    D = collect_data(key, env, H=1.0, N=4)
    params, mses = train_dynamics(ctrl, params, D, key, n_iter=100, n_seg=8,
                                  substeps=2, log_every=0)
    # per-iteration mse is noisy (fresh random segments); compare windows
    assert np.mean(mses[-10:]) < np.mean(mses[:10]), (mses[:10], mses[-10:])
    g_before = params["g"][0]["W"]
    params, rewards = train_policy(ctrl, params, D, key, n_iter=5, H=0.5,
                                   N=8, L=2, substeps=2, log_every=0)
    assert np.all(np.isfinite(rewards))
    assert not np.allclose(np.asarray(g_before), np.asarray(params["g"][0]["W"]))


def test_rbf_cross_kernel_has_no_jitter():
    """Regression: cross-covariances between DISTINCT point sets of equal
    size must not receive the eps*I self-jitter."""
    from neurallaplacecontrol_tpu.oderl.dataset import rbf_kernel

    X = jnp.linspace(0.0, 1.0, 5)[:, None]
    Q = X + 0.3
    Km = rbf_kernel(Q, X, ell=0.5, sf=1.0)
    expect = jnp.exp(-0.5 * ((Q - X.T) / 0.5) ** 2)
    np.testing.assert_allclose(np.asarray(Km), np.asarray(expect), rtol=1e-12)
    K_self = rbf_kernel(X, X, ell=0.5, sf=1.0, eps=1e-5, jitter=True)
    np.testing.assert_allclose(np.asarray(jnp.diag(K_self)), 1.0 + 1e-5, rtol=1e-10)

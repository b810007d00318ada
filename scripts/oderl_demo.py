"""ODE-RL demo: collect -> fit ENODE dynamics -> learn a policy.

Analog of reference envs/oderl/runner.py (standalone ENODE training demo).
Usage: python scripts/oderl_demo.py [env] [dynamics] — defaults pendulum
enode. Writes a rollout comparison plot and the trained CTRL checkpoint
into artifacts/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neurallaplacecontrol_tpu.envs import make_env  # noqa: E402
from neurallaplacecontrol_tpu.oderl import (  # noqa: E402
    collect_data,
    gradient_match,
    make_ctrl,
    train_dynamics,
    train_policy,
)
from neurallaplacecontrol_tpu.results.plotting import plot_trajectories  # noqa: E402
from neurallaplacecontrol_tpu.utils.logging import setup_logger  # noqa: E402


def main(env_name="oderl-pendulum", dynamics="enode"):
    logger = setup_logger(__file__)
    key = jax.random.PRNGKey(0)
    env = make_env(env_name)
    ctrl = make_ctrl(env, dynamics, n_ens=5, nl_f=2, nn_f=64, nn_g=32, nn_V=32)
    params = ctrl.init(key)

    D = collect_data(key, env, H=2.0, N=8)
    logger.info("collected %d trajectories of %d steps", D.N, D.T)

    params, gm_losses = gradient_match(ctrl, params, D, key, n_iter=300, lr=3e-3)
    logger.info("gradient match loss %.4f -> %.4f", gm_losses[0], gm_losses[-1])

    params, mses = train_dynamics(ctrl, params, D, key, n_iter=200, n_seg=16)
    logger.info("segment mse %.4f -> %.4f", mses[0], mses[-1])

    params, rewards = train_policy(ctrl, params, D, key, n_iter=100, H=1.0, N=32, L=5)
    logger.info("imagined reward %.3f -> %.3f", rewards[0], rewards[-1])

    os.makedirs("artifacts", exist_ok=True)
    ctrl.save(params, f"artifacts/ctrl_{ctrl.name}.npz")

    # model-vs-true rollout comparison under the learned policy
    s0 = env.observe(env.reset(jax.random.fold_in(key, 9)))[None]
    st, _, ts = ctrl.forward_simulate(params, key, 2.0, s0, L=ctrl.n_ens)
    # true env rollout under the same policy
    raw = env.reset(jax.random.fold_in(key, 9))
    true = []
    for _ in range(st.shape[2]):
        obs = env.observe(raw)
        true.append(obs)
        a = ctrl.policy_apply(params, obs[None])[0]
        raw = raw + env.spec.dt * env.rhs(raw, a)
    path = plot_trajectories(
        ts, jnp.stack(true), st[0], path=f"artifacts/oderl_{ctrl.name}_rollout.png",
        title=f"{ctrl.name}: learned (dashed) vs true",
    )
    logger.info("wrote %s", path)


if __name__ == "__main__":
    main(*sys.argv[1:])

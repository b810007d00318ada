"""Host-side episode rendering and video export.

The reference renders through gym's OpenGL classic-control viewer plus a
virtual X display (ctcartpole.py:348-409, ctpendulum.py:157-183,
ctacrobot.py:257-286; pyvirtualdisplay at overlay.py:15-16) and writes
videos with imageio (mppi_with_model.py:282-285). On a TPU host there is no
GL stack; here frames are rasterized with matplotlib's Agg backend from the
raw episode states recorded on-device (training.rollout.EpisodeRecords), so
rendering is a pure post-processing step over one device->host transfer
instead of a per-step render call.

Geometry matches the reference scenes: cartpole cart+pole with track,
pendulum rod from the pivot, acrobot double link. Angle conventions follow
each env's raw state layout.
"""

from __future__ import annotations

import numpy as np


def _fig_to_rgb(fig):
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


def _new_fig(xlim, ylim, figsize=(3.04, 2.0), dpi=100):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize, dpi=dpi)
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.axis("off")
    return fig, ax


def render_cartpole(raw_state, last_act=None) -> np.ndarray:
    """One cartpole frame from raw state [x, x_dot, theta, theta_dot]
    (scene layout per ctcartpole.render:348-409; theta=0 is upright)."""
    import matplotlib.pyplot as plt

    x, theta = float(raw_state[0]), float(raw_state[2])
    fig, ax = _new_fig((-4.5, 4.5), (-1.5, 1.5))
    ax.axhline(0.0, color="black", lw=0.8)  # track
    cart_w, cart_h = 0.75, 0.45
    ax.add_patch(
        plt.Rectangle((x - cart_w / 2, -cart_h / 2), cart_w, cart_h, color="#404040")
    )
    tip = (x + np.sin(theta), np.cos(theta))
    ax.plot([x, tip[0]], [cart_h / 5, cart_h / 5 + tip[1]], color="#cc9966", lw=4)
    ax.add_patch(plt.Circle((x, cart_h / 5), 0.07, color="#8080cc"))
    if last_act is not None:
        ax.arrow(x, -0.8, float(np.asarray(last_act).ravel()[0]) / 3.0, 0.0,
                 head_width=0.12, color="#cc3333")
    rgb = _fig_to_rgb(fig)
    plt.close(fig)
    return rgb


def render_pendulum(raw_state, last_act=None) -> np.ndarray:
    """One pendulum frame from raw state [theta, theta_dot]
    (ctpendulum.render:157-183; theta=0 is upright)."""
    import matplotlib.pyplot as plt

    theta = float(raw_state[0])
    fig, ax = _new_fig((-1.4, 1.4), (-1.4, 1.4), figsize=(2.0, 2.0))
    tip = (np.sin(theta), np.cos(theta))
    ax.plot([0, tip[0]], [0, tip[1]], color="#cc9966", lw=5)
    ax.add_patch(plt.Circle((0, 0), 0.05, color="#8080cc"))
    if last_act is not None:
        ax.arrow(0.0, -1.2, float(np.asarray(last_act).ravel()[0]) / 2.0, 0.0,
                 head_width=0.08, color="#cc3333")
    rgb = _fig_to_rgb(fig)
    plt.close(fig)
    return rgb


def render_acrobot(raw_state, last_act=None) -> np.ndarray:
    """One acrobot frame from raw state [theta1, theta2, dtheta1, dtheta2]
    (ctacrobot.render:257-286; theta1 measured from the DOWNWARD vertical)."""
    import matplotlib.pyplot as plt

    th1, th2 = float(raw_state[0]), float(raw_state[1])
    p1 = (np.sin(th1), -np.cos(th1))
    p2 = (p1[0] + np.sin(th1 + th2), p1[1] - np.cos(th1 + th2))
    fig, ax = _new_fig((-2.4, 2.4), (-2.4, 2.4), figsize=(2.0, 2.0))
    ax.plot([0, p1[0]], [0, p1[1]], color="#cc9966", lw=5)
    ax.plot([p1[0], p2[0]], [p1[1], p2[1]], color="#66cc99", lw=5)
    for p in ((0, 0), p1):
        ax.add_patch(plt.Circle(p, 0.06, color="#8080cc"))
    rgb = _fig_to_rgb(fig)
    plt.close(fig)
    return rgb


_RENDERERS = {
    "cartpole": render_cartpole,
    "pendulum": render_pendulum,
    "acrobot": render_acrobot,
}


def render_frame(env_name: str, raw_state, last_act=None) -> np.ndarray:
    for k, fn in _RENDERERS.items():
        if k in env_name:
            return fn(np.asarray(raw_state), last_act=last_act)
    raise ValueError(f"No renderer for env {env_name}")


def render_episode(env, records, max_frames: int = 200, delay: int = 0) -> list:
    """Render recorded episode observations (EpisodeRecords) to RGB frames.

    ``records.s0`` holds trig observations; they are mapped back to raw
    states with env.obs_to_state (base_env.obs2state:289-295). The force
    arrow shows the EXECUTED action — buffer slot -(delay+1), not the
    newest (just-planned) entry.
    """
    s0 = np.asarray(records.s0)[:max_frames]
    raws = np.asarray(env.obs_to_state(s0))
    acts = np.asarray(records.a0)[:max_frames, -(delay + 1), : env.spec.m]
    return [
        render_frame(env.spec.name, raws[i], last_act=acts[i])
        for i in range(raws.shape[0])
    ]


def save_video(frames, path: str, fps: int = 20) -> str:
    """Write frames to a video/gif file (mppi_with_model.py:282-285 analog).

    Container is chosen by the path suffix; falls back to GIF when no ffmpeg
    backend is available for mp4.
    """
    import imageio

    kwargs = (
        {"duration": 1000.0 / fps} if path.endswith(".gif") else {"fps": fps}
    )
    try:
        imageio.mimsave(path, frames, **kwargs)
    except Exception:
        if not path.endswith(".gif"):
            path = path.rsplit(".", 1)[0] + ".gif"
            imageio.mimsave(path, frames, duration=1000.0 / fps)
        else:
            raise
    return path

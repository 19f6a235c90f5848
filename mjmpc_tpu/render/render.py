"""Matplotlib-based env renderers (see package docstring)."""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..engine import chain as rb  # noqa: E402


def _fig_to_frame(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def _chain_points(model: rb.ChainModel, qpos) -> np.ndarray:
    import jax
    rots, poss = jax.jit(rb.forward_kinematics)(model,
                                                np.asarray(qpos, np.float32))
    return np.asarray(poss)


def _render_chain(env, state_t, ax, plane=(0, 2), pts=None):
    """Skeleton in a coordinate plane: body frame origins + site/target."""
    model = env.params.model
    if pts is None:
        pts = _chain_points(model, state_t.qpos)
    a, b = plane
    # draw each body as a segment from its parent frame to its own
    for i in range(model.n_joints):
        pi = model.parent[i]
        p0 = np.zeros(3) if pi < 0 else pts[pi]
        ax.plot([p0[a], pts[i][a]], [p0[b], pts[i][b]], "-o",
                color="tab:blue", markersize=3, linewidth=2)
    target = getattr(state_t, "target", None)
    if target is not None:
        t = np.asarray(target)
        ax.plot([t[a]], [t[b]], "g*", markersize=14)


def _render_pendulum(env, state_t, ax):
    th = float(np.asarray(state_t.th))
    x, y = np.sin(th), np.cos(th)
    ax.plot([0, x], [0, y], "-o", color="tab:blue", linewidth=3)
    ax.set_xlim(-1.4, 1.4)
    ax.set_ylim(-1.4, 1.4)


def _render_cartpole(env, state_t, ax):
    x = float(np.asarray(state_t.x))
    th = float(np.asarray(state_t.theta))
    ax.add_patch(plt.Rectangle((x - 0.2, -0.1), 0.4, 0.2, color="gray"))
    ax.plot([x, x + np.sin(th)], [0, np.cos(th)], "-o",
            color="tab:blue", linewidth=3)
    ax.set_xlim(x - 2.5, x + 2.5)
    ax.set_ylim(-1.4, 1.4)


def _render_point(env, state_t, ax):
    # LQRState carries .x; PointMassState and MazeState carry .pos
    x = np.asarray(getattr(state_t, "x", getattr(state_t, "pos", None)))
    ax.plot([x[0]], [x[1] if x.shape[0] > 1 else 0.0], "o",
            color="tab:blue", markersize=10)
    # goal lives in the state (maze) or in env.params (point_mass)
    goal = getattr(state_t, "goal", getattr(env.params, "goal", None))
    g = np.asarray(goal) if goal is not None else np.zeros(2)
    ax.plot([g[0]], [g[1]], "g*", markersize=14)
    obstacles = getattr(env.params, "obstacles", None)
    if obstacles is not None:
        for ox, oy, orad in np.asarray(obstacles):
            ax.add_patch(plt.Circle((ox, oy), orad, color="gray",
                                    alpha=0.5))
    ax.set_xlim(-3, 3)
    ax.set_ylim(-3, 3)


def _render_reacher(env, state_t, ax):
    _render_chain(env, state_t, ax, plane=(1, 2))   # y-z side view
    ax.set_xlim(-1.2, 0.6)
    ax.set_ylim(-0.8, 0.8)


def _render_planar(env, state_t, ax, plane=(0, 2), span=1.5):
    pts = _chain_points(env.params.model, state_t.qpos)
    _render_chain(env, state_t, ax, plane=plane, pts=pts)
    cx = pts[:, plane[0]].mean()
    ax.set_xlim(cx - span, cx + span)
    ax.set_ylim(-span, span)
    ax.axhline(0.0, color="k", linewidth=0.5)


def _fk(model, qpos):
    import jax
    rots, poss = jax.jit(rb.forward_kinematics)(
        model, np.asarray(qpos, np.float32))
    return np.asarray(rots), np.asarray(poss)


def _draw_digits(model, rots, poss, ax, plane, n_skip=0):
    """Digit chains as parent->child segments; skips `n_skip` leading arm
    bodies (drawn separately) and stops before the object bodies."""
    a, b = plane
    for i in range(n_skip, model.n_joints):
        if model.joint_types[i] != "hinge":
            continue
        pi = model.parent[i]
        p0 = np.zeros(3) if pi < 0 else poss[pi]
        ax.plot([p0[a], poss[i][a]], [p0[b], poss[i][b]], "-o",
                color="tab:blue", markersize=3, linewidth=2)


def _render_pen(env, state_t, ax):
    """Hand + free pen, x-z side view: digits, cradle ridge, pen capsule,
    desired axis ray."""
    from ..envs import pen as penmod
    model = env.params.model
    rots, poss = _fk(model, state_t.qpos)
    _draw_digits(model, rots, poss, ax, (0, 2))
    body = penmod._PEN_BODY
    hl = penmod._PEN_HL
    e0 = poss[body] + rots[body] @ np.array([-hl, 0, 0])
    e1 = poss[body] + rots[body] @ np.array([hl, 0, 0])
    ax.plot([e0[0], e1[0]], [e0[2], e1[2]], "-", color="tab:red",
            linewidth=5, solid_capstyle="round")
    d = np.asarray(state_t.desired)
    c = np.asarray(penmod._DESIRED_POS)
    ax.plot([c[0], c[0] + 0.08 * d[0]], [c[2], c[2] + 0.08 * d[2]], "--",
            color="green", linewidth=2)
    ax.add_patch(plt.Circle((0.0, 0.008), penmod._RIDGE_R, color="gray",
                            alpha=0.5))
    ax.axhline(0.0, color="k", linewidth=0.5)
    ax.set_xlim(-0.15, 0.15)
    ax.set_ylim(-0.02, 0.18)


def _render_relocate(env, state_t, ax):
    """Arm+hand + free ball, x-z side view, with the aerial target."""
    from ..envs import relocate as rl
    model = env.params.model
    rots, poss = _fk(model, state_t.qpos)
    _draw_digits(model, rots, poss, ax, (0, 2), n_skip=3)
    ax.add_patch(plt.Circle((poss[rl._BALL_BODY][0], poss[rl._BALL_BODY][2]),
                            rl._BALL_R, color="tab:red", alpha=0.8))
    t = np.asarray(state_t.target)
    ax.plot([t[0]], [t[2]], "g*", markersize=14)
    ax.axhline(0.0, color="k", linewidth=0.5)
    ax.set_xlim(-0.45, 0.45)
    ax.set_ylim(-0.05, 0.5)


def _render_hammer(env, state_t, ax):
    from ..envs import hammer as hm
    model = env.params.model
    rots, poss = _fk(model, state_t.qpos)
    _draw_digits(model, rots, poss, ax, (0, 2), n_skip=3)
    body = hm._HAMMER_BODY
    e0 = poss[body] + rots[body] @ np.array([-hm._HANDLE_HL, 0, 0])
    e1 = poss[body] + rots[body] @ np.array([hm._HANDLE_HL, 0, 0])
    head = poss[body] + rots[body] @ np.asarray(hm._HEAD_LOCAL)
    ax.plot([e0[0], e1[0]], [e0[2], e1[2]], "-", color="saddlebrown",
            linewidth=4, solid_capstyle="round")
    ax.add_patch(plt.Circle((head[0], head[2]), hm._HEAD_R,
                            color="dimgray"))
    nail = poss[hm._NAIL_BODY]
    ax.plot([nail[0], nail[0]], [0.05, nail[2]], "-", color="black",
            linewidth=2)
    ax.add_patch(plt.Circle((nail[0], nail[2]), hm._NAIL_R, color="black"))
    ax.axhline(0.0, color="k", linewidth=0.5)
    ax.set_xlim(-0.25, 0.4)
    ax.set_ylim(-0.05, 0.45)


def _render_door(env, state_t, ax):
    """Top-down (x-y) view: arm+hand, door panel swinging about its
    hinge, handle bar on the latch."""
    from ..envs import hand_door as hd
    model = env.params.model
    rots, poss = _fk(model, state_t.qpos)
    _draw_digits(model, rots, poss, ax, (0, 1), n_skip=3)
    door_b, latch_b = hd._DOOR_BODY, hd._LATCH_BODY
    hinge = poss[door_b]
    edge = poss[door_b] + rots[door_b] @ np.array([-0.30, 0, 0])
    ax.plot([hinge[0], edge[0]], [hinge[1], edge[1]], "-",
            color="saddlebrown", linewidth=5)
    ha = poss[latch_b] + rots[latch_b] @ np.asarray(hd._HANDLE_A)
    hb = poss[latch_b] + rots[latch_b] @ np.asarray(hd._HANDLE_B)
    ax.plot([ha[0], hb[0]], [ha[1], hb[1]], "-", color="dimgray",
            linewidth=4, solid_capstyle="round")
    ax.set_xlim(-0.35, 0.5)
    ax.set_ylim(-0.3, 0.45)


_RENDERERS: Dict[str, Callable] = {
    "SimplePendulum-v0": _render_pendulum,
    "cartpole-v0": _render_cartpole,
    "point_mass-v0": _render_point,
    "LQR-v0": _render_point,
    "reacher_7dof-v0": _render_reacher,
    "continual_reacher-v0": _render_reacher,
    "Swimmer-v0": lambda e, s, ax: _render_planar(e, s, ax, plane=(0, 1)),
    "HalfCheetah-v0": lambda e, s, ax: _render_planar(e, s, ax,
                                                      plane=(0, 2)),
    "acrobot-v0": lambda e, s, ax: _render_planar(e, s, ax, plane=(0, 2),
                                                  span=2.2),
    "maze-v0": _render_point,
    "continual_maze-v0": _render_point,
    "sawyer_reacher-v0": _render_reacher,
    "sawyer_pusher-v0": _render_reacher,
    "sawyer_door-v0": _render_reacher,
    "sawyer_peg_insertion-v0": _render_reacher,
    "panda_reacher-v0": _render_reacher,
    "panda_tray_glass-v0": _render_reacher,
    "trajopt_reacher-v0": lambda e, s, ax: _render_planar(
        e, s, ax, plane=(0, 1), span=0.3),
    "pen-v0": _render_pen,
    "relocate-v0": _render_relocate,
    "hammer-v0": _render_hammer,
    "door-v0": _render_door,
}

SUPPORTED = sorted(_RENDERERS)


def _index_state(states, b: int, t: int):
    import jax
    return jax.tree_util.tree_map(lambda x: x[b, t], states)


def render_trajectory(env, states, episode: int = 0,
                      fps: int = 25, figsize=(4, 4),
                      max_frames: int = 400) -> List[np.ndarray]:
    """Frames for one recorded episode (states: [B, T, ...] pytree from
    harness.run_episodes)."""
    base = env.name.split("+")[0]
    if base not in _RENDERERS:
        raise ValueError(f"no renderer for env {env.name!r}; "
                         f"supported: {SUPPORTED}")
    render = _RENDERERS[base]
    import jax
    n_t = jax.tree_util.tree_leaves(states)[0].shape[1]
    stride = max(1, -(-n_t // max_frames))  # ceil: honor the cap

    frames = []
    fig, ax = plt.subplots(figsize=figsize, dpi=80)
    for t in range(0, n_t, stride):
        ax.clear()
        ax.set_aspect("equal")
        render(env, _index_state(states, episode, t), ax)
        ax.set_title(f"{env.name}  t={t}")
        frames.append(_fig_to_frame(fig))
    plt.close(fig)
    return frames


def dump_videos(env, states, folder: str, filename: str = "vid_traj_",
                fps: int = 25, episodes=None) -> List[str]:
    """Write one video per episode (reference helpers.dump_videos role)."""
    import imageio
    import jax

    os.makedirs(folder, exist_ok=True)
    n_b = jax.tree_util.tree_leaves(states)[0].shape[0]
    episodes = range(n_b) if episodes is None else episodes
    paths = []
    for b in episodes:
        frames = render_trajectory(env, states, episode=b, fps=fps)
        path = os.path.join(folder, f"{filename}{b}.mp4")
        try:
            imageio.mimsave(path, frames, fps=fps)
        except Exception as e:  # no ffmpeg etc. — fall back to GIF
            if os.path.exists(path):
                os.remove(path)  # don't leave a truncated mp4 behind
            path = os.path.join(folder, f"{filename}{b}.gif")
            imageio.mimsave(path, frames, duration=1000.0 / fps)
        paths.append(path)
    return paths

"""continual_maze-v0: planar point-mass navigation among obstacles.

The reference REGISTERS this env but ships no module for it
(/root/reference/mjmpc/envs/__init__.py:33-37 imports a maze_env that is
absent from the tree — SURVEY.md quirks). This provides the intended
capability: a velocity-damped point robot in a box with circular
obstacles, reaching a goal that re-randomizes every `period` steps
(continual), with obstacle penetration penalized smoothly (so the MPC
cost is informative to sampled rollouts).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env

_DT = 0.05
_DAMPING = 1.0
_BOUND = 2.0
GOAL_RADIUS = 0.15

# (x, y, radius) circular obstacles
_OBSTACLES = np.array([
    [0.0, 0.0, 0.45],
    [-1.0, 1.0, 0.35],
    [1.0, -1.0, 0.35],
    [1.0, 1.0, 0.3],
    [-1.0, -1.0, 0.3],
], np.float32)


class MazeParams(NamedTuple):
    obstacles: jax.Array      # [K, 3]
    continual_period: jax.Array


class MazeState(NamedTuple):
    pos: jax.Array
    vel: jax.Array
    goal: jax.Array
    timestep: jax.Array
    key: jax.Array


def _sample_free_point(key, obstacles):
    """Rejection-free sampling: draw candidates, pick the first clear one
    (static candidate count keeps it jittable)."""
    cands = jax.random.uniform(key, (16, 2), jnp.float32,
                               -0.9 * _BOUND, 0.9 * _BOUND)
    d = jnp.linalg.norm(cands[:, None, :] - obstacles[None, :, :2],
                        axis=-1)
    clear = jnp.all(d > obstacles[None, :, 2] + 0.2, axis=-1)
    idx = jnp.argmax(clear)  # first clear candidate (or 0)
    return cands[idx]


def _init(params: MazeParams, key: jax.Array) -> MazeState:
    kp, kg, ks = jax.random.split(key, 3)
    return MazeState(
        pos=_sample_free_point(kp, params.obstacles),
        vel=jnp.zeros(2, jnp.float32),
        goal=_sample_free_point(kg, params.obstacles),
        timestep=jnp.array(0, jnp.int32), key=ks)


def _observe(params, state):
    return jnp.concatenate([state.pos, state.vel,
                            state.goal - state.pos])


def _penetration(params, pos):
    d = jnp.linalg.norm(pos[None, :] - params.obstacles[:, :2], axis=-1)
    return jnp.sum(jnp.maximum(params.obstacles[:, 2] - d, 0.0))


def _step(params: MazeParams, state: MazeState, action: jax.Array):
    u = jnp.clip(action, -1.0, 1.0)
    vel = state.vel + _DT * (u * 4.0 - _DAMPING * state.vel)
    pos = jnp.clip(state.pos + _DT * vel, -_BOUND, _BOUND)
    t = state.timestep + 1

    period = params.continual_period
    fire = (period > 0) & (t % jnp.maximum(period, 1) == 0)
    goal = jnp.where(fire,
                     _sample_free_point(jax.random.fold_in(state.key, t),
                                        params.obstacles),
                     state.goal)

    new = MazeState(pos=pos, vel=vel, goal=goal, timestep=t,
                    key=state.key)
    dist = jnp.linalg.norm(pos - goal)
    reward = -dist - 20.0 * _penetration(params, pos) \
        - 0.01 * jnp.sum(u ** 2)
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    return jnp.linalg.norm(state.pos - state.goal) < GOAL_RADIUS


def _make(period: int, name: str) -> Env:
    params = MazeParams(obstacles=jnp.asarray(_OBSTACLES),
                        continual_period=jnp.array(period, jnp.int32))
    return Env(name=name, d_obs=6, d_action=2,
               action_lows=np.full(2, -1.0, np.float32),
               action_highs=np.full(2, 1.0, np.float32),
               params=params, init=_init, step=_step, observe=_observe,
               success=_success, max_episode_steps=200)


def make() -> Env:
    return _make(0, "maze-v0")


def make_continual() -> Env:
    """Goal re-randomizes every 50 steps, like continual_reacher."""
    return _make(50, "continual_maze-v0")

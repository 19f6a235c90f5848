"""Point-mass reaching task.

Covers the reference's point-mass suite (external mjrl dependency,
README.md:33-35 / configs/point_mass): a 2D double-integrator mass driven
to a goal. Reward = -(distance to goal) - 0.01*|v|^2, matching the
quadratic-penalty shape of trajopt point-mass tasks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env


class PointMassParams(NamedTuple):
    dt: jax.Array
    mass: jax.Array
    goal: jax.Array  # [2]


class PointMassState(NamedTuple):
    pos: jax.Array  # [2]
    vel: jax.Array  # [2]


def default_params() -> PointMassParams:
    return PointMassParams(dt=jnp.float32(0.02), mass=jnp.float32(1.0),
                           goal=jnp.zeros(2, jnp.float32))


def init(params: PointMassParams, key: jax.Array) -> PointMassState:
    pos = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
    return PointMassState(pos=pos, vel=jnp.zeros(2))


def observe(params: PointMassParams, state: PointMassState) -> jax.Array:
    return jnp.concatenate([state.pos, state.vel, state.pos - params.goal])


def step(params: PointMassParams, state: PointMassState, action: jax.Array):
    u = jnp.clip(action, -1.0, 1.0)
    vel = state.vel + (u / params.mass) * params.dt
    pos = state.pos + vel * params.dt
    new = PointMassState(pos=pos, vel=vel)
    dist = jnp.linalg.norm(pos - params.goal)
    reward = -dist - 0.01 * jnp.sum(vel ** 2)
    return new, observe(params, new), reward, jnp.array(False)


def success(params: PointMassParams, state: PointMassState) -> jax.Array:
    return jnp.linalg.norm(state.pos - params.goal) < 0.025


def make(max_episode_steps: int = 100) -> Env:
    return Env(
        name="point_mass-v0",
        d_obs=6,
        d_action=2,
        action_lows=np.array([-1.0, -1.0], np.float32),
        action_highs=np.array([1.0, 1.0], np.float32),
        params=default_params(),
        init=init,
        step=step,
        observe=observe,
        success=success,
        max_episode_steps=max_episode_steps,
    )

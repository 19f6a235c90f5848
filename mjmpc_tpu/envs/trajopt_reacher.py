"""trajopt_reacher-v0: planar 2-link reacher.

The reference runs this task from the external mjrl suite (README.md:35;
tuned MPPI row at README.md:163: ep 200, H=32, N=36, lam=0.01, cov=3.0,
step=0.55). Re-designed on the in-repo engine: a 2-hinge planar arm under
zero gravity reaching a target sampled in its annulus, reward = negative
fingertip-target distance with a small control cost.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env

_DT = 0.01
_FRAME_SKIP = 2
_L = 0.1          # link length (mjrl reacher scale)
GOAL_RADIUS = 0.025


class TrajoptReacherParams(NamedTuple):
    model: rb.ChainModel


class TrajoptReacherState(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array
    target: jax.Array   # [2] planar target
    timestep: jax.Array


def build_model() -> rb.ChainModel:
    unlim = (-1e6, 1e6)
    bodies = [
        dict(pos=(0, 0, 0), axis=(0, 0, 1), range=unlim, damping=0.01,
             armature=0.002, gear=0.1,
             geoms=[rb.capsule_geom(0.01, (0, 0, 0, _L, 0, 0))]),
        dict(pos=(_L, 0, 0), axis=(0, 0, 1), range=(-3.0, 3.0),
             damping=0.01, armature=0.002, gear=0.1,
             geoms=[rb.capsule_geom(0.01, (0, 0, 0, _L, 0, 0))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=1,
                          site_pos=(_L, 0.0, 0.0))


def _fingertip(params, qpos):
    return rb.site_position(params.model, qpos)[:2]


def _init(params, key):
    kq, kt = jax.random.split(key)
    qpos = jax.random.uniform(kq, (2,), jnp.float32, -0.1, 0.1)
    # target in the reachable annulus
    ka, kr = jax.random.split(kt)
    ang = jax.random.uniform(ka, (), jnp.float32, -np.pi, np.pi)
    rad = jax.random.uniform(kr, (), jnp.float32, 0.05, 0.19)
    target = rad * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
    return TrajoptReacherState(qpos=qpos, qvel=jnp.zeros(2),
                               target=target,
                               timestep=jnp.array(0, jnp.int32))


def _observe(params, state):
    tip = _fingertip(params, state.qpos)
    return jnp.concatenate([
        jnp.cos(state.qpos), jnp.sin(state.qpos), state.qvel,
        tip, tip - state.target])


def _step(params, state, action):
    ctrl = jnp.clip(action, -1.0, 1.0)
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP)
    new = state._replace(qpos=qpos, qvel=qvel,
                         timestep=state.timestep + 1)
    dist = jnp.linalg.norm(_fingertip(params, qpos) - state.target)
    reward = -dist - 0.001 * jnp.sum(ctrl ** 2)
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    return jnp.linalg.norm(_fingertip(params, state.qpos)
                           - state.target) < GOAL_RADIUS


def make() -> Env:
    params = TrajoptReacherParams(model=build_model())
    return Env(name="trajopt_reacher-v0", d_obs=10, d_action=2,
               action_lows=np.full(2, -1.0, np.float32),
               action_highs=np.full(2, 1.0, np.float32),
               params=params, init=_init, step=_step, observe=_observe,
               success=_success, max_episode_steps=200)

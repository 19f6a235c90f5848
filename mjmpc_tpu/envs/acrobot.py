"""acrobot-v0: torque-limited two-link swing-up (continuous actions).

The reference runs acrobot through the external mj_envs classic-control
suite (README.md:33-35, configs/classic_control/); this is the standard
continuous formulation on the in-repo engine: two unit-ish links hanging
under gravity, one motor at the elbow, reward = tip height minus control
cost — swing-up means driving the tip from -2 (hanging) toward +2
(inverted).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env

_DT = 0.01
_FRAME_SKIP = 5
_L = 1.0
_R = 0.018   # geom-derived link mass ~1.0 at density 1000 (classic acrobot)


class AcrobotParams(NamedTuple):
    model: rb.ChainModel


class AcrobotState(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array


def build_model() -> rb.ChainModel:
    unlim = (-1e6, 1e6)
    bodies = [
        dict(pos=(0, 0, 0), axis=(0, 1, 0), range=unlim, damping=0.02,
             gear=0.0,  # shoulder is unactuated
             geoms=[rb.capsule_geom(_R, (0, 0, 0, 0, 0, -_L))]),
        dict(pos=(0, 0, -_L), axis=(0, 1, 0), range=unlim, damping=0.02,
             gear=8.0,
             geoms=[rb.capsule_geom(_R, (0, 0, 0, 0, 0, -_L))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=1,
                          site_pos=(0.0, 0.0, -_L),
                          gravity=(0.0, 0.0, -9.81))


def _init(params: AcrobotParams, key: jax.Array) -> AcrobotState:
    kq, kv = jax.random.split(key)
    return AcrobotState(
        qpos=jax.random.uniform(kq, (2,), jnp.float32, -0.1, 0.1),
        qvel=jax.random.uniform(kv, (2,), jnp.float32, -0.1, 0.1))


def _tip_height(params: AcrobotParams, state: AcrobotState) -> jax.Array:
    return rb.site_position(params.model, state.qpos)[2]


def _observe(params: AcrobotParams, state: AcrobotState) -> jax.Array:
    q = state.qpos
    return jnp.concatenate([jnp.cos(q), jnp.sin(q), state.qvel])


def _step(params: AcrobotParams, state: AcrobotState, action: jax.Array):
    ctrl = jnp.clip(action, -1.0, 1.0)
    full_ctrl = jnp.concatenate([jnp.zeros(1, ctrl.dtype), ctrl])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, full_ctrl,
                         n_substeps=_FRAME_SKIP)
    new = AcrobotState(qpos=qpos, qvel=qvel)
    reward = _tip_height(params, new) - 0.01 * jnp.sum(ctrl ** 2)
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params: AcrobotParams, state: AcrobotState) -> jax.Array:
    return _tip_height(params, state) > 1.5


def make() -> Env:
    params = AcrobotParams(model=build_model())
    return Env(
        name="acrobot-v0", d_obs=6, d_action=1,
        action_lows=np.array([-1.0], np.float32),
        action_highs=np.array([1.0], np.float32),
        params=params, init=_init, step=_step, observe=_observe,
        success=_success, max_episode_steps=200)

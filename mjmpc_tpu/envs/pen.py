"""pen-v0: in-hand pen reorientation (hand-manipulation-suite stand-in).

The reference runs pen/door/hammer/relocate through the external mj_envs
Adroit hand suite (README.md:33-35, configs/hand/*). Re-implementing the
24-DOF tendon hand is out of scope; this captures the CONTROL problem of
the pen task — reorient a free-rotating elongated object to a sampled
target orientation — with the hand abstracted to direct 3-axis torques
(the mj_envs pen reward is orientation similarity between the pen's long
axis and the target axis; same objective here, plus a control penalty).
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


class PenParams(NamedTuple):
    model: rb.ChainModel


class PenState(NamedTuple):
    qpos: jax.Array      # [3] rotation angles (x, y, z hinges)
    qvel: jax.Array
    desired: jax.Array   # [3] unit target axis
    timestep: jax.Array


def build_model() -> rb.ChainModel:
    unlim = (-1e6, 1e6)
    bodies = [
        dict(pos=(0, 0, 0), axis=(1, 0, 0), range=unlim, damping=0.1,
             armature=0.001, gear=0.3, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 1, 0), range=unlim, damping=0.1,
             armature=0.001, gear=0.3, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 0, 1), range=unlim, damping=0.1,
             armature=0.001, gear=0.3,
             geoms=[rb.capsule_geom(0.012, (0, 0, -0.065, 0, 0, 0.065))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=2,
                          site_pos=(0.0, 0.0, 0.065))


def _pen_axis(params: PenParams, qpos) -> jax.Array:
    rots, _ = rb.forward_kinematics(params.model, qpos)
    return rots[2] @ jnp.array([0.0, 0.0, 1.0])


def _sample_axis(key) -> jax.Array:
    v = jax.random.normal(key, (3,))
    return v / (jnp.linalg.norm(v) + 1e-8)


def _init(params, key):
    kd, _ = jax.random.split(key)
    return PenState(qpos=jnp.zeros(3), qvel=jnp.zeros(3),
                    desired=_sample_axis(kd),
                    timestep=jnp.array(0, jnp.int32))


def _observe(params, state):
    axis = _pen_axis(params, state.qpos)
    return jnp.concatenate([axis, state.qvel, state.desired,
                            axis - state.desired])


def _step(params, state, action):
    ctrl = jnp.clip(action, -1.0, 1.0)
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP)
    new = state._replace(qpos=qpos, qvel=qvel, timestep=state.timestep + 1)
    align = _pen_axis(params, qpos) @ state.desired
    reward = align - 0.01 * jnp.sum(ctrl ** 2)
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    return (_pen_axis(params, state.qpos) @ state.desired) > 0.95


def make() -> Env:
    params = PenParams(model=build_model())
    return Env(name="pen-v0", d_obs=12, d_action=3,
               action_lows=np.full(3, -1.0, np.float32),
               action_highs=np.full(3, 1.0, np.float32),
               params=params, init=_init, step=_step, observe=_observe,
               success=_success, max_episode_steps=100)


from .randomize import register_names as _register_names  # noqa: E402

_register_names("pen-v0", ["pen_rx", "pen_ry", "pen"],
                ["pen_hinge_x", "pen_hinge_y", "pen_hinge_z"],
                # reference dyn-randomize names (dyn_randomize_configs/
                # hand/pen-v0.yml): Object = the pen body, pen = its geom
                extra={"Object": 2})

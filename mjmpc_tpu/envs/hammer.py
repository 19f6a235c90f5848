"""hammer-v0: drive a nail into a board by striking it.

The reference runs hammer through the external mj_envs Adroit suite
(configs/hand/hammer-v0.yml); as with pen/relocate the 24-DOF hand is
abstracted (envs/pen.py note) and the CONTROL problem is kept: swing the
wrist-mounted hammer head to strike a nail and drive it to depth. The
nail is one slide DOF with heavy viscous damping and no restoring spring
— it stays where each blow leaves it (the plastic 'ratchet' of a real
nail) — so progress requires impacts, not pushes: the quadratic-in-
velocity contact transfer rewards fast strikes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env
from .reacher_7dof import _BODIES as _ARM_BODIES, _FRAME_SKIP, _DT

_N_ARM = 7
_HEAD_LOCAL = jnp.array([0.12, 0.0, 0.0])   # hammer head on the wrist
_HEAD_R = 0.04
_NAIL_BASE = np.array([0.45, -0.45, -0.1], np.float32)  # nail head start
_NAIL_AXIS = np.array([0.0, 0.0, -1.0], np.float32)     # driven downward
_NAIL_DEPTH = 0.08


class HammerParams(NamedTuple):
    model: rb.ChainModel
    k_contact: jax.Array
    target_depth: jax.Array


class HammerState(NamedTuple):
    qpos: jax.Array     # [8] = 7 arm + nail drive depth (>= 0)
    qvel: jax.Array
    timestep: jax.Array


def build_model() -> rb.ChainModel:
    bodies = list(_ARM_BODIES) + [
        # nail: slides along its axis only; heavy damping + no spring =
        # plastic ratchet (stays where struck)
        dict(pos=tuple(_NAIL_BASE), axis=tuple(-_NAIL_AXIS), type="slide",
             range=(-_NAIL_DEPTH, 0.0), parent=-1, damping=30.0,
             geoms=[rb.capsule_geom(0.008, (0, 0, 0, 0, 0, -0.08))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=6,
                          site_pos=tuple(np.asarray(_HEAD_LOCAL)))


def _head_and_nail(model, q):
    rots, poss = rb.forward_kinematics(model, q)
    head = poss[6] + rots[6] @ _HEAD_LOCAL
    nail_head = poss[_N_ARM]
    return head, nail_head


def _ext_forces(params: HammerParams):
    model = params.model

    def fn(_, q, qd):
        head, nail = _head_and_nail(model, q)
        diff = nail - head
        dist = jnp.linalg.norm(diff) + 1e-8
        overlap = _HEAD_R - dist
        # impact force along the nail axis, scaled by approach speed:
        # striking transfers, resting barely does
        def head_pos(qq):
            r, p = rb.forward_kinematics(model, qq)
            return p[6] + r[6] @ _HEAD_LOCAL
        v_head = jax.jvp(head_pos, (q,), (qd,))[1]
        approach = jnp.maximum(v_head @ jnp.asarray(_NAIL_AXIS), 0.0)
        fmag = jnp.where(overlap > 0.0,
                         params.k_contact * overlap * (0.2 + approach),
                         0.0)
        f = fmag * jnp.asarray(_NAIL_AXIS)
        tau = rb.point_force_to_generalized(
            model, q, _N_ARM, jnp.zeros(3), f)
        tau = tau + rb.point_force_to_generalized(
            model, q, 6, _HEAD_LOCAL, -0.2 * f)   # partial recoil
        return tau

    return fn


def _nail_depth(state) -> jax.Array:
    # slide coordinate is negative as the nail is driven; depth >= 0
    return -state.qpos[_N_ARM]


def _init(params, key):
    return HammerState(qpos=jnp.zeros(8), qvel=jnp.zeros(8),
                       timestep=jnp.array(0, jnp.int32))


def _observe(params, state):
    head, nail = _head_and_nail(params.model, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, head - nail,
        (params.target_depth - _nail_depth(state))[None]])


def _step(params: HammerParams, state: HammerState, action: jax.Array):
    ctrl = jnp.concatenate([jnp.clip(action, -1.0, 1.0), jnp.zeros(1)])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_ext_forces(params))
    new = state._replace(qpos=qpos, qvel=qvel,
                         timestep=state.timestep + 1)
    head, nail = _head_and_nail(params.model, qpos)
    reach = jnp.linalg.norm(head - nail)
    depth_err = params.target_depth - _nail_depth(new)
    reward = -0.5 * reach - 10.0 * depth_err
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    return _nail_depth(state) > 0.9 * params.target_depth


def make() -> Env:
    params = HammerParams(model=build_model(),
                          k_contact=jnp.float32(800.0),
                          target_depth=jnp.float32(_NAIL_DEPTH * 0.9))
    return Env(name="hammer-v0", d_obs=8 + 8 + 3 + 1, d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=_init, step=_step, observe=_observe,
               success=_success, max_episode_steps=150)


# reference dyn-randomize names (dyn_randomize_configs/hand/hammer-v0.yml):
# Object = the wrist-welded hammer tool (body 6); the nail is body 7.
from .randomize import register_names as _register_names  # noqa: E402
from .reacher_7dof import BODY_NAMES as _ARM_BODY_NAMES, \
    JOINT_NAMES as _ARM_JOINT_NAMES  # noqa: E402

_register_names("hammer-v0", _ARM_BODY_NAMES + ["nail"],
                _ARM_JOINT_NAMES + ["nail_slide"],
                extra={"Object": 6})

"""relocate-v0: pick up a free ball and carry it to a spatial target.

The reference runs relocate through the external mj_envs Adroit hand
suite (README.md:33-35, configs/hand/relocate-v0.yml). Grasping with a
24-DOF hand is out of scope (see envs/pen.py); this keeps the CONTROL
problem — reach a free object, acquire it, and carry it to a target in
space against gravity — with grasping abstracted to a proximity spring
(the same coupling the door task uses): within `grab_radius` the hand
exerts a spring-damper pull on the ball, so lifting works only while the
hand stays close (move too fast and the ball is dropped).

One kinematic forest: the 7-DOF arm + a ball with 3 world slide DOF
under gravity.
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
_BALL_R = 0.035
_BALL_START = np.array([0.5, -0.55, -0.25], np.float32)  # on the 'table'
_G = (0.0, 0.0, -9.81)


class RelocateParams(NamedTuple):
    model: rb.ChainModel
    arm_comp_mask: jax.Array   # gravity compensation on arm joints only
    k_grab: jax.Array
    grab_radius: jax.Array


class RelocateState(NamedTuple):
    qpos: jax.Array     # [10] = 7 arm + ball (x, y, z) offsets
    qvel: jax.Array
    target: jax.Array   # [3] carry goal
    timestep: jax.Array


def build_model() -> rb.ChainModel:
    unlim = (-1e6, 1e6)
    bodies = list(_ARM_BODIES) + [
        dict(pos=tuple(_BALL_START), axis=(1, 0, 0), type="slide",
             range=unlim, parent=-1, damping=0.3, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 1, 0), type="slide", range=unlim,
             parent=_N_ARM, damping=0.3, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 0, 1), type="slide",
             range=(-0.0, 1.5),   # floor: the table stops the ball
             parent=_N_ARM + 1, damping=0.3,
             geoms=[rb.sphere_geom(_BALL_R)]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=6,
                          site_pos=(0.03, 0.0, 0.0), gravity=_G)


def _hand_and_ball(model, q):
    rots, poss = rb.forward_kinematics(model, q)
    hand = poss[6] + rots[6] @ jnp.asarray(model.site_pos)
    ball = poss[_N_ARM + 2]
    return hand, ball


def _ext_forces(params: RelocateParams):
    model = params.model

    def fn(_, q, qd):
        # arm gravity compensation (payload-free calibration)
        comp = jax.grad(lambda qq: rb.potential_energy(model, qq))(q)
        tau = comp * params.arm_comp_mask
        # proximity-spring grasp: hand pulls the ball when close
        hand, ball = _hand_and_ball(model, q)
        diff = hand - ball
        dist = jnp.linalg.norm(diff) + 1e-8
        engaged = dist < params.grab_radius
        f = jnp.where(engaged, params.k_grab, 0.0) * diff
        tau = tau + rb.point_force_to_generalized(
            model, q, _N_ARM + 2, jnp.zeros(3), f)
        return tau

    return fn


def _init(params: RelocateParams, key: jax.Array) -> RelocateState:
    kt, _ = jax.random.split(key)
    target = jax.random.uniform(kt, (3,), jnp.float32,
                                jnp.array([0.2, -0.8, 0.0]),
                                jnp.array([0.7, -0.3, 0.35]))
    return RelocateState(qpos=jnp.zeros(10), qvel=jnp.zeros(10),
                         target=target, timestep=jnp.array(0, jnp.int32))


def _observe(params, state):
    hand, ball = _hand_and_ball(params.model, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, hand - ball, ball - state.target])


def _step(params: RelocateParams, state: RelocateState, action: jax.Array):
    ctrl = jnp.concatenate([jnp.clip(action, -1.0, 1.0), jnp.zeros(3)])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_ext_forces(params))
    new = state._replace(qpos=qpos, qvel=qvel,
                         timestep=state.timestep + 1)
    hand, ball = _hand_and_ball(params.model, qpos)
    reach = jnp.linalg.norm(hand - ball)
    carry = jnp.linalg.norm(ball - state.target)
    # mj_envs relocate shaping: reach the object, then move it to target
    reward = -reach - 2.0 * carry
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    _, ball = _hand_and_ball(params.model, state.qpos)
    return jnp.linalg.norm(ball - state.target) < 0.1


def make() -> Env:
    mask = jnp.concatenate([jnp.ones(_N_ARM), jnp.zeros(3)])
    params = RelocateParams(model=build_model(), arm_comp_mask=mask,
                            k_grab=jnp.float32(80.0),
                            grab_radius=jnp.float32(0.12))
    return Env(name="relocate-v0", d_obs=10 + 10 + 3 + 3, d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=_init, step=_step, observe=_observe,
               success=_success, max_episode_steps=150)

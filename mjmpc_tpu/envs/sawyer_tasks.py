"""Sawyer-arm task family: pusher, door, peg insertion.

The reference runs these through the external mj_envs sawyer suite
(README.md:33-35; configs/sawyer/*.yml — sawyer_reacher / sawyer_pusher /
sawyer_door / sawyer_peg_insertion). mj_envs is not vendored here; these
are re-designs of the same task capabilities on the in-repo engine, using
the reacher arm (sawyer.xml data) plus extra bodies in the same kinematic
FOREST (the parent table supports multiple roots), with smooth penalty /
spring interaction forces mapped through AD point Jacobians:

- sawyer_pusher-v0: arm + free planar block; push the block to a target.
- sawyer_door-v0: arm + hinged door; pull the handle to a target angle.
- sawyer_peg_insertion-v0: guide the wrist-mounted peg into a hole,
  rewarding axial alignment and insertion depth.

Rewards are distance-shaped like the reference suite's (weighted L1/L2
reach + task terms); success predicates give the evaluate_success metric.
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
_HAND_R = 0.08
_BLOCK_R = 0.05


# ---------------------------------------------------------------------------
# pusher
# ---------------------------------------------------------------------------

class PusherParams(NamedTuple):
    model: rb.ChainModel
    k_contact: jax.Array


class PusherState(NamedTuple):
    qpos: jax.Array     # [9] = 7 arm + block (x, y)
    qvel: jax.Array
    target: jax.Array   # [2] block goal on the plane
    timestep: jax.Array


_BLOCK_BASE = np.array([0.0, -0.1, 0.0], np.float32)


def _pusher_model() -> rb.ChainModel:
    unlim = (-1e6, 1e6)
    bodies = list(_ARM_BODIES) + [
        dict(pos=tuple(_BLOCK_BASE), axis=(1, 0, 0), type="slide",
             range=unlim, parent=-1, damping=2.0, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 1, 0), type="slide", range=unlim,
             parent=_N_ARM, damping=2.0,
             geoms=[rb.sphere_geom(_BLOCK_R)]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=6,
                          site_pos=(0.0, 0.0, 0.0))


def _hand_and_block(model, q):
    rots, poss = rb.forward_kinematics(model, q)
    return poss[6], poss[_N_ARM + 1]


def _pusher_forces(params: PusherParams):
    model = params.model

    def fn(_, q, qd):
        hand, block = _hand_and_block(model, q)
        diff = block - hand
        dist = jnp.linalg.norm(diff) + 1e-8
        overlap = (_HAND_R + _BLOCK_R) - dist
        fmag = jnp.where(overlap > 0.0, params.k_contact * overlap, 0.0)
        f = fmag * diff / dist
        tau = rb.point_force_to_generalized(
            model, q, _N_ARM + 1, jnp.zeros(3), f)
        tau = tau + rb.point_force_to_generalized(
            model, q, 6, jnp.zeros(3), -f)
        return tau

    return fn


def _pusher_init(params, key):
    kt, _ = jax.random.split(key)
    target = jax.random.uniform(kt, (2,), jnp.float32,
                                jnp.array([-0.25, -0.35]),
                                jnp.array([0.25, 0.15]))
    return PusherState(qpos=jnp.zeros(9), qvel=jnp.zeros(9),
                       target=target, timestep=jnp.array(0, jnp.int32))


def _pusher_obs(params, state):
    model = params.model
    hand, block = _hand_and_block(model, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, hand, block[:2] - state.target,
        hand - block])


def _pusher_step(params, state, action):
    ctrl = jnp.concatenate([jnp.clip(action, -1.0, 1.0), jnp.zeros(2)])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_pusher_forces(params))
    new = state._replace(qpos=qpos, qvel=qvel,
                         timestep=state.timestep + 1)
    hand, block = _hand_and_block(params.model, qpos)
    reach = jnp.linalg.norm(hand - block)
    push = jnp.linalg.norm(block[:2] - state.target)
    reward = -reach - 2.0 * push
    return new, _pusher_obs(params, new), reward, jnp.array(False)


def _pusher_success(params, state):
    _, block = _hand_and_block(params.model, state.qpos)
    return jnp.linalg.norm(block[:2] - state.target) < 0.05


def _build_pusher_fused(model: rb.ChainModel):
    """Fused Pallas rollout for sawyer_pusher-v0 (ops/pallas_forest.py):
    the arm tree + the block's 2-slide tree, the hand-block penalty
    contact of `_pusher_forces`, and the reach+push cost in ONE kernel.
    k_contact rides the extras vector so gain sweeps keep the kernel;
    model constants are baked (dyn-randomized planning takes the general
    XLA path — solvers/base.py build_solve_fn)."""
    from ..ops import pallas_forest as pf

    points = [(6, np.zeros(3, np.float32)),
              (_N_ARM + 1, np.zeros(3, np.float32))]

    def force_fn(states, extras, rots, poss):
        k = extras[2]
        (hand, vh), (block, vb) = states
        diff = pf._vsub(block, hand)
        dist = pf._vnorm(diff) + np.float32(1e-8)
        overlap = np.float32(_HAND_R + _BLOCK_R) - dist
        fmag = jnp.where(overlap > 0.0, k * overlap, np.float32(0.0))
        f = pf._vscale(fmag / dist, diff)
        return [pf._vscale(np.float32(-1.0), f), f]

    def cost_fn(q, qd, rots, poss, extras):
        hand, block = poss[6], poss[_N_ARM + 1]
        reach = pf._vnorm(pf._vsub(hand, block))
        dx = block[0] - extras[0]
        dy = block[1] - extras[1]
        push = jnp.sqrt(dx * dx + dy * dy)
        return reach + 2.0 * push

    roll = pf.build_forest_rollout(
        model, n_substeps=_FRAME_SKIP, act_bodies=list(range(_N_ARM)),
        force_fn=_with_points(force_fn, points), cost_fn=cost_fn,
        n_extras=3)

    def fused(params: PusherParams, state: PusherState, mean, noise):
        extras = jnp.concatenate([state.target, params.k_contact[None]])
        return roll(state.qpos, state.qvel, extras, mean, noise)

    return fused


def _with_points(fn, points):
    fn.points = points
    return fn


def make_pusher() -> Env:
    model = _pusher_model()
    params = PusherParams(model=model, k_contact=jnp.float32(500.0))
    return Env(name="sawyer_pusher-v0", d_obs=9 + 9 + 3 + 2 + 3,
               d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=_pusher_init, step=_pusher_step,
               observe=_pusher_obs, success=_pusher_success,
               max_episode_steps=100,
               fused_rollout=_build_pusher_fused(model))


# ---------------------------------------------------------------------------
# door
# ---------------------------------------------------------------------------

class DoorParams(NamedTuple):
    model: rb.ChainModel
    k_grab: jax.Array
    grab_radius: jax.Array
    target_angle: jax.Array


class DoorState(NamedTuple):
    qpos: jax.Array     # [8] = 7 arm + door hinge
    qvel: jax.Array
    timestep: jax.Array


_DOOR_HINGE = (0.25, -0.05, 0.0)
_HANDLE_LOCAL = jnp.array([0.3, 0.0, 0.0])


def _door_model() -> rb.ChainModel:
    bodies = list(_ARM_BODIES) + [
        dict(pos=_DOOR_HINGE, axis=(0, 0, 1), range=(0.0, 1.57),
             parent=-1, damping=1.0,
             geoms=[rb.capsule_geom(0.02, (0, 0, 0, 0.3, 0, 0))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=6,
                          site_pos=(0.0, 0.0, 0.0))


def _door_points(model, q):
    rots, poss = rb.forward_kinematics(model, q)
    handle = poss[_N_ARM] + rots[_N_ARM] @ _HANDLE_LOCAL
    return poss[6], handle


def _door_forces(params: DoorParams):
    model = params.model

    def fn(_, q, qd):
        hand, handle = _door_points(model, q)
        diff = hand - handle
        dist = jnp.linalg.norm(diff) + 1e-8
        engaged = dist < params.grab_radius
        f = jnp.where(engaged, params.k_grab, 0.0) * diff
        return rb.point_force_to_generalized(
            model, q, _N_ARM, _HANDLE_LOCAL, f)

    return fn


def _door_init(params, key):
    return DoorState(qpos=jnp.zeros(8), qvel=jnp.zeros(8),
                     timestep=jnp.array(0, jnp.int32))


def _door_obs(params, state):
    hand, handle = _door_points(params.model, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, hand - handle,
        (params.target_angle - state.qpos[-1])[None]])


def _door_step(params, state, action):
    ctrl = jnp.concatenate([jnp.clip(action, -1.0, 1.0), jnp.zeros(1)])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_door_forces(params))
    new = state._replace(qpos=qpos, qvel=qvel, timestep=state.timestep + 1)
    hand, handle = _door_points(params.model, qpos)
    reward = (-jnp.abs(params.target_angle - qpos[-1]) * 2.0
              - 0.5 * jnp.linalg.norm(hand - handle))
    return new, _door_obs(params, new), reward, jnp.array(False)


def _door_success(params, state):
    return jnp.abs(params.target_angle - state.qpos[-1]) < 0.1


def _build_door_fused(model: rb.ChainModel):
    """Fused Pallas rollout for sawyer_door-v0: arm tree + door hinge,
    the proximity-gated grab spring of `_door_forces` (force on the
    handle point only, matching the env), and the angle+reach cost in
    ONE kernel. k_grab / grab_radius / target_angle ride extras."""
    from ..ops import pallas_forest as pf

    handle_local = np.asarray(_HANDLE_LOCAL, np.float32)
    points = [(6, np.zeros(3, np.float32)), (_N_ARM, handle_local)]

    def force_fn(states, extras, rots, poss):
        k_grab, grab_r = extras[0], extras[1]
        (hand, _), (handle, _) = states
        diff = pf._vsub(hand, handle)
        dist = pf._vnorm(diff) + np.float32(1e-8)
        gain = jnp.where(dist < grab_r, k_grab, np.float32(0.0))
        zero = [jnp.zeros_like(hand[0])] * 3
        return [zero, pf._vscale(gain, diff)]

    def cost_fn(q, qd, rots, poss, extras):
        target_angle = extras[2]
        hand = poss[6]
        handle = pf._vadd(poss[_N_ARM],
                          pf._mv(rots[_N_ARM],
                                 [np.float32(v) for v in handle_local]))
        reach = pf._vnorm(pf._vsub(hand, handle))
        return 2.0 * jnp.abs(target_angle - q[_N_ARM]) + 0.5 * reach

    roll = pf.build_forest_rollout(
        model, n_substeps=_FRAME_SKIP, act_bodies=list(range(_N_ARM)),
        force_fn=_with_points(force_fn, points), cost_fn=cost_fn,
        n_extras=3)

    def fused(params: DoorParams, state: DoorState, mean, noise):
        extras = jnp.stack([params.k_grab, params.grab_radius,
                            params.target_angle])
        return roll(state.qpos, state.qvel, extras, mean, noise)

    return fused


def make_door() -> Env:
    model = _door_model()
    params = DoorParams(model=model, k_grab=jnp.float32(60.0),
                        grab_radius=jnp.float32(0.12),
                        target_angle=jnp.float32(1.2))
    return Env(name="sawyer_door-v0", d_obs=8 + 8 + 3 + 1, d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=_door_init, step=_door_step,
               observe=_door_obs, success=_door_success,
               max_episode_steps=100,
               fused_rollout=_build_door_fused(model))


# ---------------------------------------------------------------------------
# peg insertion
# ---------------------------------------------------------------------------

class PegParams(NamedTuple):
    model: rb.ChainModel
    hole_entry: jax.Array   # [3] nominal (sensed) hole position
    hole_axis: jax.Array    # [3] unit, pointing INTO the hole
    hole_depth: jax.Array
    sensor_bias: jax.Array  # [3] true-hole offset vs the sensed position
                            # (zero in v0; the v1 sensed-target variant)


class PegState(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array
    timestep: jax.Array


def _peg_model() -> rb.ChainModel:
    return rb.build_chain(list(_ARM_BODIES), dt=_DT, site_body=6,
                          site_pos=(0.12, 0.0, 0.0))


def _peg_init(params, key):
    return PegState(qpos=jnp.zeros(7), qvel=jnp.zeros(7),
                    timestep=jnp.array(0, jnp.int32))


def _peg_metrics(params: PegParams, q):
    tip = rb.site_position(params.model, q)
    rel = tip - (params.hole_entry + params.sensor_bias)
    depth = rel @ params.hole_axis                  # >0 once inside
    lateral = jnp.linalg.norm(rel - depth * params.hole_axis)
    return tip, depth, lateral


def _peg_obs(params, state):
    tip, depth, lateral = _peg_metrics(params, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, tip - params.hole_entry,
        jnp.stack([depth, lateral])])


def _peg_step(params, state, action):
    ctrl = jnp.clip(action, -1.0, 1.0)
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP)
    new = state._replace(qpos=qpos, qvel=qvel, timestep=state.timestep + 1)
    tip, depth, lateral = _peg_metrics(params, qpos)
    bottom = params.hole_entry + params.hole_depth * params.hole_axis
    # reach the hole mouth, stay on axis, drive to the bottom; the
    # explicit depth-progress term keeps the gradient alive once the
    # tip sits at the mouth (plain distance shaping flattens there)
    inserted = jnp.clip(depth, 0.0, params.hole_depth) \
        / jnp.maximum(params.hole_depth, 1e-6)
    reward = (-jnp.linalg.norm(tip - bottom)
              - 5.0 * lateral * inserted
              + 1.0 * inserted)
    return new, _peg_obs(params, new), reward, jnp.array(False)


def _peg_success(params, state):
    _, depth, lateral = _peg_metrics(params, state.qpos)
    return (depth > 0.8 * params.hole_depth) & (lateral < 0.025)


def _peg_sensed_lane(h, tip, extras):
    """Sensed-frame depth/lateral in lane dialect; `h` is the kernel
    helper module (ops.pallas_chain or ops.pallas_forest — identical
    _v* vocabularies). extras: [entry 3, axis 3, hole_depth, bias 3]."""
    entry, axis = extras[0:3], extras[3:6]
    bias = extras[7:10]
    rel = h._vsub(tip, h._vadd(entry, bias))
    depth = h._vdot(rel, axis)
    off = h._vsub(rel, h._vscale(depth, axis))
    lateral = jnp.sqrt(h._vdot(off, off) + np.float32(1e-12))
    return depth, lateral


def _peg_cost_lane(h, tip, extras):
    """THE depth-progress insertion cost (_peg_step's reward negated),
    shared by the forest open-loop kernel and the chain CL/obs kernels
    so the three fused planners can never drift from each other."""
    depth, lateral = _peg_sensed_lane(h, tip, extras)
    entry, axis, hole_depth = extras[0:3], extras[3:6], extras[6]
    bottom = h._vadd(entry, h._vscale(hole_depth, axis))
    d = h._vsub(tip, bottom)
    inserted = jnp.clip(depth, 0.0, hole_depth) \
        / jnp.maximum(hole_depth, np.float32(1e-6))
    reward = (-jnp.sqrt(h._vdot(d, d) + np.float32(1e-12))
              - 5.0 * lateral * inserted + 1.0 * inserted)
    return -reward


def _build_peg_fused(model: rb.ChainModel):
    """Fused Pallas rollout for sawyer_peg_insertion: the pure 7-joint
    arm with the depth-progress insertion cost of `_peg_step` (no
    contact). All hole parameters (entry, axis, depth, sensor bias) ride
    extras, so the v1 sensed-target variant shares the kernel."""
    from ..ops import pallas_forest as pf

    site_local = [np.float32(v) for v in np.asarray(model.site_pos)]
    sb = int(model.site_body)

    def cost_fn(q, qd, rots, poss, extras):
        tip = pf._vadd(poss[sb], pf._mv(rots[sb], site_local))
        return _peg_cost_lane(pf, tip, extras)

    roll = pf.build_forest_rollout(
        model, n_substeps=_FRAME_SKIP, act_bodies=list(range(_N_ARM)),
        force_fn=None, cost_fn=cost_fn, n_extras=10)

    def fused(params: PegParams, state: PegState, mean, noise):
        return roll(state.qpos, state.qvel, _peg_extras(params),
                    mean, noise)

    return fused


def _peg_lane_callbacks(model: rb.ChainModel):
    """Lane-dialect obs/cost callbacks for the chain CL / open-loop+obs
    peg kernels. extras layout: [entry 3, axis 3, hole_depth, bias 3]."""
    from ..ops import pallas_chain as pc

    site_local = [np.float32(v) for v in np.asarray(model.site_pos)]
    sb = int(model.site_body)

    def obs_fn(mc, q, qd, extras, fk):
        rots, poss, _, _ = fk
        tip = pc._vadd(poss[sb], pc._mv(rots[sb], site_local))
        depth, lateral = _peg_sensed_lane(pc, tip, extras)
        rel0 = pc._vsub(tip, extras[0:3])    # obs uses the UNbiased entry
        return list(q) + list(qd) + list(rel0) + [depth, lateral]

    def cost_fn(mc, q, qd, extras, fk):
        rots, poss, _, _ = fk
        tip = pc._vadd(poss[sb], pc._mv(rots[sb], site_local))
        return _peg_cost_lane(pc, tip, extras)

    return obs_fn, cost_fn


def _peg_extras(params: PegParams):
    return jnp.concatenate([
        params.hole_entry, params.hole_axis, params.hole_depth[None],
        params.sensor_bias])


def _build_peg_fused_cl(model: rb.ChainModel):
    """Fused CLOSED-LOOP-linear Pallas rollout for the peg family
    (ops/pallas_chain.build_chain_cl_rollout with peg obs/cost): the
    policy matmul over [qpos, qvel, tip - entry, depth, lateral]
    (_peg_obs) and the depth-progress insertion cost run in-kernel.
    Serves the reference-schema peg CL config
    (configs/sawyer/sawyer_peg_insertion-v0_cl.yml, reinforce block)."""
    from ..ops import pallas_chain as pc

    obs_fn, cost_fn = _peg_lane_callbacks(model)
    roll = pc.build_chain_cl_rollout(
        model, n_substeps=_FRAME_SKIP, obs_fn=obs_fn, cost_fn=cost_fn,
        d_obs=2 * _N_ARM + 5, n_extras=10)

    def fused_cl(params: PegParams, state: PegState, weights, noise):
        return roll(state.qpos, state.qvel, _peg_extras(params),
                    weights, noise)

    return fused_cl


def _build_peg_fused_obs(model: rb.ChainModel):
    """Fused open-loop rollout WITH observations (MPPIQ-with-Q path)."""
    from ..ops import pallas_chain as pc

    obs_fn, cost_fn = _peg_lane_callbacks(model)
    roll = pc.build_chain_obs_rollout(
        model, n_substeps=_FRAME_SKIP, obs_fn=obs_fn, cost_fn=cost_fn,
        d_obs=2 * _N_ARM + 5, n_extras=10)

    def fused_obs(params: PegParams, state: PegState, mean, noise):
        return roll(state.qpos, state.qvel, _peg_extras(params),
                    mean, noise)

    return fused_obs


def make_peg_insertion() -> Env:
    model = _peg_model()
    params = PegParams(model=model,
                       hole_entry=jnp.array([0.2, -0.25, -0.1]),
                       hole_axis=jnp.array([0.0, 0.0, -1.0]),
                       hole_depth=jnp.float32(0.08),
                       sensor_bias=jnp.zeros(3))
    return Env(name="sawyer_peg_insertion-v0", d_obs=7 + 7 + 3 + 2,
               d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=_peg_init, step=_peg_step,
               observe=_peg_obs, success=_peg_success,
               max_episode_steps=100,
               fused_rollout=_build_peg_fused(model),
               fused_cl_rollout=_build_peg_fused_cl(model),
               fused_obs_rollout=_build_peg_fused_obs(model))


def make_peg_insertion_v1(sensor_bias=(0.01, -0.012, 0.008)) -> Env:
    """sawyer_peg_insertion-v1: the sensed-target variant (reference
    examples/configs/sawyer/peg_insertion-v1.yml — env_name v1 with
    sim_env_name v0, dyn axis sensor_noise:target_pos in
    dyn_randomize_configs/sawyer/peg_insertion-v1.yml). The REAL hole sits
    at the nominal position plus a fixed sensor-calibration offset the
    planner's v0 model does not know about; the controller must still
    insert under that model bias. Same PegState pytree as v0, so it pairs
    with v0 in the env/sim_env split of the episode runner."""
    import dataclasses
    env = make_peg_insertion()
    params = env.params._replace(
        sensor_bias=jnp.asarray(sensor_bias, jnp.float32))
    return dataclasses.replace(env, name="sawyer_peg_insertion-v1",
                               params=params)


# Dynamics-randomization name tables — names match the reference's
# dyn_randomize_configs/sawyer/*.yml (body_mass: object/peg,
# geom_friction: obj_cylinder/table, sensor_noise handled via the v1 env).
from .reacher_7dof import BODY_NAMES as _ARM_BODY_NAMES, \
    JOINT_NAMES as _ARM_JOINT_NAMES  # noqa: E402
from .randomize import register_names as _register_names, \
    register_param_paths as _register_param_paths  # noqa: E402

for _n in ("sawyer_pusher-v0", "pusher-v0"):
    _register_names(_n, _ARM_BODY_NAMES + ["object_x", "object"],
                    _ARM_JOINT_NAMES + ["obj_slide_x", "obj_slide_y"],
                    extra={"obj_cylinder": _N_ARM + 1,
                           "obj_sphere": _N_ARM + 1,
                           "table": _N_ARM})
for _n in ("sawyer_peg_insertion-v0", "sawyer_peg_insertion-v1"):
    # the peg is welded to the wrist (body 6): its mass rides that row
    _register_names(_n, _ARM_BODY_NAMES, _ARM_JOINT_NAMES,
                    extra={"peg": 6})
    # sensor_noise: target_pos (dyn_randomize_configs/sawyer/
    # peg_insertion-v1.yml) scales the true-hole sensor offset
    _register_param_paths(_n, {"sensor_noise": {"target_pos":
                                                "sensor_bias"}})

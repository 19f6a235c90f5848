"""7-DOF arm reacher — the reference's flagship benchmark task.

Re-creation of Reacher7DOFEnv / ContinualReacher7DOFEnv
(/root/reference/mjmpc/envs/basic/reacher_env.py) on the in-repo JAX
rigid-body engine instead of mujoco_py. The physical model mirrors the
reference's sawyer.xml data (7 hinge joints, zero gravity, armature 0.004,
joint damping, torque motors with gear [20, 10x6], Euler dt=0.01 with
frame_skip=2):

- reward = -l1 - 5*l2 between the 'finger' site and the target
  (reacher_env.py:29-39);
- obs = [qpos(7), qvel(7), hand_xyz(3), hand-target(3)]
  (reacher_env.py:41-47; the reference declares observation_dim=26 but
  actually emits 20 — we emit 20);
- target resampled uniformly in the reference's box at reset
  (reacher_env.py:57-63, x~U(-.3,.3), y~U(-.2,.2), z~U(-.25,.25), offset
  never applied in the reference because target_reset overwrites site_pos
  — we match: the box IS the target distribution);
- goal_achieved: l2 < 0.025; episode success = >10 achieved steps
  (reacher_env.py:112-125);
- continual variant re-randomizes the target every 50 real steps
  (reacher_env.py:128-132), implemented with a counter + folded key in the
  state instead of mutable timed events.

State = (qpos, qvel, target_pos, timestep, key): the reference's env-state
dict {qp, qv, qa, target_pos, timestep} minus qacc, which its own
sim.forward() recomputes anyway (SURVEY.md §7 'hard parts').
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env

_FRAME_SKIP = 2
_DT = 0.01

# Kinematic/inertial data from the reference sawyer.xml (bodies without
# joints fused into their jointed parent).
_BODIES = [
    dict(  # r_shoulder_pan_link
        pos=(0.0, -0.6, 0.0), axis=(0.0, 0.0, 1.0), damping=2.0,
        armature=0.004, gear=20.0, range=(-2.2854, 1.714602),
        geoms=[rb.sphere_geom(0.05, (-0.06, 0.05, 0.2)),
               rb.sphere_geom(0.05, (0.06, 0.05, 0.2)),
               rb.sphere_geom(0.03, (-0.06, 0.09, 0.2)),
               rb.sphere_geom(0.03, (0.06, 0.09, 0.2)),
               rb.capsule_geom(0.1, (0, 0, -0.4, 0, 0, 0.2))]),
    dict(  # r_shoulder_lift_link
        pos=(0.1, 0.0, 0.0), axis=(0.0, 1.0, 0.0), damping=2.0,
        armature=0.004, gear=10.0, range=(-0.5236, 1.3963),
        geoms=[rb.capsule_geom(0.1, (0, -0.1, 0, 0, 0.1, 0))]),
    dict(  # r_upper_arm_roll_link + fused r_upper_arm_link
        pos=(0.0, 0.0, 0.0), axis=(1.0, 0.0, 0.0), damping=0.8,
        armature=0.004, gear=10.0, range=(-1.5, 1.7),
        geoms=[rb.capsule_geom(0.02, (-0.1, 0, 0, 0.1, 0, 0)),
               rb.capsule_geom(0.06, (0, 0, 0, 0.4, 0, 0))]),
    dict(  # r_elbow_flex_link
        pos=(0.4, 0.0, 0.0), axis=(0.0, 1.0, 0.0), damping=0.8,
        armature=0.004, gear=10.0, range=(-2.3213, 0.0),
        geoms=[rb.capsule_geom(0.06, (0, -0.02, 0, 0, 0.02, 0))]),
    dict(  # r_forearm_roll_link + fused r_forearm_link
        pos=(0.0, 0.0, 0.0), axis=(1.0, 0.0, 0.0), damping=0.8,
        armature=0.004, gear=10.0, range=(-1.5, 1.5),
        geoms=[rb.capsule_geom(0.02, (-0.1, 0, 0, 0.1, 0, 0)),
               rb.capsule_geom(0.05, (0, 0, 0, 0.291, 0, 0))]),
    dict(  # r_wrist_flex_link
        pos=(0.321, 0.0, 0.0), axis=(0.0, 1.0, 0.0), damping=0.8,
        armature=0.004, gear=10.0, range=(-1.094, 0.0),
        geoms=[rb.capsule_geom(0.01, (0, -0.02, 0, 0, 0.02, 0))]),
    dict(  # r_wrist_roll_link ('finger' site at frame origin)
        pos=(0.0, 0.0, 0.0), axis=(1.0, 0.0, 0.0), damping=0.8,
        armature=0.004, gear=10.0, range=(-1.5, 1.5),
        geoms=[rb.sphere_geom(0.08, (0.03, 0.0, 0.0))]),
]

N_JOINTS = 7
D_OBS = 20
GOAL_RADIUS = 0.025          # reacher_env.py:113
_TARGET_LOW = np.array([-0.3, -0.2, -0.25], np.float32)
_TARGET_HIGH = np.array([0.3, 0.2, 0.25], np.float32)


class ReacherParams(NamedTuple):
    model: rb.ChainModel
    continual_period: jax.Array   # int32; 0 = plain (non-continual) task


class ReacherState(NamedTuple):
    qpos: jax.Array        # [7]
    qvel: jax.Array        # [7]
    target: jax.Array      # [3]
    timestep: jax.Array    # int32 — reference env_timestep
    key: jax.Array         # PRNG for continual target events


def build_model() -> rb.ChainModel:
    return rb.build_chain(_BODIES, dt=_DT, site_body=6,
                          site_pos=(0.0, 0.0, 0.0))


def _sample_target(key: jax.Array) -> jax.Array:
    return jax.random.uniform(key, (3,), jnp.float32,
                              jnp.asarray(_TARGET_LOW),
                              jnp.asarray(_TARGET_HIGH))


def _init(params: ReacherParams, key: jax.Array) -> ReacherState:
    tkey, skey = jax.random.split(key)
    return ReacherState(
        qpos=jnp.zeros(N_JOINTS, jnp.float32),
        qvel=jnp.zeros(N_JOINTS, jnp.float32),
        target=_sample_target(tkey),
        timestep=jnp.array(0, jnp.int32),
        key=skey)


def _hand_pos(params: ReacherParams, state: ReacherState) -> jax.Array:
    return rb.site_position(params.model, state.qpos)


def _observe(params: ReacherParams, state: ReacherState) -> jax.Array:
    hand = _hand_pos(params, state)
    return jnp.concatenate(
        [state.qpos, state.qvel, hand, hand - state.target])


def _step(params: ReacherParams, state: ReacherState, action: jax.Array):
    ctrl = jnp.clip(action, -1.0, 1.0)
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP)
    t = state.timestep + 1

    # Continual variant: new target every `period` steps (period 0 = never).
    period = params.continual_period
    fire = (period > 0) & (t % jnp.maximum(period, 1) == 0)
    ev_key = jax.random.fold_in(state.key, t)
    target = jnp.where(fire, _sample_target(ev_key), state.target)

    new_state = ReacherState(qpos=qpos, qvel=qvel, target=target,
                             timestep=t, key=state.key)
    hand = _hand_pos(params, new_state)
    diff = hand - target
    reward = -jnp.sum(jnp.abs(diff)) - 5.0 * jnp.linalg.norm(diff)
    obs = jnp.concatenate([qpos, qvel, hand, diff])
    return new_state, obs, reward, jnp.array(False)


def _success(params: ReacherParams, state: ReacherState) -> jax.Array:
    dist = jnp.linalg.norm(_hand_pos(params, state) - state.target)
    return dist < GOAL_RADIUS


def _make(continual_period: int, name: str) -> Env:
    params = ReacherParams(model=build_model(),
                           continual_period=jnp.array(continual_period,
                                                      jnp.int32))

    # Fused Pallas rollout fast path (plain reacher only: the continual
    # variant's target can move WITHIN a planning rollout, which the
    # costs-only kernel does not model). Model constants are baked at
    # build time — build_solve_fn skips the path for dyn-randomized
    # planning params.
    fused = fused_cl = fused_obs = None
    if continual_period == 0:
        from ..ops.pallas_chain import (build_chain_cl_rollout,
                                        build_chain_rollout)
        _roll = build_chain_rollout(params.model, n_substeps=_FRAME_SKIP)

        def fused(p, state, mean, noise):
            return _roll(state.qpos, state.qvel, state.target, mean, noise)

        # closed-loop-linear fast path (Reinforce): the kernel's
        # in-register obs is exactly _observe's [qpos, qvel, hand, diff]
        _roll_cl = build_chain_cl_rollout(params.model,
                                          n_substeps=_FRAME_SKIP)

        def fused_cl(p, state, weights, noise):
            return _roll_cl(state.qpos, state.qvel, state.target,
                            weights, noise)

        # open-loop + observations fast path (MPPIQ with a plugged Q)
        from ..ops.pallas_chain import build_chain_obs_rollout
        _roll_obs = build_chain_obs_rollout(params.model,
                                            n_substeps=_FRAME_SKIP)

        def fused_obs(p, state, mean, noise):
            return _roll_obs(state.qpos, state.qvel, state.target,
                             mean, noise)

    return Env(
        name=name, d_obs=D_OBS, d_action=N_JOINTS,
        action_lows=np.full(N_JOINTS, -1.0, np.float32),
        action_highs=np.full(N_JOINTS, 1.0, np.float32),
        params=params, init=_init, step=_step, observe=_observe,
        success=_success, max_episode_steps=75, fused_rollout=fused,
        fused_cl_rollout=fused_cl, fused_obs_rollout=fused_obs)


def make() -> Env:
    """reacher_7dof-v0 (registered max 75 steps, reference envs/__init__.py)."""
    return _make(0, "reacher_7dof-v0")


def make_continual() -> Env:
    """continual_reacher-v0: target moves every 50 steps."""
    return _make(50, "continual_reacher-v0")


BODY_NAMES = [
    "r_shoulder_pan_link", "r_shoulder_lift_link", "r_upper_arm_roll_link",
    "r_elbow_flex_link", "r_forearm_roll_link", "r_wrist_flex_link",
    "r_wrist_roll_link",
]
JOINT_NAMES = [
    "r_shoulder_pan_joint", "r_shoulder_lift_joint", "r_upper_arm_roll_joint",
    "r_elbow_flex_joint", "r_forearm_roll_joint", "r_wrist_flex_joint",
    "r_wrist_roll_joint",
]

from .randomize import register_names as _register_names  # noqa: E402

for _env_name in ("reacher_7dof-v0", "continual_reacher-v0"):
    _register_names(_env_name, BODY_NAMES, JOINT_NAMES)

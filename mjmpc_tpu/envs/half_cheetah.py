"""HalfCheetah-v0: planar running quadruped half-model.

Reference: /root/reference/mjmpc/envs/basic/half_cheetah.py +
assets/xml/half_cheetah.xml — 9-DOF planar tree (rootx/rootz slides +
rooty pitch on the torso, branching into back and front legs of
thigh/shin/foot), joint springs + dampers per the XML, total mass
rescaled to 14 (settotalmass), gears [120, 90, 60, 120, 60, 30], gravity
-9.81. Reward = (x_after - x_before)/dt - 0.1*Σa² (half_cheetah.py:10-19);
obs = [qpos[1:], qvel] (17-dim); reset perturbs qpos by U(-.1,.1) and
qvel by 0.1*N(0,1).

Ground contact is a smooth penalty model (spring-damper normal force +
saturated Coulomb friction at the foot/shin endpoints), mapped to
generalized forces through AD point Jacobians — MuJoCo's LCP solver
replaced by a compliant model that XLA vectorizes over thousands of
particles (SURVEY.md §7 dynamics-drift note: contact-heavy tasks define
parity as capability, not bitwise trajectories).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env

_DT = 0.002
_FRAME_SKIP = 25        # control dt = 0.05, matching gym's 0.01 x 5
_TOTAL_MASS = 14.0
N_Q = 9
D_OBS = (N_Q - 1) + N_Q
_G = (0.0, 0.0, -9.81)


def _cap(r, pos, angle, hl):
    """Capsule geom from the XML's (pos, axisangle-about-y, half-length)."""
    d = np.array([np.sin(angle), 0.0, np.cos(angle)])
    p = np.asarray(pos)
    return rb.capsule_geom(r, tuple(p - hl * d) + tuple(p + hl * d))


_UNLIM = (-1e6, 1e6)

_BODIES = [
    dict(pos=(0, 0, 0.7), axis=(1, 0, 0), type="slide", range=_UNLIM,
         parent=-1, geoms=[]),                                   # rootx
    dict(pos=(0, 0, 0), axis=(0, 0, 1), type="slide", range=_UNLIM,
         parent=0, geoms=[]),                                    # rootz
    dict(pos=(0, 0, 0), axis=(0, 1, 0), range=_UNLIM, parent=1,  # rooty
         geoms=[rb.capsule_geom(0.046, (-0.5, 0, 0, 0.5, 0, 0)),
                _cap(0.046, (0.6, 0, 0.1), 0.87, 0.15)]),        # torso+head
    dict(pos=(-0.5, 0, 0), axis=(0, 1, 0), range=(-0.52, 1.05), parent=2,
         damping=6.0, stiffness=240.0, armature=0.1, gear=120.0,
         geoms=[_cap(0.046, (0.1, 0, -0.13), -3.8, 0.145)]),     # bthigh
    dict(pos=(0.16, 0, -0.25), axis=(0, 1, 0), range=(-0.785, 0.785),
         parent=3, damping=4.5, stiffness=180.0, armature=0.1, gear=90.0,
         geoms=[_cap(0.046, (-0.14, 0, -0.07), -2.03, 0.15)]),   # bshin
    dict(pos=(-0.28, 0, -0.14), axis=(0, 1, 0), range=(-0.4, 0.785),
         parent=4, damping=3.0, stiffness=120.0, armature=0.1, gear=60.0,
         geoms=[_cap(0.046, (0.03, 0, -0.097), -0.27, 0.094)]),  # bfoot
    dict(pos=(0.5, 0, 0), axis=(0, 1, 0), range=(-1.0, 0.7), parent=2,
         damping=4.5, stiffness=180.0, armature=0.1, gear=120.0,
         geoms=[_cap(0.046, (-0.07, 0, -0.12), 0.52, 0.133)]),   # fthigh
    dict(pos=(-0.14, 0, -0.24), axis=(0, 1, 0), range=(-1.2, 0.87),
         parent=6, damping=3.0, stiffness=120.0, armature=0.1, gear=60.0,
         geoms=[_cap(0.046, (0.065, 0, -0.09), -0.6, 0.106)]),   # fshin
    dict(pos=(0.13, 0, -0.18), axis=(0, 1, 0), range=(-0.5, 0.5),
         parent=7, damping=1.5, stiffness=60.0, armature=0.1, gear=30.0,
         geoms=[_cap(0.046, (0.045, 0, -0.07), -0.6, 0.07)]),    # ffoot
]

# Contact sample points: both capsule endpoints of each foot + shins' low
# ends (body index, local point).
_CONTACTS = [
    (5, np.array([0.03, 0, -0.097]) - 0.094 * np.array([np.sin(-0.27), 0, np.cos(-0.27)])),
    (5, np.array([0.03, 0, -0.097]) + 0.094 * np.array([np.sin(-0.27), 0, np.cos(-0.27)])),
    (8, np.array([0.045, 0, -0.07]) - 0.07 * np.array([np.sin(-0.6), 0, np.cos(-0.6)])),
    (8, np.array([0.045, 0, -0.07]) + 0.07 * np.array([np.sin(-0.6), 0, np.cos(-0.6)])),
    (4, np.array([-0.14, 0, -0.07]) - 0.15 * np.array([np.sin(-2.03), 0, np.cos(-2.03)])),
    (7, np.array([0.065, 0, -0.09]) - 0.106 * np.array([np.sin(-0.6), 0, np.cos(-0.6)])),
    (2, np.array([0.6, 0, 0.1])),   # head, so face plants don't tunnel
]
_CONTACT_R = 0.046                  # capsule radius at the sample points


class CheetahParams(NamedTuple):
    model: rb.ChainModel
    kp: jax.Array        # contact normal stiffness
    kd: jax.Array        # contact normal damping
    mu: jax.Array        # friction coefficient


class CheetahState(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array


def build_model() -> rb.ChainModel:
    model = rb.build_chain(_BODIES, dt=_DT, site_body=2,
                           site_pos=(0.0, 0.0, 0.0), gravity=_G)
    # settotalmass="14": rescale masses/inertias (MuJoCo compiler option)
    scale = _TOTAL_MASS / float(jnp.sum(model.mass))
    return model._replace(mass=model.mass * scale,
                          inertia=model.inertia * scale)


def _ext_forces(params: CheetahParams):
    model = params.model

    def fn(_, q, qd):
        tau = jnp.zeros_like(q)
        for body, pt in _CONTACTS:
            pt = jnp.asarray(pt, jnp.float32)

            def world_point(qq, body=body, pt=pt):
                r, p = rb.forward_kinematics(model, qq)
                return p[body] + r[body] @ pt

            pos, vel = jax.jvp(world_point, (q,), (qd,))
            depth = _CONTACT_R - pos[2]              # penetration below z=r
            in_contact = depth > 0.0
            fn_mag = jnp.where(
                in_contact,
                jnp.maximum(params.kp * depth - params.kd * vel[2], 0.0),
                0.0)
            # saturated Coulomb friction opposing tangential slip
            ft = -params.mu * fn_mag * jnp.tanh(vel[0] / 0.1)
            f = jnp.stack([ft, 0.0 * ft, fn_mag])
            tau = tau + rb.point_force_to_generalized(model, q, body, pt, f)
        return tau

    return fn


def _init(params: CheetahParams, key: jax.Array) -> CheetahState:
    kq, kv = jax.random.split(key)
    return CheetahState(
        qpos=jax.random.uniform(kq, (N_Q,), jnp.float32, -0.1, 0.1),
        qvel=0.1 * jax.random.normal(kv, (N_Q,), jnp.float32))


def _observe(params: CheetahParams, state: CheetahState) -> jax.Array:
    return jnp.concatenate([state.qpos[1:], state.qvel])


def _step(params: CheetahParams, state: CheetahState, action: jax.Array):
    ctrl = jnp.clip(action, -1.0, 1.0)
    full_ctrl = jnp.concatenate([jnp.zeros(3, ctrl.dtype), ctrl])
    x_before = state.qpos[0]
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, full_ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_ext_forces(params))
    new = CheetahState(qpos=qpos, qvel=qvel)
    reward_run = (qpos[0] - x_before) / (_DT * _FRAME_SKIP)
    reward_ctrl = -0.1 * jnp.sum(ctrl ** 2)
    return new, _observe(params, new), reward_run + reward_ctrl, \
        jnp.array(False)


def _loco_cost(mc, q_in, q_out, qd_out, u):
    """-(reward) of _step in the fused kernel's lane dialect
    (reference half_cheetah.py:10-19). Base dofs carry zero actions, so
    summing u^2 over the 6 actuated joints matches the env exactly."""
    inv_dt = np.float32(1.0 / (_DT * _FRAME_SKIP))
    fwd = (q_out[0] - q_in[0]) * inv_dt
    ctrl = sum(u[j] * u[j] for j in range(3, 9))
    return np.float32(0.1) * ctrl - fwd


def _build_fused(params: CheetahParams):
    """Fused Pallas rollout (ops/pallas_chain.py locomotion variant —
    the tree recursions handle the cheetah's branched legs). Contact
    gains are baked constants — build_solve_fn callers must pass
    fused=False when planning under randomized contact params."""
    from ..ops.pallas_chain import (build_chain_ext_rollout,
                                    make_ground_contact)
    contact = make_ground_contact(
        _CONTACTS, radius=_CONTACT_R, kp=float(params.kp),
        kd=float(params.kd), mu=float(params.mu))
    roll = build_chain_ext_rollout(
        params.model, n_substeps=_FRAME_SKIP, ext_fn=contact,
        step_cost_fn=_loco_cost)

    def fused(p, state, mean, noise):
        pad_m = jnp.zeros((mean.shape[0], 3), mean.dtype)
        pad_n = jnp.zeros(noise.shape[:2] + (3,), noise.dtype)
        return roll(state.qpos, state.qvel,
                    jnp.concatenate([pad_m, mean], axis=-1),
                    jnp.concatenate([pad_n, noise], axis=-1))

    return fused


def make() -> Env:
    params = CheetahParams(model=build_model(),
                           kp=jnp.float32(6000.0),
                           kd=jnp.float32(150.0),
                           mu=jnp.float32(0.4))
    return Env(
        name="HalfCheetah-v0", d_obs=D_OBS, d_action=6,
        action_lows=np.full(6, -1.0, np.float32),
        action_highs=np.full(6, 1.0, np.float32),
        params=params, init=_init, step=_step, observe=_observe,
        max_episode_steps=500, fused_rollout=_build_fused(params))


from .randomize import register_param_paths as _register_param_paths  # noqa: E402

# the ground-contact friction coefficient is a params leaf — the
# geom_friction dyn-randomize axis maps straight onto it (reference
# gym_env_wrapper.py:392-396; fused planning against a perturbed mu
# needs fused=False, the kernel bakes contact gains)
_register_param_paths("HalfCheetah-v0",
                      {"geom_friction": {"floor": "mu", "ground": "mu"}})

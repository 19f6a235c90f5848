"""Panda task family: tray-glass balancing.

The reference's panda configs (examples/configs/panda/tray_glass*.yml,
reacher.yml — external mj_envs tasks) center on carrying a glass on a
wrist-mounted tray to a target without letting it slide off. Re-designed
on the in-repo engine: the 7-DOF arm carries a tray at the wrist; the
glass is a free body whose two slide joints are PARENTED TO THE WRIST
(the kinematic-forest parent table), so it lives in the tray's local
plane. Slide-joint damping models tray friction; tilting the tray
gravity-loads the glass through the same generalized dynamics.

- reward: reach the target with the tray center while keeping the glass
  near the tray center; a large penalty applies once the glass leaves
  the tray radius (it 'falls off').
- success: tray within 7.5 cm of target AND glass still on the tray.

The biased-model variant (tray_glass-v1_biased_model.yml upstream) is
expressed with sim_env_name / dynamics randomization on glass mass.
"""
from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env
from .randomize import register_names
from .reacher_7dof import _BODIES as _ARM_BODIES, _FRAME_SKIP, _DT, \
    BODY_NAMES as _ARM_BODY_NAMES, JOINT_NAMES as _ARM_JOINT_NAMES

_N_ARM = 7
_TRAY_R = 0.12
_GLASS_R = 0.03
_G = (0.0, 0.0, -9.81)


class TrayGlassParams(NamedTuple):
    model: rb.ChainModel
    fall_penalty: jax.Array


class TrayGlassState(NamedTuple):
    qpos: jax.Array     # [9] = 7 arm + glass (tray-local x, y)
    qvel: jax.Array
    target: jax.Array   # [3] tray goal position
    timestep: jax.Array


def build_model() -> rb.ChainModel:
    bodies = list(_ARM_BODIES) + [
        # glass slides in the wrist/tray local x-y plane; the slide range
        # is generous — falling off is handled by the reward, the hard
        # range only stops runaway coordinates
        dict(pos=(0.03, 0.0, 0.09), axis=(1, 0, 0), type="slide",
             range=(-0.5, 0.5), parent=6, damping=0.6, geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 1, 0), type="slide",
             range=(-0.5, 0.5), parent=_N_ARM, damping=0.6,
             geoms=[rb.capsule_geom(_GLASS_R, (0, 0, 0, 0, 0, 0.1))]),
    ]
    return rb.build_chain(bodies, dt=_DT, site_body=6,
                          site_pos=(0.03, 0.0, 0.09), gravity=_G)


def _tray_and_glass(model, q):
    rots, poss = rb.forward_kinematics(model, q)
    tray = poss[6] + rots[6] @ jnp.asarray(model.site_pos)
    glass = poss[_N_ARM + 1]
    return tray, glass


_ARM_MASK = jnp.concatenate([jnp.ones(_N_ARM), jnp.zeros(2)])


def _gravity_compensation(params: TrayGlassParams):
    """Payload-calibrated gravity feedforward on the ARM joints (standard
    industrial compensation): cancels the configuration-dependent weight
    load — including holding the glass — so the motors shape MOTION. The
    glass's own slide DOFs are NOT compensated: tray tilt still makes it
    slide downhill, which is the control problem."""
    full = params.model

    def fn(_, q, qd):
        comp = jax.grad(lambda qq: rb.potential_energy(full, qq))(q)
        return comp * _ARM_MASK

    return fn


def _init(params: TrayGlassParams, key: jax.Array) -> TrayGlassState:
    kt, _ = jax.random.split(key)
    # targets in the arm's natural workspace around the tray's home pose
    target = jax.random.uniform(kt, (3,), jnp.float32,
                                jnp.array([0.3, -0.85, -0.1]),
                                jnp.array([0.8, -0.35, 0.3]))
    return TrayGlassState(qpos=jnp.zeros(9), qvel=jnp.zeros(9),
                          target=target, timestep=jnp.array(0, jnp.int32))


def _observe(params, state):
    tray, glass = _tray_and_glass(params.model, state.qpos)
    return jnp.concatenate([
        state.qpos, state.qvel, tray - state.target, glass - tray])


def _glass_offset(state):
    return jnp.linalg.norm(state.qpos[_N_ARM:_N_ARM + 2])


def _step(params: TrayGlassParams, state: TrayGlassState,
          action: jax.Array):
    ctrl = jnp.concatenate([jnp.clip(action, -1.0, 1.0), jnp.zeros(2)])
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_gravity_compensation(params))
    new = state._replace(qpos=qpos, qvel=qvel,
                         timestep=state.timestep + 1)
    tray, _ = _tray_and_glass(params.model, qpos)
    reach = jnp.linalg.norm(tray - state.target)
    slide = _glass_offset(new)
    off_tray = slide > _TRAY_R
    reward = (-reach - 2.0 * slide
              - jnp.where(off_tray, params.fall_penalty, 0.0))
    return new, _observe(params, new), reward, jnp.array(False)


def _success(params, state):
    tray, _ = _tray_and_glass(params.model, state.qpos)
    return (jnp.linalg.norm(tray - state.target) < 0.075) \
        & (_glass_offset(state) < _TRAY_R)


def _build_tray_fused(model: rb.ChainModel):
    """Fused Pallas rollout for the tray-glass family
    (ops/pallas_forest.py): one 9-DOF tree (arm + wrist-parented glass
    slides), the arm gravity feedforward of `_gravity_compensation`
    (computed in lane dialect from the kernel's own FK: comp[d] =
    -sum_i m_i g . J_com(d,i), the gradient of V(q) = -sum m_i g.c_i
    restricted to arm DOFs), and the reach+slide+fall cost in ONE
    kernel. target / fall_penalty ride extras; model constants (incl.
    the v1 damping and fixed-v1 range clamps) are baked per variant."""
    from ..ops import pallas_forest as pf

    mass = np.asarray(model.mass, np.float32)
    com = np.asarray(model.com, np.float32)
    grav = np.asarray(model.gravity, np.float32)
    parent = [int(p) for p in model.parent]
    types = list(model.joint_types)
    site_local = [np.float32(v) for v in np.asarray(model.site_pos)]
    n = len(types)

    def _ancestors(i):
        out = []
        k = i
        while k >= 0:
            out.append(k)
            k = parent[k]
        return out

    def torque_fn(q, qd, extras, fk):
        rots, poss, axes, origins = fk
        comp = {}
        for i in range(n):
            ci = pf._vadd(poss[i],
                          pf._mv(rots[i], pf._const_vec(com[i])))
            m = np.float32(mass[i])
            for d in _ancestors(i):
                if d >= _N_ARM:
                    continue
                if types[d] == "hinge":
                    jv = pf._vcross(axes[d], pf._vsub(ci, origins[d]))
                else:
                    jv = axes[d]
                gdot = (np.float32(grav[0]) * jv[0]
                        + np.float32(grav[1]) * jv[1]
                        + np.float32(grav[2]) * jv[2])
                term = -m * gdot
                comp[d] = term if d not in comp else comp[d] + term
        return comp

    def cost_fn(q, qd, rots, poss, extras):
        target = extras[0:3]
        fall = extras[3]
        tray = pf._vadd(poss[6], pf._mv(rots[6], site_local))
        reach = pf._vnorm(pf._vsub(tray, target))
        slide = jnp.sqrt(q[_N_ARM] * q[_N_ARM]
                         + q[_N_ARM + 1] * q[_N_ARM + 1])
        return reach + 2.0 * slide \
            + jnp.where(slide > np.float32(_TRAY_R), fall,
                        np.float32(0.0))

    roll = pf.build_forest_rollout(
        model, n_substeps=_FRAME_SKIP, act_bodies=list(range(_N_ARM)),
        force_fn=None, cost_fn=cost_fn, n_extras=4,
        joint_torque_fn=torque_fn)

    def fused(params: TrayGlassParams, state: TrayGlassState, mean,
              noise):
        extras = jnp.concatenate([state.target,
                                  params.fall_penalty[None]])
        return roll(state.qpos, state.qvel, extras, mean, noise)

    return fused


def _make_tray_env(model: rb.ChainModel, name: str, init,
                   max_episode_steps: int) -> Env:
    """Single construction point for the tray-glass family: each variant
    passes its own (already-modified) model so only ONE ChainModel and
    ONE fused kernel are built per make_* call, and a future Env-field
    addition cannot be silently dropped by a dataclasses.replace chain."""
    params = TrayGlassParams(model=model, fall_penalty=jnp.float32(5.0))
    return Env(name=name, d_obs=9 + 9 + 3 + 3,
               d_action=7,
               action_lows=np.full(7, -1.0, np.float32),
               action_highs=np.full(7, 1.0, np.float32),
               params=params, init=init, step=_step, observe=_observe,
               success=_success, max_episode_steps=max_episode_steps,
               fused_rollout=_build_tray_fused(model))


def make() -> Env:
    return _make_tray_env(build_model(), "panda_tray_glass-v0", _init,
                          max_episode_steps=100)


def _init_v1(params: TrayGlassParams, key: jax.Array) -> TrayGlassState:
    """v1 resets with the glass already displaced from the tray center —
    the controller must first recentre it on a slipperier tray."""
    kt, kg = jax.random.split(key)
    target = jax.random.uniform(kt, (3,), jnp.float32,
                                jnp.array([0.3, -0.85, -0.1]),
                                jnp.array([0.8, -0.35, 0.3]))
    glass0 = jax.random.uniform(kg, (2,), jnp.float32, -0.05, 0.05)
    qpos = jnp.zeros(9).at[_N_ARM:].set(glass0)
    return TrayGlassState(qpos=qpos, qvel=jnp.zeros(9),
                          target=target, timestep=jnp.array(0, jnp.int32))


def make_v1() -> Env:
    """panda_tray_glass-v1: the harder variant the reference runs via the
    external mj_envs task (examples/configs/panda/tray_glass-v1.yml) —
    lower tray friction (the v1 dyn-randomize axis is geom_friction on
    tray/glass, dyn_randomize_configs/panda/tray_glass-v1.yml) and a
    randomized initial glass offset. Shares the v0 state pytree."""
    model = build_model()
    # slipperier tray: halve the glass-slide viscous damping (friction)
    damping = model.damping.at[_N_ARM:].mul(0.5)
    model = model._replace(damping=damping)
    return _make_tray_env(model, "panda_tray_glass-v1", _init_v1,
                          max_episode_steps=75)


def make_fixed_v1() -> Env:
    """panda_tray_glass_fixed-v1: the BIASED internal model of the
    tray_glass-v1_biased_model experiment (reference
    examples/configs/panda/tray_glass-v1_biased_model.yml — env_name v1,
    sim_env_name fixed-v1): the glass is rigidly attached to the tray
    (its slide DOFs clamped at zero), so a planner using this model
    believes the glass can never slide off. State pytree matches v1, so
    it drops into the sim_env slot of the episode runner."""
    model = build_model()
    # keep v1's slipperier damping AND clamp the slide DOFs
    damping = model.damping.at[_N_ARM:].mul(0.5)
    zero = jnp.zeros(2, jnp.float32)
    model = model._replace(
        damping=damping,
        qpos_low=model.qpos_low.at[_N_ARM:].set(zero),
        qpos_high=model.qpos_high.at[_N_ARM:].set(zero))
    return _make_tray_env(model, "panda_tray_glass_fixed-v1", _init_v1,
                          max_episode_steps=75)


# name tables for dynamics randomization (glass mass/damping by name).
# tray_collision / glass_collision are the reference's geom names
# (dyn_randomize_configs/panda/tray_glass-v1.yml); geom friction maps to
# the glass-slide viscous damping rows of the chain.
for _name in ("panda_tray_glass-v0", "panda_tray_glass-v1",
              "panda_tray_glass_fixed-v1"):
    register_names(_name,
                   _ARM_BODY_NAMES + ["glass_x", "glass"],
                   _ARM_JOINT_NAMES + ["glass_slide_x", "glass_slide_y"],
                   extra={"tray_collision": _N_ARM,
                          "glass_collision": _N_ARM + 1})

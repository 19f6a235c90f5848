"""Swimmer-v0: 5-link planar swimmer in viscous fluid.

Reference: /root/reference/mjmpc/envs/basic/swimmer.py +
assets/xml/swimmer.xml — torso with a free planar base (slide x, slide y,
hinge z) plus 4 actuated hinge joints (gear 20, range ±1.5), capsule links
0.3 long, dt 0.005 x frame_skip 4, water-density fluid. Reward =
(x_after - x_before) / dt - 1e-4 * Σa² (swimmer.py:10-19); obs =
[qpos[2:], qvel] (12-dim, swimmer.py:21-24); reset perturbs qpos/qvel by
U(-0.1, 0.1) (swimmer.py:26-30).

Fluid model: MuJoCo derives per-body fluid forces from the density/
viscosity options; here each link gets slender-body anisotropic quadratic
drag (F = -c_perp |v_n| v_n - c_par |v_t| v_t per sample point, two sample
points per link so distributed drag exerts torque), mapped to generalized
forces through AD point Jacobians. Same swimming mechanics, not
bit-identical dynamics (SURVEY.md §7 MuJoCo-drift note).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import chain as rb
from .base import Env

_DT = 0.005
_FRAME_SKIP = 4
_DENSITY = 1000.0
_N_LINKS = 5
_LINK_LEN = 0.3
_LINK_R = [0.07, 0.065, 0.06, 0.055, 0.05]
N_Q = 3 + 4           # slide x, slide y, base yaw + 4 joints
D_OBS = (N_Q - 2) + N_Q   # qpos[2:] + qvel


def _bodies():
    unlim = (-1e6, 1e6)
    bodies = [
        dict(pos=(0, 0, 0), axis=(1, 0, 0), type="slide", range=unlim,
             geoms=[]),
        dict(pos=(0, 0, 0), axis=(0, 1, 0), type="slide", range=unlim,
             geoms=[]),
        # torso link carries the first capsule
        dict(pos=(0, 0, 0), axis=(0, 0, 1), range=unlim,
             geoms=[rb.capsule_geom(_LINK_R[0], (0, 0, 0, _LINK_LEN, 0, 0))]),
    ]
    for i in range(1, _N_LINKS):
        bodies.append(dict(
            pos=(_LINK_LEN, 0, 0),
            axis=(0, 0, 1), range=(-1.5, 1.5), gear=20.0,
            geoms=[rb.capsule_geom(_LINK_R[i],
                                   (0, 0, 0, _LINK_LEN, 0, 0))]))
    return bodies


def build_model() -> rb.ChainModel:
    return rb.build_chain(_bodies(), dt=_DT, site_body=2,
                          site_pos=(0.0, 0.0, 0.0))


class SwimmerParams(NamedTuple):
    model: rb.ChainModel
    drag_perp: jax.Array   # per-link perpendicular drag coefficient
    drag_par: jax.Array    # per-link parallel drag coefficient


class SwimmerState(NamedTuple):
    qpos: jax.Array
    qvel: jax.Array


def _drag_coeffs():
    # quadratic slender-body drag: 0.5 * rho * Cd * frontal area
    per = [0.5 * _DENSITY * 1.0 * (_LINK_LEN * 2 * r) for r in _LINK_R]
    par = [0.5 * _DENSITY * 0.1 * (np.pi * r * r) for r in _LINK_R]
    return (jnp.asarray(per, jnp.float32), jnp.asarray(par, jnp.float32))


def _ext_forces(params: SwimmerParams):
    """Generalized fluid-drag forces: two sample points per capsule."""
    model = params.model
    link_bodies = list(range(2, 2 + _N_LINKS))
    samples = [0.25 * _LINK_LEN, 0.75 * _LINK_LEN]

    def fn(_, q, qd):
        tau = jnp.zeros_like(q)
        rots, _ = rb.forward_kinematics(model, q)
        for li, body in enumerate(link_bodies):
            axis_w = rots[body] @ jnp.array([1.0, 0.0, 0.0])
            for s in samples:
                pt = jnp.array([s, 0.0, 0.0])

                def world_point(qq, body=body, pt=pt):
                    r, p = rb.forward_kinematics(model, qq)
                    return p[body] + r[body] @ pt

                v = jax.jvp(world_point, (q,), (qd,))[1]
                v_par = (v @ axis_w) * axis_w
                v_perp = v - v_par
                # saturated quadratic drag: cap the |v| factor so the
                # stiff high-speed regime cannot overshoot the explicit
                # substep (drag force stays bounded)
                f = (-params.drag_perp[li] * 0.5
                     * jnp.minimum(jnp.linalg.norm(v_perp), 4.0) * v_perp
                     - params.drag_par[li] * 0.5
                     * jnp.minimum(jnp.linalg.norm(v_par), 4.0) * v_par)
                tau = tau + rb.point_force_to_generalized(
                    model, q, body, pt, f)
        return tau

    return fn


def _init(params: SwimmerParams, key: jax.Array) -> SwimmerState:
    kq, kv = jax.random.split(key)
    return SwimmerState(
        qpos=jax.random.uniform(kq, (N_Q,), jnp.float32, -0.1, 0.1),
        qvel=jax.random.uniform(kv, (N_Q,), jnp.float32, -0.1, 0.1))


def _observe(params: SwimmerParams, state: SwimmerState) -> jax.Array:
    return jnp.concatenate([state.qpos[2:], state.qvel])


# Velocity ceiling: quadratic drag is stiff at speed — beyond this the
# explicit sub-stepping can overshoot (MuJoCo's implicit fluid solve has
# no such limit; swimming speeds stay far below it in practice).
_VEL_LIMIT = jnp.asarray([8.0, 8.0, 25.0, 25.0, 25.0, 25.0, 25.0],
                         jnp.float32)


def _step(params: SwimmerParams, state: SwimmerState, action: jax.Array):
    ctrl = jnp.clip(action, -1.0, 1.0)
    full_ctrl = jnp.concatenate([jnp.zeros(3, ctrl.dtype), ctrl])
    x_before = state.qpos[0]
    qpos, qvel = rb.step(params.model, state.qpos, state.qvel, full_ctrl,
                         n_substeps=_FRAME_SKIP,
                         ext_force_fn=_ext_forces(params))
    qvel = jnp.clip(qvel, -_VEL_LIMIT, _VEL_LIMIT)
    new = SwimmerState(qpos=qpos, qvel=qvel)
    reward_fwd = (qpos[0] - x_before) / (_DT * _FRAME_SKIP)
    reward_ctrl = -1e-4 * jnp.sum(ctrl ** 2)
    return new, _observe(params, new), reward_fwd + reward_ctrl, \
        jnp.array(False)


def _loco_cost(mc, q_in, q_out, qd_out, u):
    """-(reward) of _step in the fused kernel's lane dialect: forward
    x-progress per control step minus the quadratic action cost
    (reference swimmer.py:10-19). Base dofs carry zero actions, so
    summing u^2 over the actuated joints only matches the env exactly."""
    inv_dt = np.float32(1.0 / (_DT * _FRAME_SKIP))
    fwd = (q_out[0] - q_in[0]) * inv_dt
    ctrl = sum(u[j] * u[j] for j in range(3, 3 + _N_LINKS - 1))
    return np.float32(1e-4) * ctrl - fwd


def _build_fused(params: SwimmerParams):
    """Fused Pallas rollout (ops/pallas_chain.py locomotion variant):
    drag coefficients are baked constants — build_solve_fn callers must
    pass fused=False when planning under randomized fluid params."""
    from ..ops.pallas_chain import (build_chain_ext_rollout,
                                    make_capsule_drag)
    drag = make_capsule_drag(
        link_bodies=range(2, 2 + _N_LINKS),
        sample_offsets=(0.25 * _LINK_LEN, 0.75 * _LINK_LEN),
        drag_perp=np.asarray(params.drag_perp),
        drag_par=np.asarray(params.drag_par))
    roll = build_chain_ext_rollout(
        params.model, n_substeps=_FRAME_SKIP, ext_fn=drag,
        step_cost_fn=_loco_cost, vel_limit=np.asarray(_VEL_LIMIT))

    def fused(p, state, mean, noise):
        # pad the 4-dim action space onto the 7 scalar dofs (the env's
        # zero-concat ctrl layout — base slides/yaw are unactuated)
        pad_m = jnp.zeros((mean.shape[0], 3), mean.dtype)
        pad_n = jnp.zeros(noise.shape[:2] + (3,), noise.dtype)
        return roll(state.qpos, state.qvel,
                    jnp.concatenate([pad_m, mean], axis=-1),
                    jnp.concatenate([pad_n, noise], axis=-1))

    return fused


def make() -> Env:
    params = SwimmerParams(build_model(), *_drag_coeffs())
    return Env(
        name="Swimmer-v0", d_obs=D_OBS, d_action=4,
        action_lows=np.full(4, -1.0, np.float32),
        action_highs=np.full(4, 1.0, np.float32),
        params=params, init=_init, step=_step, observe=_observe,
        max_episode_steps=500, fused_rollout=_build_fused(params))

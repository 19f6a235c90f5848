"""Rigid-body dynamics for serial revolute chains, as pure JAX functions.

This is the framework's replacement for the reference's external native
simulator (mujoco_py; SURVEY.md §2.9): a minimal articulated-body engine
sufficient for the reference's arm tasks (sawyer.xml — 7 hinge joints, no
gravity option set, torque actuators, viscous joint damping + armature;
/root/reference/mjmpc/envs/assets/xml/sawyer.xml).

Design, TPU-first:
- everything is fixed-shape dense linear algebra over [n_joints]-sized
  arrays, vmapped over thousands of particles — no per-body Python objects,
  no dynamic control flow;
- the mass matrix comes from Jacobian composition (M = Σ Jᵥᵀ m Jᵥ + Jωᵀ I Jω),
  a batched small-matmul formulation that XLA maps well;
- Coriolis/centrifugal bias is derived from the SAME mass-matrix function by
  automatic differentiation (Ṁ q̇ − ∇_q KE), so the dynamics are self-
  consistent by construction: there is no separately hand-derived RNEA to
  drift out of sync;
- integration mirrors MuJoCo's 'Euler' semantics: semi-implicit Euler with
  implicit joint damping — solve (M + dt·D) q̈ = τ − bias − D q̇, then
  q̇ += dt q̈, q += dt q̇.

Joint limits are enforced by projection (clamp qpos, zero the outward
velocity) rather than MuJoCo's soft constraint solver; the reference tasks
operate away from the limits and BASELINE parity is defined on
(qpos, qvel, target) state equivalence (SURVEY.md §7 'hard parts').
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.tree_util.register_dataclass)
@dataclasses.dataclass(frozen=True)
class ChainModel:
    """Static description of a kinematic tree (n joints == n bodies).

    Body i's frame is offset `body_pos[i]` from its parent's frame
    (`parent[i]`, -1 = world); each joint moves body i's frame along/about
    `joint_axis[i]` (unit, in the body frame): 'hinge' (rotation) or
    'slide' (translation). Free planar bases (swimmer, half-cheetah) are
    modeled MuJoCo-style as slide+slide+hinge virtual joints on massless
    proximal bodies; branches (cheetah legs) via the parent table. Fused
    (joint-less) bodies are pre-merged into their jointed parent at
    model-build time.

    Topology (`parent`, `joint_types`, `dt`, `site_body`) is static
    metadata — python values at trace time, so kinematics unrolls with
    real branching and no masked blends; the physical parameters are
    traced array leaves (vmappable, randomizable, donatable).
    """
    joint_axis: jax.Array   # [n, 3] unit axes, child-body frame
    body_pos: jax.Array     # [n, 3] frame offset from parent frame
    mass: jax.Array         # [n]
    com: jax.Array          # [n, 3] body-frame COM
    inertia: jax.Array      # [n, 3, 3] about COM, body frame
    armature: jax.Array     # [n] rotor inertia added to M diagonal
    damping: jax.Array      # [n] viscous joint damping
    stiffness: jax.Array    # [n] joint spring stiffness (rest at q = 0)
    gear: jax.Array         # [n] actuator torque scaling
    qpos_low: jax.Array     # [n]
    qpos_high: jax.Array    # [n]
    gravity: jax.Array      # [3] world gravity vector
    site_pos: jax.Array     # [3] site offset in site_body's frame
    parent: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    joint_types: Tuple[str, ...] = dataclasses.field(
        metadata=dict(static=True))
    dt: float = dataclasses.field(metadata=dict(static=True))
    site_body: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_joints(self) -> int:
        return len(self.parent)

    def ancestor_mask(self) -> np.ndarray:
        """mask[i, k] = 1 if joint k moves body i (k on i's root path)."""
        return _ancestor_mask(self.parent)

    def _replace(self, **kw) -> "ChainModel":
        return dataclasses.replace(self, **kw)


@functools.lru_cache(maxsize=None)
def _ancestor_mask(parent: Tuple[int, ...]) -> np.ndarray:
    n = len(parent)
    mask = np.zeros((n, n), np.float32)
    for i in range(n):
        k = i
        while k >= 0:
            mask[i, k] = 1.0
            k = parent[k]
    return mask


def _rodrigues(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotation matrix about a unit axis (batched-friendly, no branching)."""
    x, y, z = axis[0], axis[1], axis[2]
    k = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], axis.dtype)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=axis.dtype) + s * k + (1.0 - c) * (k @ k)


def forward_kinematics(model: ChainModel, q: jax.Array):
    """World-frame pose of every body frame.

    Returns (rot [n,3,3] body->world, pos [n,3] frame origins).
    """
    # Static unroll over the (small, fixed) tree: topology is python-level
    # metadata, so branching and hinge/slide selection happen at trace
    # time and the whole kinematics fuses into one XLA computation — a
    # lax.scan here would serialize tiny kernels and dominate latency.
    # HIGHEST matmul precision: at the TPU default (bf16 passes) the
    # composed rotations drift ~0.2% and the error compounds through the
    # mass matrix, AD bias, and every integration substep.
    n = model.n_joints
    eye = jnp.eye(3, dtype=q.dtype)
    zero = jnp.zeros(3, q.dtype)
    rots, poss = [], []
    with jax.default_matmul_precision("highest"):
        for i in range(n):
            pi = model.parent[i]
            r_p = eye if pi < 0 else rots[pi]
            p_p = zero if pi < 0 else poss[pi]
            axis = model.joint_axis[i]
            if model.joint_types[i] == "slide":
                p = p_p + r_p @ (model.body_pos[i] + axis * q[i])
                r = r_p
            else:
                p = p_p + r_p @ model.body_pos[i]
                r = r_p @ _rodrigues(axis, q[i])
            rots.append(r)
            poss.append(p)
    return jnp.stack(rots), jnp.stack(poss)


def site_position(model: ChainModel, q: jax.Array) -> jax.Array:
    """World position of the end-effector site (reference 'finger' site)."""
    rots, poss = forward_kinematics(model, q)
    return poss[model.site_body] + rots[model.site_body] @ model.site_pos


def mass_matrix(model: ChainModel, q: jax.Array) -> jax.Array:
    """Joint-space inertia M(q) [n, n] via Jacobian composition.

    For each body i with world COM c_i: the velocity Jacobian column for
    joint k <= i is a_k x (c_i - p_k), the angular column is a_k, where a_k
    is joint k's world axis at world point p_k. Triangularity is expressed
    with a static mask (compiler-friendly — no ragged loops).
    """
    n = model.n_joints
    prec = jax.lax.Precision.HIGHEST
    rots, poss = forward_kinematics(model, q)
    axes_w = jnp.einsum("nij,nj->ni", rots, model.joint_axis,
                        precision=prec)                          # [n,3]
    coms_w = poss + jnp.einsum("nij,nj->ni", rots, model.com,
                               precision=prec)                   # [n,3]

    # mask[i, k] = 1 iff joint k is on body i's path to the root — a
    # static constant of the topology (tree-aware lower-triangularity).
    mask = jnp.asarray(model.ancestor_mask(), q.dtype)
    slide = np.array([1.0 if t == "slide" else 0.0
                      for t in model.joint_types],
                     np.float32)[None, :, None]                 # [1,n,1]
    # hinge: Jv[i,k] = a_k x (c_i - p_k), Jw[i,k] = a_k
    # slide: Jv[i,k] = a_k,               Jw[i,k] = 0
    arm = coms_w[:, None, :] - poss[None, :, :]                 # [n,n,3]
    axes_b = jnp.broadcast_to(axes_w[None, :, :], (n, n, 3))
    jv = ((1.0 - slide) * jnp.cross(axes_b, arm) + slide * axes_b) \
        * mask[..., None]
    jw = (1.0 - slide) * axes_b * mask[..., None]

    iw = jnp.einsum("nab,nbc,ndc->nad", rots, model.inertia, rots,
                    precision=prec)                              # [n,3,3]
    m_lin = jnp.einsum("n,nka,nla->kl", model.mass, jv, jv,
                       precision=prec)
    m_ang = jnp.einsum("nka,nab,nlb->kl", jw, iw, jw, precision=prec)
    return m_lin + m_ang


def kinetic_energy(model: ChainModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    return 0.5 * qd @ mass_matrix(model, q) @ qd


def potential_energy(model: ChainModel, q: jax.Array) -> jax.Array:
    """V(q) = -Σ m_i g·c_i(q) (zero when model.gravity is zero, as in the
    reference arm model: sawyer.xml <option gravity="0 0 0">)."""
    rots, poss = forward_kinematics(model, q)
    coms_w = poss + jnp.einsum("nij,nj->ni", rots, model.com,
                               precision=jax.lax.Precision.HIGHEST)
    return -jnp.sum(model.mass * (coms_w @ model.gravity))


def bias_forces(model: ChainModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    """Coriolis/centrifugal + gravity generalized forces.

    Lagrangian identity: bias = Ṁ q̇ − ∂KE/∂q + ∂V/∂q, with Ṁ q̇ obtained
    as a jvp of q ↦ M(q) q̇ along q̇ — exact, and always consistent with
    the mass matrix (no separately hand-derived RNEA to drift).
    """
    mdot_qd = jax.jvp(lambda qq: mass_matrix(model, qq) @ qd, (q,), (qd,))[1]
    dl_dq = jax.grad(lambda qq: kinetic_energy(model, qq, qd)
                     - potential_energy(model, qq))(q)
    return mdot_qd - dl_dq


def point_force_to_generalized(model: ChainModel, q: jax.Array,
                               body: int, point_local: jax.Array,
                               force_world: jax.Array) -> jax.Array:
    """Generalized force J_pᵀ f for a world-frame force applied at a
    body-local point — via vjp of the point's world position (the AD
    equivalent of building the point Jacobian). Used by contact and
    drag models."""
    def world_point(qq):
        rots, poss = forward_kinematics(model, qq)
        return poss[body] + rots[body] @ point_local

    _, vjp = jax.vjp(world_point, q)
    return vjp(force_world)[0]


def step(model: ChainModel, q: jax.Array, qd: jax.Array, ctrl: jax.Array,
         n_substeps: int = 1, ext_force_fn=None) -> Tuple[jax.Array, jax.Array]:
    """Advance (q, q̇) by n_substeps of dt under motor controls.

    Mirrors MuJoCo Euler + frame_skip: τ = gear·ctrl; implicit damping
    folded into the LHS; armature on the M diagonal. ext_force_fn(model,
    q, qd) -> generalized force adds environment forces (fluid drag,
    ground contact) per substep.
    """
    tau = model.gear * ctrl

    def sub(carry, _):
        q, qd = carry
        m = mass_matrix(model, q)
        m = m + jnp.diag(model.armature + model.dt * model.damping)
        rhs = (tau - bias_forces(model, q, qd) - model.damping * qd
               - model.stiffness * q)
        if ext_force_fn is not None:
            rhs = rhs + ext_force_fn(model, q, qd)
        qacc = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(m), True), rhs)
        qd = qd + model.dt * qacc
        q = q + model.dt * qd
        # Joint-limit projection: clamp position, kill outward velocity.
        clamped = jnp.clip(q, model.qpos_low, model.qpos_high)
        qd = jnp.where(clamped == q, qd, 0.0)
        return (clamped, qd), None

    (q, qd), _ = jax.lax.scan(sub, (q, qd), None, length=n_substeps)
    return q, qd


# ---------------------------------------------------------------------------
# Model construction from geom primitives (MuJoCo inertiafromgeom semantics,
# density 1000 kg/m^3).
# ---------------------------------------------------------------------------

_DENSITY = 1000.0


def sphere_geom(radius: float, pos=(0.0, 0.0, 0.0)):
    m = _DENSITY * 4.0 / 3.0 * np.pi * radius ** 3
    i = 0.4 * m * radius ** 2
    return dict(mass=m, com=np.asarray(pos, np.float64),
                inertia=np.diag([i, i, i]))


def capsule_geom(radius: float, fromto):
    """Capsule between two points: cylinder + two hemispherical caps.

    Exact rigid-body values (the hemisphere perpendicular term reduces to
    0.4 r^2 + h^2 + 0.75 r h about the capsule center).
    """
    a = np.asarray(fromto[:3], np.float64)
    b = np.asarray(fromto[3:], np.float64)
    center = 0.5 * (a + b)
    d = b - a
    length = np.linalg.norm(d)
    h = length / 2.0
    axis = d / length if length > 0 else np.array([0.0, 0.0, 1.0])

    m_cyl = _DENSITY * np.pi * radius ** 2 * length
    m_sph = _DENSITY * 4.0 / 3.0 * np.pi * radius ** 3
    m = m_cyl + m_sph
    i_ax = m_cyl * radius ** 2 / 2.0 + m_sph * 0.4 * radius ** 2
    i_perp = (m_cyl * (radius ** 2 / 4.0 + length ** 2 / 12.0)
              + m_sph * (0.4 * radius ** 2 + h ** 2 + 0.75 * radius * h))

    # Rotate the axis-aligned inertia into the body frame.
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(z, axis)
    c = float(z @ axis)
    if np.linalg.norm(v) < 1e-12:
        r = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        r = np.eye(3) + k + k @ k / (1.0 + c)
    i_local = np.diag([i_perp, i_perp, i_ax])
    return dict(mass=m, com=center, inertia=r @ i_local @ r.T)


def combine_geoms(geoms: Sequence[dict]):
    """Merge geoms into one (mass, com, inertia-about-com) body."""
    mass = sum(g["mass"] for g in geoms)
    com = sum(g["mass"] * g["com"] for g in geoms) / mass
    inertia = np.zeros((3, 3))
    for g in geoms:
        d = g["com"] - com
        shift = g["mass"] * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        inertia = inertia + g["inertia"] + shift
    return mass, com, inertia


def build_chain(bodies: Sequence[dict], dt: float, site_body: int,
                site_pos, gravity=(0.0, 0.0, 0.0)) -> ChainModel:
    """Assemble a ChainModel from per-body dicts:
    {pos, axis, geoms, damping, armature, gear, range, type, parent}.
    type: 'hinge' (default) or 'slide'; parent: body index (default i-1,
    -1 = world). Bodies with geoms=[] are massless virtual links
    (free-base decomposition)."""
    n = len(bodies)
    mass = np.zeros(n)
    com = np.zeros((n, 3))
    inertia = np.zeros((n, 3, 3))
    for i, b in enumerate(bodies):
        if b.get("geoms"):
            mass[i], com[i], inertia[i] = combine_geoms(b["geoms"])
        else:
            # Massless virtual body: tiny regularizing mass keeps the
            # joint-space inertia positive definite (armature usually
            # covers the diagonal anyway).
            mass[i] = 1e-6
            inertia[i] = 1e-9 * np.eye(3)
    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return ChainModel(
        joint_axis=f32([b["axis"] for b in bodies]),
        body_pos=f32([b["pos"] for b in bodies]),
        mass=f32(mass), com=f32(com), inertia=f32(inertia),
        armature=f32([b.get("armature", 0.0) for b in bodies]),
        damping=f32([b.get("damping", 0.0) for b in bodies]),
        stiffness=f32([b.get("stiffness", 0.0) for b in bodies]),
        gear=f32([b.get("gear", 1.0) for b in bodies]),
        qpos_low=f32([b["range"][0] for b in bodies]),
        qpos_high=f32([b["range"][1] for b in bodies]),
        gravity=f32(gravity),
        site_pos=f32(site_pos),
        parent=tuple(int(b.get("parent", i - 1))
                     for i, b in enumerate(bodies)),
        joint_types=tuple(b.get("type", "hinge") for b in bodies),
        dt=float(dt), site_body=int(site_body))

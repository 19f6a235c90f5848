"""Rigid-body engine correctness against independent oracles:

1. mass matrix from Jacobian composition vs the Hessian of an AD-derived
   kinetic energy computed from jvp'd forward kinematics (two distinct
   derivations of M);
2. a hand-derived planar double-pendulum mass matrix;
3. kinetic-energy conservation under zero torque/damping (no gravity);
4. single-link analytic acceleration tau / (I + armature).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu.engine import chain as rb


def _simple_chain(n=3, damping=0.0, armature=0.0):
    axes = [(0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 1, 0)][:n]
    bodies = [
        dict(pos=(0.3 if i else 0.0, 0.0, 0.0), axis=axes[i],
             damping=damping, armature=armature, gear=1.0,
             range=(-10.0, 10.0),
             geoms=[rb.capsule_geom(0.04, (0, 0, 0, 0.3, 0, 0))])
        for i in range(n)
    ]
    return rb.build_chain(bodies, dt=0.01, site_body=n - 1,
                          site_pos=(0.3, 0.0, 0.0))


def _ke_from_fk(model, q, qd):
    """Independent kinetic energy: body COM/rotation velocities via jvp of
    forward kinematics (no hand-written Jacobians)."""
    def com_and_rot(qq):
        rots, poss = rb.forward_kinematics(model, qq)
        coms = poss + jnp.einsum("nij,nj->ni", rots, model.com)
        return coms, rots

    (coms, rots), (dcoms, drots) = jax.jvp(com_and_rot, (q,), (qd,))
    ke_lin = 0.5 * jnp.sum(model.mass[:, None] * dcoms ** 2)
    # omega^ = Rdot R^T; omega_i = (W[2,1], W[0,2], W[1,0])
    w_mat = jnp.einsum("nij,nkj->nik", drots, rots)
    omega = jnp.stack([w_mat[:, 2, 1], w_mat[:, 0, 2], w_mat[:, 1, 0]], -1)
    iw = jnp.einsum("nab,nbc,ndc->nad", rots, model.inertia, rots)
    ke_ang = 0.5 * jnp.einsum("na,nab,nb->", omega, iw, omega)
    return ke_lin + ke_ang


def test_mass_matrix_vs_fk_hessian():
    model = _simple_chain(3)
    q = jnp.array([0.3, -0.7, 1.1])
    m = rb.mass_matrix(model, q)
    m_ad = jax.hessian(lambda qd: _ke_from_fk(model, q, qd))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ad),
                               rtol=1e-4, atol=1e-6)
    # symmetric positive definite
    np.testing.assert_allclose(np.asarray(m), np.asarray(m).T,
                               rtol=1e-5, atol=1e-7)
    assert np.all(np.linalg.eigvalsh(np.asarray(m)) > 0)


def test_double_pendulum_mass_matrix_analytic():
    """Planar 2R arm with point-mass-like links: compare against the
    textbook M(q) for two rods of length l, mass m (inertia about COM
    included)."""
    l, r = 0.5, 0.002  # thin rods: capsule ~ rod
    bodies = [
        dict(pos=(0, 0, 0), axis=(0, 0, 1), damping=0.0, armature=0.0,
             gear=1.0, range=(-10, 10),
             geoms=[rb.capsule_geom(r, (0, 0, 0, l, 0, 0))]),
        dict(pos=(l, 0, 0), axis=(0, 0, 1), damping=0.0, armature=0.0,
             gear=1.0, range=(-10, 10),
             geoms=[rb.capsule_geom(r, (0, 0, 0, l, 0, 0))]),
    ]
    model = rb.build_chain(bodies, dt=0.01, site_body=1, site_pos=(l, 0, 0))
    m1, m2 = float(model.mass[0]), float(model.mass[1])
    # capsule inertia about COM, perpendicular axis
    i1 = float(model.inertia[0][2, 2])
    i2 = float(model.inertia[1][2, 2])
    lc = l / 2.0

    q2 = 0.8
    q = jnp.array([0.4, q2])
    m = np.asarray(rb.mass_matrix(model, q))

    c2 = np.cos(q2)
    m11 = i1 + i2 + m1 * lc**2 + m2 * (l**2 + lc**2 + 2 * l * lc * c2)
    m12 = i2 + m2 * (lc**2 + l * lc * c2)
    m22 = i2 + m2 * lc**2
    np.testing.assert_allclose(m[0, 0], m11, rtol=1e-3)
    np.testing.assert_allclose(m[0, 1], m12, rtol=1e-3)
    np.testing.assert_allclose(m[1, 1], m22, rtol=1e-3)


def test_energy_conservation_zero_torque():
    model = _simple_chain(3, damping=0.0, armature=0.0)
    q = jnp.array([0.2, 0.5, -0.3])
    qd = jnp.array([1.0, -0.5, 0.8])
    e0 = float(rb.kinetic_energy(model, q, qd))

    step = jax.jit(lambda q, qd: rb.step(model, q, qd, jnp.zeros(3)))
    for _ in range(200):
        q, qd = step(q, qd)
    e1 = float(rb.kinetic_energy(model, q, qd))
    # semi-implicit Euler at dt=0.01: energy drift stays small
    assert abs(e1 - e0) / e0 < 0.05, (e0, e1)


def test_energy_conservation_tightens_with_dt():
    """The 5% bound above is an integrator-accuracy artifact, not an
    engine error: at dt=5e-4 the same 2-second trajectory conserves
    kinetic energy to 0.1% (first-order convergence of semi-implicit
    Euler's energy drift)."""
    model = _simple_chain(3, damping=0.0, armature=0.0)
    model = model._replace(dt=5e-4)
    q = jnp.array([0.2, 0.5, -0.3])
    qd = jnp.array([1.0, -0.5, 0.8])
    e0 = float(rb.kinetic_energy(model, q, qd))
    step = jax.jit(lambda q, qd: rb.step(model, q, qd, jnp.zeros(3),
                                         n_substeps=400))
    for _ in range(10):  # 2.0 s total
        q, qd = step(q, qd)
    e1 = float(rb.kinetic_energy(model, q, qd))
    assert abs(e1 - e0) / e0 < 1e-3, (e0, e1)


def test_single_link_analytic_acceleration():
    bodies = [dict(pos=(0, 0, 0), axis=(0, 0, 1), damping=0.0,
                   armature=0.123, gear=2.0, range=(-10, 10),
                   geoms=[rb.capsule_geom(0.05, (0, 0, 0, 0.4, 0, 0))])]
    model = rb.build_chain(bodies, dt=0.001, site_body=0, site_pos=(0.4, 0, 0))
    # inertia about the z joint axis through the frame origin
    m0 = float(model.mass[0])
    izz_com = float(model.inertia[0][2, 2])
    d = float(model.com[0][0])
    i_joint = izz_com + m0 * d * d + 0.123

    q, qd = jnp.zeros(1), jnp.zeros(1)
    ctrl = jnp.array([0.7])
    q1, qd1 = rb.step(model, q, qd, ctrl)
    qacc = float(qd1[0]) / model.dt
    np.testing.assert_allclose(qacc, 2.0 * 0.7 / i_joint, rtol=1e-4)


def test_bias_forces_vanish_at_zero_velocity():
    model = _simple_chain(3)
    b = rb.bias_forces(model, jnp.array([0.1, 0.2, 0.3]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-6)


def test_joint_limit_projection():
    model = _simple_chain(1)._replace(qpos_low=jnp.array([-0.1]),
                                      qpos_high=jnp.array([0.1]))
    q, qd = jnp.zeros(1), jnp.zeros(1)
    for _ in range(200):
        q, qd = rb.step(model, q, qd, jnp.array([1.0]))
    assert float(q[0]) <= 0.1 + 1e-6
    assert abs(float(qd[0])) < 1e-6

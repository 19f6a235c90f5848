"""Ball/free-joint engine validation against analytic rigid-body physics.

The quaternion joints are the round-2 engine extension that backs the
hand-manipulation suite's free-floating objects (mj_envs Adroit pen /
relocate; /root/reference/examples/configs/hand/pen-v0.yml). Checks:

1. the tangent-space Lagrangian bias reproduces Euler's equations
   (omega x I omega) exactly for a single free body and a ball joint;
2. world-frame angular momentum and kinetic energy are conserved for a
   torque-free tumbling asymmetric body;
3. free fall matches g*t under semi-implicit Euler;
4. the mass matrix agrees with an independent jvp-of-kinematics
   derivation on a mixed hinge/ball/free tree;
5. point_force_to_generalized matches the analytic free-body wrench map;
6. quaternions stay unit-norm through long rollouts.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mjmpc_tpu.engine import chain as rb


def _free_body(half_extents=(0.05, 0.08, 0.12), gravity=(0.0, 0.0, 0.0),
               dt=1e-3):
    bodies = [dict(pos=(0, 0, 0), type="free", damping=0.0, armature=0.0,
                   gear=1.0, geoms=[rb.box_geom(half_extents)])]
    return rb.build_chain(bodies, dt=dt, site_body=0, site_pos=(0, 0, 0),
                          gravity=gravity)


def _rand_quat(seed):
    q = jax.random.normal(jax.random.PRNGKey(seed), (4,))
    return q / jnp.linalg.norm(q)


def test_free_body_mass_matrix_block_diagonal():
    """COM at the frame origin: M = diag(m, m, m) ++ I_body, independent
    of orientation (linear DOFs are parent-frame, angular are body-frame)."""
    model = _free_body()
    q = jnp.concatenate([jnp.array([0.3, -0.2, 0.5]), _rand_quat(0)])
    m = np.asarray(rb.mass_matrix(model, q))
    mass = float(model.mass[0])
    np.testing.assert_allclose(m[:3, :3], mass * np.eye(3),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m[3:, 3:], np.asarray(model.inertia[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(m[:3, 3:], 0.0, atol=1e-6)


def test_free_body_bias_is_eulers_gyroscopic_term():
    """Torque-free free body: bias rotational block = omega x I omega,
    linear block = 0 — Euler's equations from pure AD."""
    model = _free_body()
    q = jnp.concatenate([jnp.zeros(3), _rand_quat(1)])
    omega = jnp.array([2.0, -3.0, 1.5])
    qd = jnp.concatenate([jnp.array([0.4, 0.1, -0.2]), omega])
    bias = np.asarray(rb.bias_forces(model, q, qd))
    inertia = np.asarray(model.inertia[0])
    expected = np.cross(np.asarray(omega), inertia @ np.asarray(omega))
    np.testing.assert_allclose(bias[:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(bias[3:], expected, rtol=1e-4, atol=1e-6)


def test_ball_joint_bias_is_eulers_gyroscopic_term():
    bodies = [dict(pos=(0, 0, 0), type="ball", damping=0.0, armature=0.0,
                   gear=1.0, geoms=[rb.box_geom((0.05, 0.08, 0.12))])]
    model = rb.build_chain(bodies, dt=1e-3, site_body=0, site_pos=(0, 0, 0))
    q = _rand_quat(2)
    omega = jnp.array([-1.0, 2.5, 0.7])
    bias = np.asarray(rb.bias_forces(model, q, omega))
    inertia = np.asarray(model.inertia[0])
    expected = np.cross(np.asarray(omega), inertia @ np.asarray(omega))
    np.testing.assert_allclose(bias, expected, rtol=1e-4, atol=1e-6)


def test_torque_free_tumble_conserves_momentum_and_energy():
    """Asymmetric body spun near its unstable middle axis (Dzhanibekov
    regime): world angular momentum L = R I omega and kinetic energy must
    be conserved through the flip."""
    model = _free_body(half_extents=(0.03, 0.09, 0.15))
    q = jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0])])
    qd = jnp.concatenate([jnp.zeros(3), jnp.array([0.02, 6.0, 0.03])])

    def world_momentum(q, qd):
        r = rb._quat_to_mat(q[3:7])
        return r @ (model.inertia[0] @ qd[3:6])

    l0 = np.asarray(world_momentum(q, qd))
    e0 = float(rb.kinetic_energy(model, q, qd))

    step = jax.jit(lambda q, qd: rb.step(model, q, qd, jnp.zeros(6),
                                         n_substeps=100))
    for _ in range(10):  # 1.0 s total at dt=1e-3
        q, qd = step(q, qd)
    l1 = np.asarray(world_momentum(q, qd))
    e1 = float(rb.kinetic_energy(model, q, qd))
    # atol covers integrator error on the tiny off-axis components through
    # the (chaotic) middle-axis flip; the dominant component holds to ~4e-5
    # relative at dt=1e-3.
    np.testing.assert_allclose(l1, l0, rtol=2e-3, atol=2e-4)
    assert abs(e1 - e0) / e0 < 2e-3, (e0, e1)
    np.testing.assert_allclose(float(jnp.linalg.norm(q[3:7])), 1.0,
                               rtol=1e-5)


def test_free_fall_matches_gravity():
    g = -9.81
    model = _free_body(gravity=(0.0, 0.0, g), dt=1e-3)
    q = jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0])])
    qd = jnp.zeros(6)
    q, qd = rb.step(model, q, qd, jnp.zeros(6), n_substeps=100)
    np.testing.assert_allclose(float(qd[2]), g * 0.1, rtol=1e-4)
    # semi-implicit Euler position: sum_{k=1..n} dt * (g k dt)
    expected_z = g * 1e-6 * (100 * 101) / 2.0
    np.testing.assert_allclose(float(q[2]), expected_z, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(qd[3:]), 0.0, atol=1e-6)


def _mixed_tree():
    """hinge -> ball -> free chain (a toy 'finger pushing a free object'
    topology)."""
    bodies = [
        dict(pos=(0, 0, 0), axis=(0, 0, 1), range=(-3, 3), damping=0.0,
             armature=0.0, gear=1.0,
             geoms=[rb.capsule_geom(0.03, (0, 0, 0, 0.25, 0, 0))]),
        dict(pos=(0.25, 0, 0), type="ball", damping=0.0, armature=0.0,
             gear=1.0, geoms=[rb.capsule_geom(0.025, (0, 0, 0, 0.2, 0, 0))]),
        dict(pos=(0.1, 0.1, 0), type="free", parent=-1, damping=0.0,
             armature=0.0, gear=1.0, geoms=[rb.box_geom((0.04, 0.05, 0.06))]),
    ]
    return rb.build_chain(bodies, dt=1e-3, site_body=1,
                          site_pos=(0.2, 0, 0))


def test_mixed_tree_mass_matrix_vs_tangent_fk_jvp():
    """Independent M: KE from jvp of the tangent-space kinematics along
    qd, Hessian in qd — must equal the Jacobian-composition M."""
    model = _mixed_tree()
    q = jnp.concatenate([jnp.array([0.4]), _rand_quat(3),
                         jnp.array([0.1, -0.2, 0.3]), _rand_quat(4)])

    def ke(qd):
        def com_and_rot(delta):
            rots, poss, _, _ = rb._fk_dofs(model, q, delta)
            coms = poss + jnp.einsum("nij,nj->ni", rots, model.com)
            return coms, rots

        zero = jnp.zeros(model.nv)
        (coms, rots), (dcoms, drots) = jax.jvp(com_and_rot, (zero,), (qd,))
        ke_lin = 0.5 * jnp.sum(model.mass[:, None] * dcoms ** 2)
        w_mat = jnp.einsum("nij,nkj->nik", drots, rots)
        omega = jnp.stack([w_mat[:, 2, 1], w_mat[:, 0, 2], w_mat[:, 1, 0]],
                          -1)
        iw = jnp.einsum("nab,nbc,ndc->nad", rots, model.inertia, rots)
        return ke_lin + 0.5 * jnp.einsum("na,nab,nb->", omega, iw, omega)

    m = np.asarray(rb.mass_matrix(model, q))
    m_ad = np.asarray(jax.hessian(ke)(jnp.zeros(model.nv)))
    np.testing.assert_allclose(m, m_ad, rtol=1e-4, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(m) > 0)


def test_mixed_tree_energy_conservation():
    model = _mixed_tree()
    q = jnp.concatenate([jnp.array([0.3]), _rand_quat(5),
                         jnp.array([0.0, 0.1, 0.2]), _rand_quat(6)])
    qd = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (model.nv,))
    e0 = float(rb.kinetic_energy(model, q, qd))
    step = jax.jit(lambda q, qd: rb.step(model, q, qd, jnp.zeros(model.nv),
                                         n_substeps=100))
    for _ in range(5):
        q, qd = step(q, qd)
    e1 = float(rb.kinetic_energy(model, q, qd))
    assert abs(e1 - e0) / e0 < 5e-3, (e0, e1)


def test_point_force_on_free_body_analytic_wrench():
    """World force f at body point p: linear block = f, angular block =
    R^T ((R p) x f) (body-frame DOFs)."""
    model = _free_body()
    quat = _rand_quat(8)
    q = jnp.concatenate([jnp.array([0.2, -0.1, 0.4]), quat])
    p_local = jnp.array([0.05, -0.02, 0.07])
    f_world = jnp.array([1.0, 2.0, -0.5])
    tau = np.asarray(rb.point_force_to_generalized(model, q, 0, p_local,
                                                   f_world))
    r = np.asarray(rb._quat_to_mat(quat))
    expected_ang = r.T @ np.cross(r @ np.asarray(p_local),
                                  np.asarray(f_world))
    np.testing.assert_allclose(tau[:3], np.asarray(f_world), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(tau[3:], expected_ang, rtol=1e-4, atol=1e-6)


def test_quaternion_norm_preserved_long_rollout():
    model = _free_body(gravity=(0, 0, -9.81))
    q = jnp.concatenate([jnp.zeros(3), _rand_quat(9)])
    qd = jnp.concatenate([jnp.array([0.1, 0.0, 0.5]),
                          jnp.array([3.0, -2.0, 4.0])])
    q, qd = rb.step(model, q, qd, jnp.zeros(6), n_substeps=2000)
    np.testing.assert_allclose(float(jnp.linalg.norm(q[3:7])), 1.0,
                               rtol=1e-5)
    assert bool(jnp.all(jnp.isfinite(q))) and bool(jnp.all(jnp.isfinite(qd)))

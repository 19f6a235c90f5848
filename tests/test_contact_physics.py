"""Contact-model physics invariants (VERDICT r2 weak #6).

The penalty-contact family (`envs/contact.py`) is what makes the hand /
locomotion tasks trustworthy; these tests pin its physical contracts
directly rather than via "reward goes up" driver runs:

  * Coulomb cone: |f_t| <= mu * f_n for every primitive, everywhere.
  * Non-negative normal force (no sticking pull), zero at no overlap.
  * Continuity: with zero normal approach speed, force -> 0 as
    overlap -> 0+ (the kd*vn impact jump is the standard spring-damper
    artifact and is gated to overlap > 0).
  * Equal-and-opposite assembly: +f/-f applied through
    `engine.chain.points_frame` produce zero NET generalized force on
    the translational DOF of a free pair, and conserve total linear
    momentum through a full nonlinear bounce (impulse consistency).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu.engine import chain as rb
from mjmpc_tpu.envs import contact

KP, KD, MU = 400.0, 2.0, 0.8


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape)


# ---------------------------------------------------------------------------
# Coulomb cone + normal-force sign, across all primitives
# ---------------------------------------------------------------------------

def _cone_check(f, n, mu, tol=1e-5):
    fn = f @ n
    ft = f - fn * n
    assert fn >= -tol, f"adhesive normal force {fn}"
    assert jnp.linalg.norm(ft) <= mu * fn + tol, \
        f"|f_t|={jnp.linalg.norm(ft)} > mu*f_n={mu * fn}"


def test_force_along_friction_cone():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    for k in keys:
        k1, k2, k3 = jax.random.split(k, 3)
        n = _rand(k1, (3,))
        n = n / jnp.linalg.norm(n)
        overlap = float(jax.random.uniform(k2, (), minval=-0.01,
                                           maxval=0.02))
        rel_vel = _rand(k3, (3,), 2.0)
        f = contact.force_along(n, overlap, rel_vel, KP, KD, MU)
        _cone_check(f, n, MU)
        if overlap <= 0.0:
            assert float(jnp.abs(f).max()) == 0.0


def test_sphere_segment_friction_cone():
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    a, b = jnp.array([-0.1, 0.0, 0.0]), jnp.array([0.1, 0.0, 0.0])
    for k in keys:
        k1, k2 = jax.random.split(k)
        p = _rand(k1, (3,), 0.03)
        v = _rand(k2, (3,), 1.0)
        f, t = contact.sphere_segment_force(
            p, v, 0.02, a, b, jnp.zeros(3), jnp.zeros(3), 0.015,
            KP, KD, MU)
        c, _ = contact.closest_on_segment(p, a, b)
        n = (p - c) / (jnp.linalg.norm(p - c) + 1e-9)
        _cone_check(f, n, MU)
        assert 0.0 <= float(t) <= 1.0


def test_capsule_capsule_friction_cone():
    keys = jax.random.split(jax.random.PRNGKey(2), 32)
    b0, b1 = jnp.array([-0.1, 0.01, 0.0]), jnp.array([0.1, 0.01, 0.0])
    for k in keys:
        k1, k2 = jax.random.split(k)
        mid = _rand(k1, (3,), 0.02)
        a0, a1 = mid + jnp.array([0.0, 0.0, -0.05]), \
            mid + jnp.array([0.0, 0.0, 0.05])
        v = _rand(k2, (3,), 1.0)
        f, s = contact.capsule_capsule_force(
            a0, a1, v, v, 0.012, b0, b1, 0.012, KP, KD, MU)
        p_a, p_b, _, _ = contact.segment_segment_closest(a0, a1, b0, b1)
        n = (p_a - p_b) / (jnp.linalg.norm(p_a - p_b) + 1e-9)
        _cone_check(f, n, MU)
        assert 0.0 <= float(s) <= 1.0


def test_sphere_plane_friction_cone_and_fixed_normal():
    """Plane normal stays +z even when the center dips below the plane
    (a center-derived normal would flip and expel the sphere downward)."""
    z_up = jnp.array([0.0, 0.0, 1.0])
    for pz in (0.015, 0.005, -0.005):
        p = jnp.array([0.0, 0.0, pz])
        v = jnp.array([0.3, -0.2, -0.1])
        f = contact.sphere_plane_force(p, v, 0.02, KP, KD, MU)
        _cone_check(f, z_up, MU)
        assert float(f[2]) >= 0.0   # always pushes up


# ---------------------------------------------------------------------------
# Continuity at overlap -> 0
# ---------------------------------------------------------------------------

def test_force_continuous_at_zero_overlap():
    """With zero normal approach speed, |f| -> 0 linearly as
    overlap -> 0+ and is exactly 0 for overlap <= 0 (no force jump at
    grazing contact; tangential sliding alone cannot create force out
    of nothing)."""
    n = jnp.array([0.0, 0.0, 1.0])
    v_tangent = jnp.array([0.5, -0.3, 0.0])   # no normal component
    prev = 0.0
    for overlap in (1e-3, 1e-4, 1e-5, 1e-6):
        f = contact.force_along(n, overlap, v_tangent, KP, KD, MU)
        mag = float(jnp.linalg.norm(f))
        assert mag <= KP * overlap * (1.0 + MU) + 1e-9
        prev = mag
    assert prev < 1e-3
    f0 = contact.force_along(n, 0.0, v_tangent, KP, KD, MU)
    f_neg = contact.force_along(n, -1e-6, v_tangent, KP, KD, MU)
    assert float(jnp.abs(f0).max()) == 0.0
    assert float(jnp.abs(f_neg).max()) == 0.0


# ---------------------------------------------------------------------------
# Equal-and-opposite assembly through points_frame + momentum budget
# ---------------------------------------------------------------------------

def _free_pair_model():
    bodies = [
        dict(pos=(0.0, 0.0, 0.0), type="free", parent=-1, axis=(0, 0, 1),
             geoms=[rb.sphere_geom(0.03)]),
        dict(pos=(0.0, 0.0, 0.0), type="free", parent=-1, axis=(0, 0, 1),
             geoms=[rb.sphere_geom(0.04)]),
    ]
    return rb.build_chain(bodies, dt=5e-4, site_body=0,
                          site_pos=(0.0, 0.0, 0.0))


def _pair_contact_force(model, q, qd):
    """Generalized force of the sphere-sphere contact applied
    equal-and-opposite through ONE points_frame pass."""
    coms = jnp.zeros((2, 3), q.dtype)
    pos, vel, apply = rb.points_frame(model, q, qd, (0, 1), coms)
    f = contact.sphere_sphere_force(pos[0], vel[0], 0.03,
                                    pos[1], vel[1], 0.04, KP, KD, MU)
    return apply(jnp.stack([f, -f]))


def test_points_frame_net_translational_force_is_zero():
    """tau from (+f at A, -f at B) must vanish against any uniform
    translation: the free-joint translational rows of J are identity, so
    tau[A_trans] + tau[B_trans] == 0 exactly (Newton's third law at the
    generalized-force level)."""
    model = _free_pair_model()
    key = jax.random.PRNGKey(3)
    for k in jax.random.split(key, 8):
        k1, k2 = jax.random.split(k)
        q = jnp.concatenate([
            _rand(k1, (3,), 0.03), jnp.array([1.0, 0.0, 0.0, 0.0]),
            _rand(k2, (3,), 0.03) + 0.05, jnp.array([1.0, 0.0, 0.0, 0.0])])
        qd = _rand(k, (12,), 0.5)
        tau = _pair_contact_force(model, q, qd)
        net = tau[0:3] + tau[6:9]
        np.testing.assert_allclose(np.asarray(net), 0.0, atol=1e-5)


def test_momentum_conserved_through_bounce():
    """Two free spheres collide head-on under the penalty contact (no
    gravity, no damping): total linear momentum m_A v_A + m_B v_B is
    conserved through the whole impulse (impulse consistency of the
    +f/-f assembly), and the spheres separate after the bounce."""
    model = _free_pair_model()
    m_a = float(model.mass[0])
    m_b = float(model.mass[1])

    q = jnp.concatenate([
        jnp.array([-0.05, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0, 0.0]),
        jnp.array([0.05, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0, 0.0])])
    qd = jnp.concatenate([
        jnp.array([1.0, 0.0, 0.0]), jnp.zeros(3),
        jnp.array([-0.6, 0.0, 0.0]), jnp.zeros(3)])

    def momentum(qd):
        return m_a * qd[0:3] + m_b * qd[6:9]

    p0 = momentum(qd)
    step = jax.jit(lambda q, qd: rb.step(
        model, q, qd, jnp.zeros(model.nv), n_substeps=20,
        ext_force_fn=_pair_contact_force))
    touched = False
    for _ in range(30):
        q, qd = step(q, qd)
        gap = float(jnp.linalg.norm(q[0:3] - q[7:10])) - 0.07
        touched = touched or gap < 0.0
        np.testing.assert_allclose(np.asarray(momentum(qd)),
                                   np.asarray(p0), atol=1e-3)
    assert touched, "spheres never made contact — vacuous run"
    # elastic-ish bounce: relative velocity reversed sign
    rel_vx = float(qd[0] - qd[6])
    assert rel_vx < 0.0, f"no separation after bounce: rel_vx={rel_vx}"


def test_momentum_conserved_with_rotation():
    """Off-center collision through a fixed surface stud on body A
    (force applied at a non-COM point, like the hand's tip spheres):
    linear momentum stays conserved while the J^T scatter converts the
    off-axis contact into spin on A."""
    model = _free_pair_model()
    m_a, m_b = float(model.mass[0]), float(model.mass[1])
    stud_local = jnp.array([[0.03, 0.0, 0.0], [0.0, 0.0, 0.0]])

    def force_fn(model, q, qd):
        pos, vel, apply = rb.points_frame(model, q, qd, (0, 1),
                                          stud_local)
        f = contact.sphere_sphere_force(pos[0], vel[0], 0.005,
                                        pos[1], vel[1], 0.04,
                                        KP, KD, MU)
        return apply(jnp.stack([f, -f]))

    q = jnp.concatenate([
        jnp.array([-0.08, 0.02, 0.0]), jnp.array([1.0, 0.0, 0.0, 0.0]),
        jnp.array([0.05, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0, 0.0])])
    qd = jnp.concatenate([
        jnp.array([1.2, 0.0, 0.0]), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3)])
    p0 = m_a * qd[0:3] + m_b * qd[6:9]

    step = jax.jit(lambda q, qd: rb.step(
        model, q, qd, jnp.zeros(model.nv), n_substeps=20,
        ext_force_fn=force_fn))
    spun = 0.0
    for _ in range(40):
        q, qd = step(q, qd)
        p = m_a * qd[0:3] + m_b * qd[6:9]
        np.testing.assert_allclose(np.asarray(p), np.asarray(p0),
                                   atol=2e-3)
        spun = max(spun, float(jnp.abs(qd[3:6]).max()))
    assert spun > 1e-3, "off-center hit produced no spin — vacuous"

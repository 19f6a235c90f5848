"""Swimmer / HalfCheetah / Acrobot env behavior + engine tree features
(branching, slide joints, gravity, springs, contacts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.engine import chain as rb


def test_registry_has_locomotion():
    avail = envs.available()
    for name in ("Swimmer-v0", "HalfCheetah-v0", "acrobot-v0"):
        assert name in avail, avail


def test_gravity_pendulum_period():
    """Single hinged rod under gravity: small-oscillation frequency must
    match sqrt(m g d / I) about the pivot."""
    bodies = [dict(pos=(0, 0, 0), axis=(0, 1, 0), range=(-10, 10),
                   geoms=[rb.capsule_geom(0.02, (0, 0, 0, 0, 0, -0.5))])]
    m = rb.build_chain(bodies, dt=0.001, site_body=0, site_pos=(0, 0, -0.5),
                       gravity=(0.0, 0.0, -9.81))
    mass = float(m.mass[0])
    d = abs(float(m.com[0][2]))
    i_pivot = float(m.inertia[0][1, 1]) + mass * d * d
    omega = np.sqrt(mass * 9.81 * d / i_pivot)

    q, qd = jnp.array([0.05]), jnp.zeros(1)
    step = jax.jit(lambda q, qd: rb.step(m, q, qd, jnp.zeros(1)))
    traj = []
    for _ in range(3000):
        q, qd = step(q, qd)
        traj.append(float(q[0]))
    traj = np.asarray(traj)
    # measure the period from zero crossings
    crossings = np.where(np.diff(np.sign(traj)) != 0)[0]
    period = 2 * np.mean(np.diff(crossings)) * 0.001
    np.testing.assert_allclose(2 * np.pi / period, omega, rtol=0.03)


def test_slide_joint_free_fall():
    """A slide-z joint under gravity is free fall: z(t) = -g t^2 / 2."""
    bodies = [dict(pos=(0, 0, 0), axis=(0, 0, 1), type="slide",
                   range=(-1e6, 1e6),
                   geoms=[rb.sphere_geom(0.1)])]
    m = rb.build_chain(bodies, dt=0.001, site_body=0, site_pos=(0, 0, 0),
                       gravity=(0.0, 0.0, -9.81))
    q, qd = jnp.zeros(1), jnp.zeros(1)
    step = jax.jit(lambda q, qd: rb.step(m, q, qd, jnp.zeros(1)))
    for _ in range(1000):
        q, qd = step(q, qd)
    # semi-implicit Euler: z_n = -g*dt^2*n(n+1)/2
    n = 1000
    expected = -9.81 * 0.001 ** 2 * n * (n + 1) / 2
    np.testing.assert_allclose(float(q[0]), expected, rtol=1e-3)


def test_joint_spring_restores():
    bodies = [dict(pos=(0, 0, 0), axis=(0, 1, 0), range=(-10, 10),
                   stiffness=50.0, damping=1.0,
                   geoms=[rb.capsule_geom(0.02, (0, 0, 0, 0.3, 0, 0))])]
    m = rb.build_chain(bodies, dt=0.002, site_body=0, site_pos=(0.3, 0, 0))
    q, qd = jnp.array([1.0]), jnp.zeros(1)
    step = jax.jit(lambda q, qd: rb.step(m, q, qd, jnp.zeros(1)))
    for _ in range(4000):
        q, qd = step(q, qd)
    assert abs(float(q[0])) < 0.05  # spring + damper returns to rest


def test_swimmer_obs_and_reward():
    env = envs.make("Swimmer-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    obs = env.observe(env.params, s)
    assert obs.shape == (12,)
    s2, obs2, r, d = jax.jit(env.step)(env.params, s, jnp.zeros(4))
    # zero action: reward is pure forward velocity (ctrl cost 0)
    expected = (float(s2.qpos[0]) - float(s.qpos[0])) / 0.02
    np.testing.assert_allclose(float(r), expected, rtol=1e-3, atol=1e-5)


def test_swimmer_gait_moves_forward():
    env = envs.make("Swimmer-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    x0 = float(s.qpos[0])
    for t in range(100):
        ph = 6.0 * t * 0.02
        a = jnp.array([np.sin(ph), np.cos(ph), np.sin(ph + 1.5),
                       np.cos(ph + 1.5)], jnp.float32)
        s, obs, r, d = step(env.params, s, a)
    assert float(s.qpos[0]) - x0 > 0.3
    assert np.isfinite(np.asarray(s.qpos)).all()


def test_cheetah_passive_settles_on_ground():
    env = envs.make("HalfCheetah-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(50):
        s, obs, r, d = step(env.params, s, jnp.zeros(6))
    assert obs.shape == (17,)
    # settled: not fallen through the floor, not launched, nearly static
    z = float(s.qpos[1])
    assert -0.6 < z < 0.3, z
    assert abs(float(s.qvel[1])) < 0.5
    assert np.isfinite(np.asarray(s.qvel)).all()


def test_cheetah_reward_is_forward_progress():
    env = envs.make("HalfCheetah-v0")
    s = env.init(env.params, jax.random.PRNGKey(1))
    a = 0.5 * jnp.ones(6)
    s2, obs, r, d = jax.jit(env.step)(env.params, s, a)
    expected = ((float(s2.qpos[0]) - float(s.qpos[0])) / 0.05
                - 0.1 * float(jnp.sum(a ** 2)))
    np.testing.assert_allclose(float(r), expected, rtol=1e-3, atol=1e-5)


def test_acrobot_energy_pumping_mpc():
    """Short MPPI run must raise the acrobot tip above hanging height."""
    env = envs.make("acrobot-v0")
    solver = solvers.MPPI(d_action=1, horizon=24, num_particles=256,
                          lam=0.05, init_cov=1.0, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 60))
    out = ep(env.params, jax.random.PRNGKey(2))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    assert r[-10:].mean() > r[:10].mean() + 0.3  # tip clearly rising

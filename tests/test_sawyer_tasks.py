"""Sawyer task family + pen: physics sanity (forest dynamics, interaction
forces) and MPC progress on each task."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers


def test_registered():
    avail = envs.available()
    for name in ("sawyer_reacher-v0", "sawyer_pusher-v0", "sawyer_door-v0",
                 "sawyer_peg_insertion-v0", "pen-v0"):
        assert name in avail


def test_pusher_contact_moves_block():
    env = envs.make("sawyer_pusher-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # block at rest without contact
    s1 = s
    for _ in range(5):
        s1, obs, r, d = step(env.params, s1, jnp.zeros(7))
    np.testing.assert_allclose(np.asarray(s1.qpos[7:]), 0.0, atol=1e-4)
    # drive the arm around; eventually contact pushes the block
    s2 = s
    moved = False
    for t in range(60):
        a = jnp.array([0.6, 0.8, 0.0, -0.6, 0.0, -0.3, 0.0])
        s2, obs, r, d = step(env.params, s2, a)
        if abs(float(s2.qpos[7])) + abs(float(s2.qpos[8])) > 1e-3:
            moved = True
            break
    assert np.isfinite(np.asarray(s2.qpos)).all()
    # (contact may or may not trigger with this scripted motion; physics
    # must at least stay finite. MPC test below checks task progress.)


def test_door_stays_closed_without_grab():
    env = envs.make("sawyer_door-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(10):
        s, obs, r, d = step(env.params, s, jnp.zeros(7))
    assert abs(float(s.qpos[-1])) < 1e-3
    assert float(s.qpos[-1]) >= 0.0  # hinge range [0, 1.57] enforced


def test_peg_metrics_and_success():
    env = envs.make("sawyer_peg_insertion-v0")
    from mjmpc_tpu.envs.sawyer_tasks import _peg_metrics, PegState
    s = env.init(env.params, jax.random.PRNGKey(0))
    tip, depth, lateral = _peg_metrics(env.params, s.qpos)
    assert np.isfinite(np.asarray(tip)).all()
    assert not bool(env.success(env.params, s))


def test_pen_mpc_aligns():
    env = envs.make("pen-v0")
    solver = solvers.MPPI(d_action=3, horizon=16, num_particles=256,
                          lam=0.05, init_cov=0.5, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 40))
    out = ep(env.params, jax.random.PRNGKey(1))
    r = np.asarray(out["reward"])
    # alignment (reward ~ cos angle) must approach 1
    assert r[-5:].mean() > 0.8, r[-5:].mean()


def test_pusher_mpc_progress():
    env = envs.make("sawyer_pusher-v0")
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=256,
                          lam=0.02, init_cov=0.4, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 30))
    out = ep(env.params, jax.random.PRNGKey(0))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    assert r[-5:].mean() > r[:5].mean()  # reach+push improving


def test_door_mpc_opens():
    env = envs.make("sawyer_door-v0")
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=256,
                          lam=0.02, init_cov=0.4, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 40))
    out = ep(env.params, jax.random.PRNGKey(0))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    assert r[-5:].mean() > r[:5].mean()


def test_relocate_ball_rests_then_lifts():
    env = envs.make("relocate-v0")
    from mjmpc_tpu.envs.relocate import _hand_and_ball
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(10):
        s, obs, r, d = step(env.params, s, jnp.zeros(7))
    _, ball = _hand_and_ball(env.params.model, s.qpos)
    assert abs(float(ball[2]) + 0.25) < 0.02  # resting on the table
    assert np.isfinite(np.asarray(s.qpos)).all()


def test_relocate_mpc_progress():
    env = envs.make("relocate-v0")
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=128,
                          lam=0.05, init_cov=0.4, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 40))
    out = ep(env.params, jax.random.PRNGKey(0))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    assert r[-5:].mean() > r[:5].mean()


def test_hammer_nail_ratchets():
    """The nail stays put passively and only moves when struck."""
    env = envs.make("hammer-v0")
    from mjmpc_tpu.envs.hammer import _nail_depth
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(10):
        s, obs, r, d = step(env.params, s, jnp.zeros(7))
    assert abs(float(_nail_depth(s))) < 1e-4
    assert np.isfinite(np.asarray(s.qpos)).all()


def test_hammer_mpc_progress():
    env = envs.make("hammer-v0")
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=128,
                          lam=0.05, init_cov=0.5, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 40))
    out = ep(env.params, jax.random.PRNGKey(0))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    assert r[-5:].mean() > r[:5].mean()

"""Maze env (the capability upstream registered but never shipped) + the
NaN-guard failure-recovery wrapper."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers


def test_maze_registered_and_samples_clear_points():
    env = envs.make("continual_maze-v0")
    assert "maze-v0" in envs.available()
    for i in range(10):
        s = env.init(env.params, jax.random.PRNGKey(i))
        for p in (np.asarray(s.pos), np.asarray(s.goal)):
            d = np.linalg.norm(p[None] - np.asarray(
                env.params.obstacles[:, :2]), axis=-1)
            assert (d > np.asarray(env.params.obstacles[:, 2])).all()


def test_maze_obstacle_penalty():
    env = envs.make("maze-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    from mjmpc_tpu.envs.maze import MazeState
    inside = s._replace(pos=jnp.array([0.0, 0.0]))   # center obstacle
    _, _, r_in, _ = env.step(env.params, inside, jnp.zeros(2))
    _, _, r_out, _ = env.step(env.params, s, jnp.zeros(2))
    assert float(r_in) < float(r_out) - 1.0


def test_maze_mpc_reaches_goal():
    env = envs.make("maze-v0")
    solver = solvers.MPPI(d_action=2, horizon=24, num_particles=256,
                          lam=0.05, init_cov=0.6, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 80))
    out = ep(env.params, jax.random.PRNGKey(4))
    assert np.asarray(out["success"]).sum() > 0  # reached the goal region


def test_continual_maze_goal_switches():
    env = envs.make("continual_maze-v0")
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    g0 = np.asarray(s.goal)
    for _ in range(50):
        s, *_ = step(env.params, s, jnp.zeros(2))
    assert not np.allclose(np.asarray(s.goal), g0)


def test_guard_finite_recovers_from_nan():
    env = envs.make("SimplePendulum-v0")
    solver = solvers.MPPI(d_action=1, horizon=8, num_particles=16,
                          lam=0.1, init_cov=1.0)
    solve = solvers.make_solve_fn(solver, env)
    guarded = jax.jit(solvers.guard_finite(solve, solver))

    est = env.init(env.params, jax.random.PRNGKey(1))
    good = solver.init_state(jax.random.PRNGKey(0))
    # poison the mean: the rollout/update propagate NaN
    bad = good._replace(mean=good.mean.at[0, 0].set(jnp.nan))

    a, v, s = guarded(env.params, est, bad)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(s.mean)).all()
    np.testing.assert_allclose(np.asarray(a), 0.0)   # safe action
    assert int(s.step) == 1                          # step still advanced

    # healthy states pass through untouched
    a2, v2, s2 = guarded(env.params, est, good)
    plain = jax.jit(solve)(env.params, est, good)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(plain[0]),
                               rtol=1e-6)


def test_trajopt_reacher_mpc_reaches():
    env = envs.make("trajopt_reacher-v0")
    solver = solvers.MPPI(d_action=2, horizon=32, num_particles=128,
                          lam=0.01, init_cov=3.0, step_size=0.55,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 100))
    out = ep(env.params, jax.random.PRNGKey(0))
    assert np.asarray(out["success"]).sum() > 10  # episode-level success

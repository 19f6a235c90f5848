"""Maze env (the capability upstream registered but never shipped) + the
NaN-guard failure-recovery wrapper."""
from typing import NamedTuple

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


class CountState(NamedTuple):
    x: jax.Array
    t: jax.Array


def _make_counting_env(nan_at=None):
    """1-D integrator whose reward turns NaN at step `nan_at` — a
    deterministic mid-episode divergence injected into the PLANNING model
    only (the real env stays clean), for the episode-level guard test."""
    from mjmpc_tpu.envs.base import Env

    def init(params, key):
        return CountState(x=jnp.float32(1.0), t=jnp.array(0, jnp.int32))

    def observe(params, s):
        return jnp.stack([s.x])

    def step(params, s, a):
        new = CountState(x=s.x + 0.1 * a[0], t=s.t + 1)
        r = -(new.x ** 2)
        if nan_at is not None:
            r = jnp.where(new.t == nan_at, jnp.nan, r)
        return new, observe(params, new), r, jnp.array(False)

    return Env(name="count-v0", d_obs=1, d_action=1,
               action_lows=np.array([-1.0], np.float32),
               action_highs=np.array([1.0], np.float32),
               params=(), init=init, step=step, observe=observe,
               max_episode_steps=100)


def test_run_episodes_guard_recovers_from_mid_episode_nan():
    """Production-path failure recovery: a NaN rollout mid-episode (steps
    whose planning horizon crosses the poisoned timestep) is discarded and
    the episode continues finite; without the guard the NaN persists in
    the solver mean and contaminates every subsequent action."""
    from mjmpc_tpu.harness.episode import run_episodes

    real = _make_counting_env(nan_at=None)
    sim = _make_counting_env(nan_at=3)
    solver = solvers.MPPI(d_action=1, horizon=4, num_particles=16,
                          lam=0.1, init_cov=0.5, step_size=0.7)

    out = run_episodes(solver, real, n_episodes=1, episode_length=10,
                       base_seed=7, sim_env=sim, guard=True)
    assert np.isfinite(out["actions"]).all()
    assert np.isfinite(out["rewards"]).all()
    # guard fired: the solves whose horizon crossed t==3 play zero
    assert np.any(out["actions"][0, :3] == 0.0)
    # and recovered: post-poison solves act again
    assert np.any(out["actions"][0, 4:] != 0.0)

    bad = run_episodes(solver, real, n_episodes=1, episode_length=10,
                       base_seed=7, sim_env=sim, guard=False)
    assert not np.isfinite(bad["actions"]).all()


def test_trajopt_reacher_mpc_reaches():
    env = envs.make("trajopt_reacher-v0")
    solver = solvers.MPPI(d_action=2, horizon=32, num_particles=128,
                          lam=0.01, init_cov=3.0, step_size=0.55,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 100))
    out = ep(env.params, jax.random.PRNGKey(0))
    assert np.asarray(out["success"]).sum() > 10  # episode-level success

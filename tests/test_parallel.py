"""Sharded-solve correctness: SPMD over the 8-device CPU mesh must produce
the same numbers as the single-device path (the reference's implicit
contract: SubprocVecEnv rollouts == serial rollouts given the same noise,
subproc_vec_env.py scatter/gather is value-preserving)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, parallel, solvers


@pytest.fixture(scope="module")
def env():
    return envs.make("SimplePendulum-v0")


def _mesh():
    return parallel.make_mesh(episodes=2, particles=4)


def test_mesh_axes():
    mesh = _mesh()
    assert mesh.shape["episodes"] == 2
    assert mesh.shape["particles"] == 4
    assert parallel.pad_particles(13, mesh) == 16


@pytest.mark.parametrize("name,extra", [
    ("mppi", dict(lam=0.1)),
    ("cem", dict(elite_frac=0.25, beta=0.1)),
    # full covariance: distributed top-k + outer-product estimate over the
    # sharded particle axis — the SURVEY §7 'hard part'
    ("cem", dict(elite_frac=0.25, beta=0.1, cov_type="full")),
    # TD(lambda) blended returns + time-based weights reduce [N, H] over
    # the sharded axis
    ("mppiq", dict(beta=0.1, td_lam=0.95, alpha=0, gamma=0.99)),
    ("dmd", dict(lam=0.2, update_cov=True, cov_type="full")),
    ("random_shooting", dict()),
])
def test_sharded_solve_matches_single_device(env, name, extra):
    solver = solvers.make_solver(
        name, d_action=env.d_action, horizon=8, num_particles=16,
        init_cov=1.0, **extra)
    key = jax.random.PRNGKey(0)
    s0 = solver.init_state(key)
    env_state = env.init(env.params, jax.random.PRNGKey(1))

    plain = jax.jit(solvers.make_solve_fn(solver, env))
    a_ref, _, s_ref = plain(env.params, env_state, s0)

    mesh = _mesh()
    sharded = parallel.build_sharded_solve_fn(solver, env, mesh)
    a_sh, _, s_sh = sharded(env.params, env_state, s0)

    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_ref.mean), np.asarray(s_sh.mean),
                               rtol=1e-5, atol=1e-6)
    # covariance adaptation (CEM elites / DMD weighted outer products) is
    # itself a particle-axis reduction — must match across the mesh too
    np.testing.assert_allclose(np.asarray(s_ref.cov), np.asarray(s_sh.cov),
                               rtol=1e-5, atol=1e-6)


def test_sharded_pfmpc_matches_single_device(env):
    solver = solvers.PFMPC(d_action=env.d_action, horizon=8,
                           num_particles=16, lam=0.1)
    key = jax.random.PRNGKey(0)
    s0 = solver.init_state(key)
    env_state = env.init(env.params, jax.random.PRNGKey(1))

    plain = jax.jit(solvers.make_solve_fn(solver, env))
    a_ref, _, s_ref = plain(env.params, env_state, s0)

    sharded = parallel.build_sharded_solve_fn(solver, env, _mesh())
    a_sh, _, s_sh = sharded(env.params, env_state, s0)

    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_ref.action_samples),
                               np.asarray(s_sh.action_samples),
                               rtol=1e-5, atol=1e-6)


def test_sharded_episode_runs(env):
    solver = solvers.MPPI(d_action=env.d_action, horizon=8,
                          num_particles=16, lam=0.1, init_cov=1.0)
    mesh = _mesh()
    episode = parallel.build_sharded_episode_fn(solver, env, 5, mesh)
    out = episode(env.params, jax.random.PRNGKey(0))
    assert out["reward"].shape == (5,)
    assert np.isfinite(np.asarray(out["reward"])).all()


def test_batch_episodes_sharded_over_episode_axis(env):
    solver = solvers.MPPI(d_action=env.d_action, horizon=8,
                          num_particles=8, lam=0.1, init_cov=1.0)
    mesh = _mesh()
    batch = parallel.build_batch_episode_fn(solver, env, 4, mesh)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    out = batch(env.params, keys)
    assert out["reward"].shape == (4, 4)
    # distinct seeds -> distinct trajectories
    r = np.asarray(out["reward"])
    assert not np.allclose(r[0], r[1])
    # batched result must agree with the per-key single run
    single = jax.jit(solvers.evaluate_episode(solver, env, 4))
    r0 = np.asarray(single(env.params, keys[0])["reward"])
    np.testing.assert_allclose(r[0], r0, rtol=1e-5, atol=1e-6)


def test_sharded_hand_env_matches_single_device():
    """Quaternion-state env (free-joint pen + contact hand): the nq != nv
    layout and the contact jvp/vjp must be GSPMD-invariant like the
    scalar-joint envs."""
    hand = envs.make("pen-v0")
    solver = solvers.MPPI(d_action=hand.d_action, horizon=2,
                          num_particles=16, init_cov=0.3, lam=0.15)
    s0 = solver.init_state(jax.random.PRNGKey(0))
    env_state = hand.init(hand.params, jax.random.PRNGKey(1))

    plain = jax.jit(solvers.make_solve_fn(solver, hand))
    a_ref, _, _ = plain(hand.params, env_state, s0)

    sharded = parallel.build_sharded_solve_fn(solver, hand, _mesh())
    a_sh, _, _ = sharded(hand.params, env_state, s0)
    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh),
                               rtol=1e-5, atol=1e-6)

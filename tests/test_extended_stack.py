"""Extended capability tests: get_optimal_value (free energy), MPPIQ with
a learned quadratic Q (the ICLR'21 blending pairing), RandomShootingNN
policy rollouts, and the VecNormalize/FrameStack wrapper equivalents."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.envs import frame_stack, normalize_obs
from mjmpc_tpu.envs.wrappers import rms_init, rms_update
from mjmpc_tpu.models import QuadraticQFunc


@pytest.fixture(scope="module")
def pendulum():
    return envs.make("SimplePendulum-v0")


def test_get_optimal_value_free_energy(pendulum):
    """Value at a bad state (hanging) must be worse (higher cost => more
    positive free energy) than at the goal state (upright)."""
    env = pendulum
    solver = solvers.MPPI(d_action=1, horizon=16, num_particles=128,
                          lam=0.05, init_cov=2.0, gamma=1.0)
    vfn = jax.jit(solvers.build_optimal_value_fn(solver, env))
    from mjmpc_tpu.envs.pendulum import PendulumState
    hanging = PendulumState(th=jnp.float32(np.pi), thdot=jnp.float32(0.0))
    upright = PendulumState(th=jnp.float32(0.0), thdot=jnp.float32(0.0))
    v_bad = float(vfn(env.params, hanging, jax.random.PRNGKey(0)))
    v_good = float(vfn(env.params, upright, jax.random.PRNGKey(0)))
    assert v_bad > v_good + 10.0


def test_mppiq_with_learned_quadratic_q(pendulum):
    """MPPIQ blending a quadratic Q over observations — the controller of
    the ICLR'21 paper with an actual Q model plugged into q_fn."""
    env = pendulum
    model = QuadraticQFunc(d_obs=env.d_obs, d_action=env.d_action)
    q_params = model.init_params(jax.random.PRNGKey(5))

    solver = solvers.MPPIQ(
        d_action=env.d_action, horizon=12, num_particles=64,
        beta=0.5, td_lam=0.9, gamma=0.99, init_cov=1.0,
        q_fn=lambda obs, acts: model(q_params, obs, acts))
    s0 = solver.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    solve = jax.jit(solvers.make_solve_fn(solver, env, calc_val=True))
    a, v, s1 = solve(env.params, est, s0)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(float(v))
    assert not np.allclose(np.asarray(s1.mean), np.asarray(s0.mean))


def test_mppiq_td_lambda_reduces_to_ctg(pendulum):
    """With q=0 everywhere except terminal=cost and td_lam=1, gamma=1 the
    blended returns equal plain cost-to-go (reference mppiq semantics)."""
    solver = solvers.MPPIQ(d_action=1, horizon=6, num_particles=4,
                           beta=1.0, td_lam=1.0, gamma=1.0)
    costs = jnp.asarray(np.random.RandomState(0).rand(4, 6), jnp.float32)
    from mjmpc_tpu import ops
    returns = solver.calculate_returns(costs, None)
    ctg = ops.cost_to_go(costs, ops.gamma_sequence(1.0, 6))
    np.testing.assert_allclose(np.asarray(returns), np.asarray(ctg),
                               rtol=1e-4, atol=1e-5)


def test_random_shooting_nn(pendulum):
    env = pendulum
    solver = solvers.RandomShootingNN(
        d_obs=env.d_obs, d_action=env.d_action, horizon=10,
        num_particles=32, hidden=(16,), init_cov=1.0, step_size=0.8)
    s0 = solver.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    a, v, s1 = solve(env.params, est, s0)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(s1.mean), 0.0)
    # best-rollout semantics: mean equals step-blend toward SOME rollout's
    # action sequence; with step_size=0.8 and zero init it is 0.8*actions
    a2, _, s2 = solve(env.params, est, s1)
    assert np.isfinite(np.asarray(s2.mean)).all()


def test_rms_update_matches_batch_stats(rng):
    xs = rng.randn(500, 3).astype(np.float32)
    rms = rms_init((3,))
    upd = jax.jit(rms_update)
    for x in xs:
        rms = upd(rms, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(rms.mean), xs.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rms.var), xs.var(0), rtol=0.02)


def test_normalize_obs_wrapper(pendulum):
    env = normalize_obs(pendulum, clip_obs=5.0)
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(30):
        s, obs, r, d = step(env.params, s, jnp.array([0.5]))
    o = np.asarray(obs)
    assert o.shape == (3,)
    assert (np.abs(o) <= 5.0).all()
    # statistics actually accumulated
    assert float(s.rms.count) > 29


def test_normalize_reward_path(pendulum):
    env = normalize_obs(pendulum, norm_reward=True)
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(10):
        s, obs, r, d = step(env.params, s, jnp.array([0.5]))
    assert np.isfinite(float(r))
    assert abs(float(r)) <= 10.0


def test_frame_stack_wrapper(pendulum):
    env = frame_stack(pendulum, k=3)
    assert env.d_obs == 9
    s = env.init(env.params, jax.random.PRNGKey(0))
    obs0 = np.asarray(env.observe(env.params, s))
    # first two frames are zero padding
    assert np.allclose(obs0[:6], 0.0) and not np.allclose(obs0[6:], 0.0)
    step = jax.jit(env.step)
    s, obs, r, d = step(env.params, s, jnp.array([0.3]))
    s, obs, r, d = step(env.params, s, jnp.array([0.3]))
    o = np.asarray(obs)
    assert np.allclose(o[:3], obs0[6:], atol=1e-5)  # oldest frame shifted

    # MPC still runs through the stacked env
    solver = solvers.MPPI(d_action=1, horizon=8, num_particles=16, lam=0.1,
                          init_cov=1.0)
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    a, v, st = solve(env.params, s, solver.init_state(jax.random.PRNGKey(2)))
    assert np.isfinite(np.asarray(a)).all()

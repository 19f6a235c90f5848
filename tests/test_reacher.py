"""reacher_7dof-v0 behavior: obs layout, reward formula, reset ranges,
success predicate, continual target events — reference
mjmpc/envs/basic/reacher_env.py semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.engine import chain as rb


@pytest.fixture(scope="module")
def env():
    return envs.make("reacher_7dof-v0")


def test_registered(env):
    assert "reacher_7dof-v0" in envs.available()
    assert "continual_reacher-v0" in envs.available()
    assert env.d_obs == 20 and env.d_action == 7
    assert env.max_episode_steps == 75


def test_obs_layout_and_reward(env):
    state = env.init(env.params, jax.random.PRNGKey(0))
    obs = env.observe(env.params, state)
    assert obs.shape == (20,)
    hand = rb.site_position(env.params.model, state.qpos)
    np.testing.assert_allclose(np.asarray(obs[14:17]), np.asarray(hand),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(obs[17:20]),
                               np.asarray(hand - state.target), rtol=1e-5)

    new_state, obs2, reward, done = jax.jit(env.step)(
        env.params, state, jnp.zeros(7))
    hand2 = rb.site_position(env.params.model, new_state.qpos)
    diff = np.asarray(hand2 - new_state.target)
    expected = -np.abs(diff).sum() - 5.0 * np.linalg.norm(diff)
    np.testing.assert_allclose(float(reward), expected, rtol=1e-4)
    assert not bool(done)


def test_target_reset_box(env):
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    targets = np.stack([np.asarray(env.init(env.params, k).target)
                        for k in keys])
    assert targets[:, 0].min() >= -0.3 and targets[:, 0].max() <= 0.3
    assert targets[:, 1].min() >= -0.2 and targets[:, 1].max() <= 0.2
    assert targets[:, 2].min() >= -0.25 and targets[:, 2].max() <= 0.25
    # actually spans the box
    assert targets[:, 0].std() > 0.1


def test_success_predicate(env):
    state = env.init(env.params, jax.random.PRNGKey(0))
    hand = rb.site_position(env.params.model, state.qpos)
    near = state._replace(target=hand + 0.01)
    far = state._replace(target=hand + jnp.array([0.5, 0.0, 0.0]))
    assert bool(env.success(env.params, near))
    assert not bool(env.success(env.params, far))


def test_continual_target_switch():
    env = envs.make("continual_reacher-v0")
    state = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    t0 = np.asarray(state.target)
    for _ in range(49):
        state, *_ = step(env.params, state, jnp.zeros(7))
    np.testing.assert_allclose(np.asarray(state.target), t0, rtol=1e-6)
    state, *_ = step(env.params, state, jnp.zeros(7))  # step 50 fires
    assert not np.allclose(np.asarray(state.target), t0)


def test_dynamics_move_hand(env):
    state = env.init(env.params, jax.random.PRNGKey(0))
    h0 = np.asarray(rb.site_position(env.params.model, state.qpos))
    step = jax.jit(env.step)
    for _ in range(10):
        state, obs, r, d = step(env.params, state,
                                jnp.array([0.5, 0.3, 0.0, -0.4, 0.0, 0.0, 0.0]))
    h1 = np.asarray(rb.site_position(env.params.model, state.qpos))
    assert np.linalg.norm(h1 - h0) > 0.01
    assert np.isfinite(np.asarray(state.qpos)).all()
    assert np.isfinite(np.asarray(state.qvel)).all()


def test_mppi_reduces_distance(env):
    """Short MPC run must move the hand toward the target."""
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=128,
                          lam=0.01, init_cov=0.5, step_size=0.55,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 25))
    out = ep(env.params, jax.random.PRNGKey(3))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    # improving: mean reward of last 5 steps beats first 5
    assert r[-5:].mean() > r[:5].mean()

"""Rollout engine semantics tests (reference gym_env_wrapper.rollout
contract, gym_env_wrapper.py:89-156)."""
import jax
import jax.numpy as jnp
import numpy as np

from mjmpc_tpu import envs
from mjmpc_tpu.rollout import rollout_open_loop, rollout_closed_loop_linear


def _pendulum_traj(n=4, h=6, seed=0):
    env = envs.make("SimplePendulum-v0")
    key = jax.random.PRNGKey(seed)
    state0 = env.init(env.params, key)
    rng = np.random.RandomState(seed)
    mean = jnp.asarray(rng.randn(h, env.d_action), jnp.float32)
    noise = jnp.asarray(rng.randn(n, h, env.d_action), jnp.float32)
    return env, state0, mean, noise


class TestOpenLoop:
    def test_shapes(self):
        env, s0, mean, noise = _pendulum_traj()
        traj = rollout_open_loop(env, env.params, s0, mean, noise)
        assert traj.costs.shape == (4, 6)
        assert traj.observations.shape == (4, 6, 3)
        assert traj.actions.shape == (4, 6, 1)
        assert traj.next_observations.shape == (4, 6, 3)

    def test_actions_are_mean_plus_noise(self):
        """Recorded actions are pre-clip commanded actions
        (gym_env_wrapper.py:133-151)."""
        env, s0, mean, noise = _pendulum_traj()
        traj = rollout_open_loop(env, env.params, s0, mean, noise)
        np.testing.assert_allclose(
            np.asarray(traj.actions),
            np.asarray(mean)[None] + np.asarray(noise), rtol=1e-6)

    def test_zero_noise_particles_identical(self):
        """All particles start from the same state (g_e_w.py:123-127)."""
        env, s0, mean, _ = _pendulum_traj()
        noise = jnp.zeros((5, 6, 1))
        traj = rollout_open_loop(env, env.params, s0, mean, noise)
        c = np.asarray(traj.costs)
        for b in range(1, 5):
            np.testing.assert_allclose(c[b], c[0], rtol=1e-6)

    def test_matches_serial_replay(self):
        """Batch rollout == serial per-particle env.step replay."""
        env, s0, mean, noise = _pendulum_traj(n=3, h=5)
        traj = rollout_open_loop(env, env.params, s0, mean, noise)
        mean_np, noise_np = np.asarray(mean), np.asarray(noise)
        for b in range(3):
            state = s0
            for t in range(5):
                u = jnp.asarray(mean_np[t] + noise_np[b, t])
                state, obs, rew, done = env.step(env.params, state, u)
                np.testing.assert_allclose(
                    np.asarray(traj.costs)[b, t], -float(rew), rtol=1e-5)
                np.testing.assert_allclose(
                    np.asarray(traj.next_observations)[b, t], np.asarray(obs),
                    rtol=1e-5)

    def test_first_observation_is_initial_state(self):
        env, s0, mean, noise = _pendulum_traj()
        traj = rollout_open_loop(env, env.params, s0, mean, noise)
        obs0 = np.asarray(env.observe(env.params, s0))
        for b in range(4):
            np.testing.assert_allclose(
                np.asarray(traj.observations)[b, 0], obs0, rtol=1e-6)

    def test_jit_compiles(self):
        env, s0, mean, noise = _pendulum_traj()
        f = jax.jit(lambda m, n: rollout_open_loop(env, env.params, s0, m, n))
        traj = f(mean, noise)
        assert np.isfinite(np.asarray(traj.costs)).all()


class TestClosedLoopLinear:
    def test_linear_policy_actions(self):
        """u = W.T [obs; 1] + eps (gym_env_wrapper.py:137-140)."""
        env = envs.make("SimplePendulum-v0")
        s0 = env.init(env.params, jax.random.PRNGKey(3))
        rng = np.random.RandomState(1)
        weights = jnp.asarray(rng.randn(env.d_obs + 1, env.d_action) * 0.1,
                              jnp.float32)
        noise = jnp.asarray(rng.randn(2, 4, 1) * 0.01, jnp.float32)
        traj = rollout_closed_loop_linear(env, env.params, s0, weights, noise)
        w = np.asarray(weights)
        obs = np.asarray(traj.observations)
        want = np.concatenate([obs, np.ones(obs.shape[:-1] + (1,))], -1) @ w \
            + np.asarray(noise)
        np.testing.assert_allclose(np.asarray(traj.actions), want, rtol=1e-5,
                                   atol=1e-6)


class TestEnvRegistry:
    def test_available(self):
        names = envs.available()
        for n in ["SimplePendulum-v0", "LQR-v0", "point_mass-v0", "cartpole-v0"]:
            assert n in names

    def test_unknown_raises(self):
        import pytest
        with pytest.raises(ValueError):
            envs.make("nope-v0")

    def test_all_registered_envs_step(self):
        key = jax.random.PRNGKey(0)
        for name in envs.available():
            env = envs.make(name)
            s = env.init(env.params, key)
            u = jnp.zeros((env.d_action,))
            s2, obs, rew, done = env.step(env.params, s, u)
            assert obs.shape == (env.d_obs,), name
            assert np.isfinite(float(rew)), name

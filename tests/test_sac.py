"""SAC subsystem: policy squash/log-prob math, twin-Q update step sanity,
replay buffers, and SACMPC smoke (SAC Q feeding MPPIQ)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs
from mjmpc_tpu.rl import SAC, SACMPC, ReplayMemory, ReplayMemoryTraj
from mjmpc_tpu.rl.sac import GaussianPolicy


def test_policy_sample_in_bounds_and_logprob(rng):
    pol = GaussianPolicy(d_obs=3, d_action=2, hidden=(16,))
    params = pol.init_params(jax.random.PRNGKey(0))
    obs = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    a, logp, mean = pol.sample(params, obs, jax.random.PRNGKey(1))
    assert (np.abs(np.asarray(a)) <= 1.0).all()
    assert np.isfinite(np.asarray(logp)).all()
    assert (np.abs(np.asarray(mean)) <= 1.0).all()


def test_replay_buffers(rng):
    mem = ReplayMemory(capacity=10, seed=0)
    for i in range(25):
        mem.push(np.full(3, i, np.float32), np.zeros(1), float(i),
                 np.zeros(3), False)
    assert len(mem) == 10
    batch = mem.sample(8)
    # ring: only the last 10 rewards survive
    assert (batch["reward"] >= 15).all()

    tmem = ReplayMemoryTraj(capacity=3, seed=0)
    for i in range(5):
        tmem.push(dict(obs=np.ones((4, 3)) * i, reward=np.ones(4) * i))
    assert len(tmem) == 3
    b = tmem.sample(6)
    assert b["obs"].shape == (6, 3)


def test_sac_update_reduces_q_loss(rng):
    sac = SAC(d_obs=3, d_action=1, hidden=(32, 32), lr=3e-3)
    params = sac.init_params(jax.random.PRNGKey(0))
    batch = {
        "obs": jnp.asarray(rng.randn(256, 3).astype(np.float32)),
        "action": jnp.asarray(np.tanh(rng.randn(256, 1)).astype(np.float32)),
        "reward": jnp.asarray(rng.randn(256).astype(np.float32)),
        "next_obs": jnp.asarray(rng.randn(256, 3).astype(np.float32)),
        # terminal transitions: the TD target is the fixed reward, so the
        # twin-Q regression must converge
        "done": jnp.ones(256, jnp.float32),
    }
    update = jax.jit(sac.update)
    losses = []
    for i in range(100):
        params, info = update(params, batch, jax.random.PRNGKey(i))
        losses.append(float(info["q_loss"]))
    assert losses[-1] < losses[0] * 0.75
    assert np.isfinite(losses).all()
    # target network moved but lags behind q
    q_leaf = jax.tree_util.tree_leaves(params.q)[0]
    t_leaf = jax.tree_util.tree_leaves(params.q_target)[0]
    assert not np.allclose(np.asarray(q_leaf), np.asarray(t_leaf))


def test_sacmpc_smoke():
    env = envs.make("SimplePendulum-v0")
    agent = SACMPC(env, horizon=8, num_particles=32, batch_size=32,
                   replay_capacity=1000, seed=0)
    rewards = agent.train(n_steps=60, episode_length=30, min_buffer=40)
    assert len(rewards) == 2
    assert all(np.isfinite(r) for r in rewards)
    assert len(agent.memory) == 60

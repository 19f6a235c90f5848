"""Rendering: frames come out with pixels for every supported env family,
and the video dump writes a file."""
import os

import jax
import numpy as np
import pytest

from mjmpc_tpu import envs, render, solvers
from mjmpc_tpu.harness.episode import run_episodes


def _short_run(env_name, d_action):
    env = envs.make(env_name)
    solver = solvers.MPPI(d_action=d_action, horizon=6, num_particles=8,
                          lam=0.1, init_cov=0.5)
    return env, run_episodes(solver, env, n_episodes=1, episode_length=4,
                             base_seed=0)


@pytest.mark.parametrize("env_name,d_action", [
    ("SimplePendulum-v0", 1),
    ("reacher_7dof-v0", 7),
    ("acrobot-v0", 1),
])
def test_render_frames(env_name, d_action):
    env, out = _short_run(env_name, d_action)
    frames = render.render_trajectory(env, out["states"], episode=0)
    assert len(frames) == 4
    f = frames[0]
    assert f.ndim == 3 and f.shape[2] == 3
    assert f.std() > 1.0  # actually drew something


def test_dump_videos(tmp_path):
    env, out = _short_run("SimplePendulum-v0", 1)
    paths = render.dump_videos(env, out["states"], str(tmp_path))
    assert len(paths) == 1
    assert os.path.exists(paths[0])
    assert os.path.getsize(paths[0]) > 1000


def test_unsupported_env_raises():
    env, out = _short_run("SimplePendulum-v0", 1)
    import dataclasses
    bad = dataclasses.replace(env, name="nope-v0")
    with pytest.raises(ValueError):
        render.render_trajectory(bad, out["states"])


def test_hand_env_renderers():
    """The round-2 hand envs (quaternion objects) render: pen capsule,
    relocate ball+target, hammer+nail, door panel+handle."""
    import jax.numpy as jnp
    for name in ("pen-v0", "relocate-v0", "hammer-v0", "door-v0"):
        env = envs.make(name)
        s = env.init(env.params, jax.random.PRNGKey(0))
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (1, 2) + x.shape), s)
        frames = render.render_trajectory(env, states)
        assert len(frames) == 2
        assert frames[0].ndim == 3 and frames[0].shape[2] == 3

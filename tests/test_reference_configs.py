"""The harness must load the REFERENCE's own config files unmodified
(harness/config.py contract). Skipped when the reference checkout is not
mounted."""
import os

import pytest

from mjmpc_tpu import envs
from mjmpc_tpu.harness import config as cfg

_REF = "/root/reference/examples/configs"


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference checkout not mounted")
def test_reference_reacher_config_loads_unmodified():
    exp = cfg.load_config(os.path.join(_REF, "reacher_7dof-v0.yml"))
    env = envs.make(exp["env_name"])
    for name in ("mppi", "random_shooting", "cem", "dmd", "pfmpc"):
        solver = cfg.make_solver_for_env(exp, name, env)
        # num_cpu x particles_per_cpu folded in
        assert solver.num_particles == 32
        assert solver.horizon == 16


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference checkout not mounted")
def test_reference_pendulum_config_runs():
    import jax
    from mjmpc_tpu.harness.episode import run_episodes
    path = os.path.join(_REF, "classic_control", "simple_pendulum-v0.yml")
    if not os.path.exists(path):
        pytest.skip("no pendulum config in reference")
    exp = cfg.load_config(path)
    env = envs.make(exp["env_name"])
    solver = cfg.make_solver_for_env(exp, "mppi", env)
    out = run_episodes(solver, env, n_episodes=1, episode_length=10,
                       base_seed=exp["seed"])
    assert out["rewards"].shape == (1, 10)

"""Regression tests for the code-review findings: stale-Q capture in
SACMPC, config tune-list scalarization, sharded episodes for non-Gaussian
solvers, iLQR integer-leaf handling, MPPIQ horizon=1, run_mpc
checkpoint flag, renderer field names."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, parallel, solvers
from mjmpc_tpu.harness import config as cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_sacmpc_planner_sees_updated_q():
    """The jitted solve must consume the LIVE SAC Q params: with identical
    solver/env state, the planned action changes after Q updates."""
    from mjmpc_tpu.rl import SACMPC
    env = envs.make("SimplePendulum-v0")
    agent = SACMPC(env, horizon=8, num_particles=32, batch_size=32,
                   replay_capacity=500, seed=0)
    est = env.init(env.params, jax.random.PRNGKey(1))
    s0 = agent.solver.init_state(jax.random.PRNGKey(2))

    a_before, _, _ = agent._solve(env.params, est, s0, agent.sac_params.q)

    # move the Q params far away
    moved_q = jax.tree_util.tree_map(lambda x: x + 1.0, agent.sac_params.q)
    a_after, _, _ = agent._solve(env.params, est, s0, moved_q)
    assert not np.allclose(np.asarray(a_before), np.asarray(a_after))


def test_config_scalarizes_tune_lists():
    """Reference tune configs put lists in scalar fields; single runs must
    take the first entry (reference hand/pen-v0.yml style)."""
    exp = {
        "env_name": "SimplePendulum-v0",
        "base_action": "repeat",
        "mppi": dict(horizon=[8, 16], init_cov=3.0,
                     filter_coeffs=[0.25, 0.8, 0.0], gamma=1.0,
                     n_iters=1, step_size=[0.5, 0.9], lam=0.01, alpha=1,
                     num_cpu=2, particles_per_cpu=[2, 4, 6, 8]),
    }
    env = envs.make("SimplePendulum-v0")
    solver = cfg.make_solver_for_env(exp, "mppi", env)
    assert solver.horizon == 8
    assert solver.step_size == 0.5
    assert solver.num_particles == 4   # 2 cpu x FIRST(2) — not the product
    assert solver.filter_coeffs == (0.25, 0.8, 0.0)


@pytest.mark.skipif(not os.path.isdir("/root/reference/examples/configs"),
                    reason="reference not mounted")
def test_reference_hand_config_with_tune_lists_loads():
    path = "/root/reference/examples/configs/hand/pen-v0.yml"
    if not os.path.exists(path):
        pytest.skip("no pen config")
    exp = cfg.load_config(path)
    env = envs.make("SimplePendulum-v0")  # any env; checking translation
    for name in exp:
        if name in solvers.REGISTRY and isinstance(exp[name], dict):
            solver = cfg.solver_params_from_config(exp, name, env)
            assert solver["num_particles"] < 10_000  # no grid blow-up


def test_sharded_episode_pfmpc_and_reinforce():
    env = envs.make("SimplePendulum-v0")
    mesh = parallel.make_mesh(episodes=2, particles=4)

    pf = solvers.PFMPC(d_action=1, horizon=6, num_particles=8, lam=0.1)
    ep = parallel.build_sharded_episode_fn(pf, env, 3, mesh)
    out = ep(env.params, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out["reward"])).all()

    rf = solvers.Reinforce(d_obs=3, d_action=1, horizon=6,
                           num_particles=8, lr=0.1, init_cov=0.5,
                           baseline_type="linear")
    ep2 = parallel.build_sharded_episode_fn(rf, env, 3, mesh)
    out2 = ep2(env.params, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out2["reward"])).all()


def test_ilqr_on_env_with_integer_state_leaves():
    """maze state carries an int timestep and a uint32 PRNG key; iLQR
    must hold them fixed instead of casting through f32 (which rounds
    uint32 keys to multiples of 256 and zeroes Jacobian columns)."""
    env = envs.make("continual_maze-v0")
    solver = solvers.ILQR(d_action=2, horizon=8, n_iters=3, mu=1e-2)
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    est = env.init(env.params, jax.random.PRNGKey(0))
    a, v, s = solve(env.params, est,
                    solver.init_state(jax.random.PRNGKey(1)))
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(float(v))
    # the key must round-trip the planner EXACTLY (uint32-preserving)
    from mjmpc_tpu.solvers.ilqr import _ravel_spec
    ravel, unravel = _ravel_spec(est)
    rt = unravel(ravel(est))
    np.testing.assert_array_equal(np.asarray(rt.key), np.asarray(est.key))
    assert rt.timestep.dtype == est.timestep.dtype


def test_mppiq_horizon_one():
    env = envs.make("SimplePendulum-v0")
    solver = solvers.MPPIQ(d_action=1, horizon=1, num_particles=16,
                           beta=0.5, td_lam=0.9)
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    est = env.init(env.params, jax.random.PRNGKey(0))
    a, v, s = solve(env.params, est,
                    solver.init_state(jax.random.PRNGKey(1)))
    assert np.isfinite(np.asarray(a)).all()


def test_run_mpc_checkpoint_flag(tmp_path):
    from mjmpc_tpu.harness import run_mpc
    cfg_path = os.path.join(CONFIG_DIR, "SimplePendulum-v0.yml")
    run_mpc.main(["--config", cfg_path, "--controller", "mppi",
                  "--save_dir", str(tmp_path), "--checkpoint"])
    found = False
    for root, _, files in os.walk(tmp_path):
        found |= any(f.startswith("solver_state") and f.endswith(".npz")
                     for f in files)
    assert found


def test_render_cartpole_and_point_mass():
    from mjmpc_tpu import render
    from mjmpc_tpu.harness.episode import run_episodes
    for name, da in (("cartpole-v0", 1), ("point_mass-v0", 2),
                     ("maze-v0", 2)):
        env = envs.make(name)
        solver = solvers.MPPI(d_action=da, horizon=4, num_particles=8,
                              lam=0.1, init_cov=0.5)
        out = run_episodes(solver, env, 1, 3, base_seed=0)
        frames = render.render_trajectory(env, out["states"])
        assert len(frames) == 3 and frames[0].std() > 1.0

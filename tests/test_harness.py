"""Harness: config translation, episode batch runner, tune/sweep jobs,
logger CSV resume, checkpoint round-trip, dynamics randomization."""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.harness import (config as cfg, checkpoint, episode, jobs)
from mjmpc_tpu.utils import LoggerClass

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def pend_cfg():
    return cfg.load_config(os.path.join(CONFIG_DIR, "SimplePendulum-v0.yml"))


def test_config_translation(pend_cfg):
    env = envs.make(pend_cfg["env_name"])
    params = cfg.solver_params_from_config(pend_cfg, "mppi", env)
    assert params["num_particles"] == 24           # 4 cpu x 6 per cpu
    assert params["lam"] == 0.01
    assert params["filter_coeffs"] == (0.25, 0.8, 0.0)
    assert "num_cpu" not in params
    solver = solvers.make_solver("mppi", **params)
    assert solver.horizon == 32

    with pytest.raises(ValueError):
        cfg.solver_params_from_config(pend_cfg, "not_a_controller", env)


def test_all_reference_sections_build(pend_cfg):
    env = envs.make(pend_cfg["env_name"])
    for name in ("mppi", "random_shooting", "cem", "dmd", "pfmpc"):
        solver = cfg.make_solver_for_env(pend_cfg, name, env)
        assert solver.num_particles > 0


def test_run_episodes_pendulum_swingup(pend_cfg):
    env = envs.make(pend_cfg["env_name"])
    solver = cfg.make_solver_for_env(pend_cfg, "mppi", env)
    out = episode.run_episodes(solver, env, n_episodes=2,
                               episode_length=60, base_seed=123)
    assert out["rewards"].shape == (2, 60)
    assert np.isfinite(out["rewards"]).all()
    assert out["average_reward"] == pytest.approx(
        out["ep_rewards"].mean())
    # distinct seeds -> distinct episodes
    assert not np.allclose(out["rewards"][0], out["rewards"][1])


def test_sim_real_param_split():
    """Model-mismatch: solver plans with a wrong pendulum mass but the real
    env advances nominally — rewards must differ from the matched run."""
    env = envs.make("SimplePendulum-v0")
    solver = solvers.MPPI(d_action=env.d_action, horizon=12,
                          num_particles=24, lam=0.01, init_cov=3.5,
                          step_size=0.55, filter_coeffs=(0.25, 0.8, 0.0))
    biased = env.params._replace(m=jnp.float32(3.0))
    matched = episode.run_episodes(solver, env, 1, 25, base_seed=7)
    mismatched = episode.run_episodes(solver, env, 1, 25, base_seed=7,
                                      sim_params=biased)
    assert not np.allclose(matched["rewards"], mismatched["rewards"])


def test_jobs_sweep_and_tune(tmp_path, pend_cfg):
    exp = dict(pend_cfg)
    exp["n_episodes"] = 1
    exp["max_ep_length"] = 20
    exp["mppi"] = dict(pend_cfg["mppi"])
    exp["mppi"]["horizon"] = [8, 12]       # paired sweep list
    exp["mppi"]["num_cpu"] = 2
    exp["mppi"]["particles_per_cpu"] = 8

    rows = jobs.sweep(exp, "mppi", envs.make(exp["env_name"]),
                      str(tmp_path / "sweep"))
    assert len(rows) == 2
    assert {r["params"]["horizon"] for r in rows} == {8, 12}
    assert os.path.exists(tmp_path / "sweep" / "sweep_results.json")

    best, history = jobs.tune(exp, "mppi", envs.make(exp["env_name"]),
                              str(tmp_path / "tune"),
                              success_early_stop=1000.0)
    assert len(history) == 2
    assert best["params"]["horizon"] in (8, 12)


def test_logger_tabular_resume(tmp_path):
    log_path = str(tmp_path / "run.log")
    lg = LoggerClass()
    lg.setup("t", log_path)
    lg.record_tabular("A", 1.0)
    lg.record_tabular("B", 2.0)
    lg.dump_tabular()
    lg.record_tabular("A", 3.0)   # B missing -> NaN padded
    lg.dump_tabular()

    lg2 = LoggerClass()
    lg2.setup("t", log_path)      # resume from CSV
    assert lg2._num_dump_tabular_calls == 2
    lg2.record_tabular("A", 5.0)
    lg2.record_tabular("C", 6.0)  # new col -> NaN back-padded
    lg2.dump_tabular()
    assert lg2._tabular["A"] == [1.0, 3.0, 5.0]
    assert math.isnan(lg2._tabular["B"][1])
    assert math.isnan(lg2._tabular["C"][0])


def test_checkpoint_roundtrip(tmp_path):
    solver = solvers.MPPI(d_action=2, horizon=8, num_particles=16)
    state = solver.init_state(jax.random.PRNGKey(0))
    state = state._replace(mean=state.mean + 1.5)
    path = str(tmp_path / "ckpt")
    checkpoint.save_solver_state(path, state, metadata={"step": 3})
    restored = checkpoint.load_solver_state(path, solver.init_state(
        jax.random.PRNGKey(1)))
    np.testing.assert_allclose(np.asarray(restored.mean),
                               np.asarray(state.mean))
    np.testing.assert_array_equal(np.asarray(restored.key),
                                  np.asarray(state.key))


def test_dynamics_randomization_reacher():
    env = envs.make("reacher_7dof-v0")
    spec = {"body_mass": {"r_forearm_roll_link": [0.2, 0.5]},
            "dof_damping": {"r_elbow_flex_joint": [0.3, 0.0]}}
    new_env, defaults, randomized = envs.randomize_dynamics(env, spec,
                                                            base_seed=42)
    m0 = float(defaults["body_mass"]["r_forearm_roll_link"])
    m1 = float(randomized["body_mass"]["r_forearm_roll_link"])
    # biased mean 1.5*m0, +-20%
    assert 1.5 * m0 * 0.8 <= m1 <= 1.5 * m0 * 1.2
    assert m1 != m0
    # untouched entries stay put
    np.testing.assert_allclose(
        np.asarray(new_env.params.model.mass[:4]),
        np.asarray(env.params.model.mass[:4]))

    # defaults must not drift across repeated randomization
    # (reference tests/dynamics_randomization_test.py)
    _, defaults2, _ = envs.randomize_dynamics(env, spec, base_seed=43)
    assert float(defaults2["body_mass"]["r_forearm_roll_link"]) == m0

    # perturbed dynamics still simulate
    s = new_env.init(new_env.params, jax.random.PRNGKey(0))
    s2, obs, r, d = jax.jit(new_env.step)(new_env.params, s, jnp.ones(7))
    assert np.isfinite(np.asarray(obs)).all()


def test_dynamics_randomize_batch():
    env = envs.make("reacher_7dof-v0")
    spec = {"body_mass": {"r_wrist_roll_link": [0.5, 0.0]}}
    batch = envs.randomize_batch(env, spec, base_seed=1, n=4)
    masses = np.asarray(batch.model.mass[:, 6])
    assert len(np.unique(masses)) == 4


def test_run_mpc_cli(tmp_path):
    from mjmpc_tpu.harness import run_mpc
    cfg_path = os.path.join(CONFIG_DIR, "SimplePendulum-v0.yml")
    results = run_mpc.main([
        "--config", cfg_path, "--controller", "mppi",
        "--save_dir", str(tmp_path), "--save_trajectories"])
    assert "mppi" in results
    assert results["mppi"]["rewards"].shape[0] == 3
    # log dir with csv + npz exists
    found_csv = found_npz = False
    for root, _, files in os.walk(tmp_path):
        found_csv |= any(f.endswith(".csv") for f in files)
        found_npz |= any(f.endswith(".npz") for f in files)
    assert found_csv and found_npz


def test_dynamics_randomization_analytic_params():
    """Direct 'params' field paths randomize analytic envs (pendulum mass)."""
    env = envs.make("SimplePendulum-v0")
    spec = {"params": {"m": [0.2, 0.5]}}
    new_env, defaults, randomized = envs.randomize_dynamics(env, spec,
                                                            base_seed=3)
    m0 = float(defaults["params"]["m"])
    m1 = float(randomized["params"]["m"])
    assert m0 == 1.0
    assert 1.5 * 0.8 <= m1 <= 1.5 * 1.2 and m1 != m0
    assert float(new_env.params.m) == pytest.approx(m1)
    # dynamics actually differ under the perturbed params
    s = env.init(env.params, jax.random.PRNGKey(0))
    a = jnp.array([1.0])
    _, _, r_nom, _ = env.step(env.params, s, a)
    _, _, r_rand, _ = new_env.step(new_env.params, s, a)
    s1n, *_ = env.step(env.params, s, a)
    s1r, *_ = new_env.step(new_env.params, s, a)
    assert float(s1n.thdot) != float(s1r.thdot)


def test_run_episodes_chunked_matches_fused():
    """Chunked execution must produce the same trajectories as the fused
    single-scan program (same keys, same carry)."""
    env = envs.make("SimplePendulum-v0")
    solver = solvers.MPPI(d_action=1, horizon=8, num_particles=16,
                          lam=0.1, init_cov=1.0)
    fused = episode.run_episodes(solver, env, 2, 12, base_seed=5)
    chunked = episode.run_episodes(solver, env, 2, 12, base_seed=5,
                                   chunk_size=5)
    np.testing.assert_allclose(chunked["rewards"], fused["rewards"],
                               rtol=1e-5, atol=1e-6)
    # chunk boundaries change op fusion -> small float reassociation
    np.testing.assert_allclose(
        np.asarray(chunked["final_solver_states"].mean),
        np.asarray(fused["final_solver_states"].mean), atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(chunked["final_solver_states"].step),
        np.asarray(fused["final_solver_states"].step))


def test_dynamics_randomization_frictionloss():
    """dof_frictionloss (reference gym_env_wrapper.py:386-388): perturbs
    the ChainModel's Coulomb joint-friction leaf, and nonzero friction
    actually brakes the joint."""
    env = envs.make("reacher_7dof-v0")
    # frictionloss defaults to 0, so the multiplicative perturbation law
    # keeps it 0 — seed a nonzero default first (as a mj model would)
    model = env.params.model
    env = env.with_params(env.params._replace(
        model=model._replace(frictionloss=jnp.full(model.nv, 0.5))))
    spec = {"dof_frictionloss": {"r_elbow_flex_joint": [0.2, 1.0]}}
    new_env, defaults, randomized = envs.randomize_dynamics(env, spec,
                                                            base_seed=5)
    f0 = float(defaults["dof_frictionloss"]["r_elbow_flex_joint"])
    f1 = float(randomized["dof_frictionloss"]["r_elbow_flex_joint"])
    assert f0 == pytest.approx(0.5)
    assert 2.0 * f0 * 0.8 <= f1 <= 2.0 * f0 * 1.2 and f1 != f0
    # Coulomb friction damps the coast-down: spin the elbow, step, and
    # the frictional model must lose more joint speed
    from mjmpc_tpu.engine import chain as rb
    q0 = jnp.zeros(model.nq)
    qd0 = jnp.full(model.nv, 0.5)   # small coast, away from the limits
    zero_model = model._replace(frictionloss=jnp.zeros(model.nv))
    _, qd_free = rb.step(zero_model, q0, qd0, jnp.zeros(model.nv), 1)
    _, qd_fric = rb.step(new_env.params.model, q0, qd0,
                         jnp.zeros(model.nv), 1)
    assert float(jnp.sum(jnp.abs(qd_fric))) < float(jnp.sum(jnp.abs(qd_free)))


def test_dynamics_randomization_geom_fields_pen():
    """geom_friction -> the contact model's own mu leaf and
    geom_size -> the pen radius leaf (reference
    gym_env_wrapper.py:392-400 + dyn_randomize_configs/hand/pen-v0.yml's
    geom_friction: pen row)."""
    env = envs.make("pen-v0")
    spec = {"geom_friction": {"pen": [0.2, 0.5]},
            "geom_size": {"pen": [0.1, 0.0]}}
    new_env, defaults, randomized = envs.randomize_dynamics(env, spec,
                                                            base_seed=11)
    mu0 = float(defaults["geom_friction"]["pen"])
    mu1 = float(randomized["geom_friction"]["pen"])
    assert mu0 == pytest.approx(1.2)
    assert 1.5 * mu0 * 0.8 <= mu1 <= 1.5 * mu0 * 1.2 and mu1 != mu0
    assert float(new_env.params.mu) == pytest.approx(mu1)
    r0 = float(defaults["geom_size"]["pen"])
    r1 = float(randomized["geom_size"]["pen"])
    assert r0 == pytest.approx(0.012)
    assert r0 * 0.9 <= r1 <= r0 * 1.1 and r1 != r0
    assert float(new_env.params.pen_r) == pytest.approx(r1)
    # joint damping (the old geom_friction fallback target) is untouched
    np.testing.assert_allclose(np.asarray(new_env.params.model.damping),
                               np.asarray(env.params.model.damping))


def test_dynamics_randomization_geom_friction_cheetah():
    env = envs.make("HalfCheetah-v0")
    spec = {"geom_friction": {"floor": [0.3, 0.0]}}
    new_env, defaults, randomized = envs.randomize_dynamics(env, spec,
                                                            base_seed=2)
    mu1 = float(randomized["geom_friction"]["floor"])
    assert 0.4 * 0.7 <= mu1 <= 0.4 * 1.3 and mu1 != 0.4
    assert float(new_env.params.mu) == pytest.approx(mu1)

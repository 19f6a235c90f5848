"""Panda tray-glass: wrist-parented payload physics, gravity compensation,
and the carry-without-spilling behavior under MPC."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers


@pytest.fixture(scope="module")
def env():
    return envs.make("panda_tray_glass-v0")


def test_registered(env):
    assert "panda_tray_glass-v0" in envs.available()
    assert "panda_reacher-v0" in envs.available()
    assert env.d_action == 7 and env.d_obs == 24


def test_passive_glass_stays_put(env):
    """Gravity-compensated arm at rest: the glass barely drifts."""
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(15):
        s, obs, r, d = step(env.params, s, jnp.zeros(7))
    assert float(jnp.linalg.norm(s.qpos[7:9])) < 0.05
    assert np.isfinite(np.asarray(s.qpos)).all()


def test_violent_motion_spills_glass(env):
    s = env.init(env.params, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(25):
        s, obs, r, d = step(env.params, s,
                            jnp.array([1., 1., 0., -1., 0., 1., 0.]))
    # glass thrown off the tray -> fall penalty active
    assert float(jnp.linalg.norm(s.qpos[7:9])) > 0.12
    assert float(r) < -5.0


def test_mpc_carries_without_spilling(env):
    solver = solvers.MPPI(d_action=7, horizon=16, num_particles=128,
                          lam=0.02, init_cov=0.25, step_size=0.7,
                          gamma=1.0, filter_coeffs=(0.25, 0.8, 0.0),
                          base_action="repeat")
    ep = jax.jit(solvers.evaluate_episode(solver, env, 50))
    out = ep(env.params, jax.random.PRNGKey(0))
    r = np.asarray(out["reward"])
    assert np.isfinite(r).all()
    # moving toward the target while keeping the glass on: reward improves
    # and no fall penalty fires (reward never dips below the -5 cliff)
    assert r[-5:].mean() > r[:5].mean()
    assert r.min() > -5.0


def test_dynamics_randomization_glass_mass(env):
    spec = {"body_mass": {"glass": [0.3, 0.5]}}
    new_env, dflt, rnd = envs.randomize_dynamics(env, spec, base_seed=7)
    m0 = float(dflt["body_mass"]["glass"])
    m1 = float(rnd["body_mass"]["glass"])
    assert m1 != m0 and 1.5 * m0 * 0.7 <= m1 <= 1.5 * m0 * 1.3

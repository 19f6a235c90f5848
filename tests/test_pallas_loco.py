"""Fused Pallas locomotion rollouts vs the XLA engine
(ops/pallas_chain.py build_chain_ext_rollout — per-substep external
forces + control-step cost law; runs in interpreter mode on the CPU
mesh). Swimmer exercises the fluid-drag hook, half-cheetah the branched
tree + ground-contact hook."""
import jax
import jax.numpy as jnp
import numpy as np

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.rollout.engine import rollout_open_loop


def _rollout_pair(name, n, h, d_action, seed=0, scale=0.5):
    env = envs.make(name)
    rng = np.random.default_rng(seed)
    mean = jnp.asarray(rng.normal(size=(h, d_action)) * 0.3, jnp.float32)
    noise = jnp.asarray(rng.normal(size=(n, h, d_action)) * scale,
                        jnp.float32)
    state = env.init(env.params, jax.random.PRNGKey(seed))
    costs_k = np.asarray(
        jax.jit(env.fused_rollout)(env.params, state, mean, noise))
    traj = rollout_open_loop(env, env.params, state, mean, noise)
    return costs_k, np.asarray(traj.costs)


def test_swimmer_kernel_matches_engine():
    costs_k, costs_e = _rollout_pair("Swimmer-v0", 16, 6, 4)
    assert costs_k.shape == costs_e.shape == (16, 6)
    # f32 vs f32, drag via analytic point Jacobians vs AD jvp — same
    # math, different summation orders
    np.testing.assert_allclose(costs_k, costs_e, rtol=0, atol=2e-3)


def test_cheetah_kernel_matches_engine():
    # 25 substeps/step of stiff contact dynamics: keep the window short
    costs_k, costs_e = _rollout_pair("HalfCheetah-v0", 8, 3, 6, seed=1,
                                     scale=0.3)
    assert costs_k.shape == costs_e.shape == (8, 3)
    scale = np.maximum(1.0, np.abs(costs_e))
    np.testing.assert_allclose(costs_k / scale, costs_e / scale,
                               rtol=0, atol=5e-3)


def test_swimmer_fused_solve_matches_general_solve():
    env = envs.make("Swimmer-v0")
    assert env.fused_rollout is not None
    solver = solvers.MPPI(d_action=4, horizon=6, num_particles=24,
                          lam=0.2, init_cov=0.3, step_size=1.0,
                          gamma=1.0, alpha=1, base_action="null",
                          filter_coeffs=(1.0, 0.0, 0.0))
    s0 = solver.init_state(jax.random.PRNGKey(0))
    es = env.init(env.params, jax.random.PRNGKey(1))
    a_f, _, sf = jax.jit(solvers.build_solve_fn(solver, env, fused=True))(
        env.params, es, s0)
    a_g, _, sg = jax.jit(solvers.build_solve_fn(solver, env, fused=False))(
        env.params, es, s0)
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_g),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sf.mean), np.asarray(sg.mean),
                               rtol=0, atol=5e-4)

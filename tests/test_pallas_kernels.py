"""Pallas kernels in interpreter mode (the CPU test mesh): exact parity of
the fused pendulum rollout with the scan engine, and distributional /
recurrence checks on the fused noise sampler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, ops
from mjmpc_tpu.ops import pallas_kernels as pk
from mjmpc_tpu.rollout.engine import rollout_open_loop

# The TPU hardware PRNG (pltpu.prng_seed/prng_random_bits) has no CPU
# interpreter lowering; noise-kernel tests only run on real TPU (the
# verify recipe covers them there).
requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu PRNG primitives have no CPU interpret path")


def test_pendulum_rollout_exact_parity():
    env = envs.make("SimplePendulum-v0")
    state = env.init(env.params, jax.random.PRNGKey(1))
    mean = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(3), (16, 8, 1))
    ref = rollout_open_loop(env, env.params, state, mean, noise).costs
    out = pk.pendulum_rollout_pallas(env.params, state.th, state.thdot,
                                     mean, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@requires_tpu
def test_noise_kernel_statistics():
    eps = np.asarray(pk.filtered_noise_pallas(7, (2048, 12), 2,
                                              (1.0, 0.0, 0.0)))
    assert eps.shape == (2048, 12, 2)
    assert np.isfinite(eps).all()
    assert abs(eps.mean()) < 0.05
    assert abs(eps.std() - 1.0) < 0.05
    # deterministic in seed, distinct across seeds
    eps2 = np.asarray(pk.filtered_noise_pallas(7, (2048, 12), 2,
                                               (1.0, 0.0, 0.0)))
    np.testing.assert_array_equal(eps, eps2)
    eps3 = np.asarray(pk.filtered_noise_pallas(8, (2048, 12), 2,
                                               (1.0, 0.0, 0.0)))
    assert not np.allclose(eps, eps3)


@requires_tpu
def test_noise_kernel_ar_recurrence():
    """With coeffs (b0,b1,b2), the filtered output must satisfy the IIR
    recurrence given the recovered white-noise innovations."""
    b0, b1, b2 = 0.25, 0.8, 0.1
    e = np.asarray(pk.filtered_noise_pallas(3, (64, 10), 1, (b0, b1, b2)))
    e = e[..., 0]
    # innovations: z[t] = (e[t] - b1 e[t-1] - b2 e[t-2]) / b0 for t>=2
    z = (e[:, 2:] - b1 * e[:, 1:-1] - b2 * e[:, :-2]) / b0
    # innovations must look standard-normal (they ARE the raw draws)
    assert abs(z.std() - 1.0) < 0.1
    assert abs(e[:, :2].std() - 1.0) < 0.1


@requires_tpu
def test_noise_kernel_cov_coloring():
    chol = jnp.asarray(np.linalg.cholesky(
        np.array([[2.0, 0.5], [0.5, 1.0]], np.float32)))
    eps = np.asarray(pk.filtered_noise_pallas(11, (4096, 4), 2,
                                              (1.0, 0.0, 0.0), chol=chol))
    flat = eps.reshape(-1, 2)
    emp = np.cov(flat.T)
    np.testing.assert_allclose(emp, [[2.0, 0.5], [0.5, 1.0]], atol=0.1)


@requires_tpu
def test_one_kernel_mppi_solve_controls():
    """The whole-solve kernel must produce a usable MPPI update: running
    it closed-loop keeps/brings the pendulum upright."""
    import jax.numpy as jnp
    from mjmpc_tpu import envs
    env = envs.make("SimplePendulum-v0")
    st = env.init(env.params, jax.random.PRNGKey(1))
    solve = jax.jit(lambda th, thdot, m, s: pk.mppi_pendulum_solve_pallas(
        env.params, th, thdot, m, s, 1024, (0.25, 0.8, 0.0),
        sigma=float(np.sqrt(3.5)), lam=0.01, step_size=0.55))
    step = jax.jit(env.step)
    mean = jnp.zeros((32, 1))
    total = 0.0
    for t in range(100):
        mean = solve(st.th, st.thdot, mean, 1000 + t)
        st, obs, r, d = step(env.params, st,
                             jnp.clip(mean[0], -2.0, 2.0))
        total += float(r)
        mean = jnp.roll(mean, -1, axis=0).at[-1].set(0.0)
    assert total > -400.0  # swing-up quality, not just finiteness

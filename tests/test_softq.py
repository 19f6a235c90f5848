"""SoftQ subsystem: quadratic Q model (analytic minimizer, regression fit,
grow_cov in moment space — reference softqmpc/tests semantics) + SoftQMPC
solve, and the ensemble MLP forward parity with per-member loops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.models import QuadraticQFunc, EnsembleMLP
from mjmpc_tpu import ops


def test_quadratic_q_conditional_minimizer(rng):
    """μ(s) must be the argmin of Q(s, ·) (P is PSD => convex in a)."""
    model = QuadraticQFunc(d_obs=3, d_action=2)
    params = model.init_params(jax.random.PRNGKey(0))
    obs = jnp.asarray(rng.randn(3).astype(np.float32))
    mu, sigma = model.act_mean_sigma(params, obs, lam=0.5)

    q_mu = model(params, obs, mu)
    for _ in range(20):
        a = mu + jnp.asarray(0.1 * rng.randn(2).astype(np.float32))
        assert float(model(params, obs, a)) >= float(q_mu) - 1e-4
    # Σ = λ Paa^-1 symmetric PD
    s = np.asarray(sigma)
    np.testing.assert_allclose(s, s.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(s) > 0)


def test_quadratic_q_regression_fit(rng):
    """SGD on the quadratic model must fit synthetic quadratic targets
    (reference simple_quadratic_model_regression_test.py)."""
    model = QuadraticQFunc(d_obs=2, d_action=1)
    d = 3
    a_true = rng.randn(d, d).astype(np.float32)
    p_true = a_true @ a_true.T + 0.5 * np.eye(d, dtype=np.float32)
    j_true = rng.randn(d).astype(np.float32)

    z = rng.randn(512, d).astype(np.float32)
    targets = 0.5 * np.einsum("bi,ij,bj->b", z, p_true, z) + z @ j_true
    obs, act = jnp.asarray(z[:, :2]), jnp.asarray(z[:, 2:])
    tgt = jnp.asarray(targets)

    params = model.init_params(jax.random.PRNGKey(1))
    loss_grad = jax.jit(jax.value_and_grad(
        lambda p: model.loss(p, obs, act, tgt)))
    loss0 = None
    for i in range(500):
        loss, g = loss_grad(params)
        if loss0 is None:
            loss0 = float(loss)
        params = jax.tree_util.tree_map(lambda w, gw: w - 0.01 * gw,
                                        params, g)
    assert float(loss) < 0.05 * loss0


def test_quadratic_q_grow_cov_moment_space():
    model = QuadraticQFunc(d_obs=2, d_action=2)
    params = model.init_params(jax.random.PRNGKey(2))
    lam, beta = 0.3, 0.7
    p0 = np.asarray(model.p_matrix(params))
    grown = model.grow_cov(params, beta, lam)
    p1 = np.asarray(model.p_matrix(grown))
    # Sigma_new = lam*inv(P0) + beta*I; P1 = lam*inv(Sigma_new)
    sigma_new = lam * np.linalg.inv(p0 + 1e-6 * np.eye(4)) + beta * np.eye(4)
    np.testing.assert_allclose(p1, lam * np.linalg.inv(sigma_new),
                               rtol=1e-3, atol=1e-4)


def test_softqmpc_solve_runs():
    env = envs.make("LQR-v0")
    solver = solvers.SoftQMPC(d_obs=env.d_obs, d_action=env.d_action,
                              horizon=8, num_particles=16, lam=0.5,
                              lr=1e-3, gamma=0.99)
    s0 = solver.init_state(jax.random.PRNGKey(0))
    env_state = env.init(env.params, jax.random.PRNGKey(1))
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    a, v, s1 = solve(env.params, env_state, s0)
    assert np.isfinite(np.asarray(a)).all()
    # Q params actually moved
    assert not np.allclose(np.asarray(s1.q_params.l_packed),
                           np.asarray(s0.q_params.l_packed))
    # chained solve still finite
    a2, _, s2 = solve(env.params, env_state, s1)
    assert np.isfinite(np.asarray(a2)).all()


def test_ensemble_mlp_matches_per_member_loop(rng):
    model = EnsembleMLP(d_in=3, d_out=2, n_hidden=8, n_layers=2,
                        ensemble_size=4, non_linearity="leaky_relu")
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(4, 5, 3).astype(np.float32))
    out = model(params, x)
    assert out.shape == (4, 5, 2)

    # per-member dense loop oracle
    for e in range(4):
        h = np.asarray(x[e])
        for li, lyr in enumerate(params):
            h = h @ np.asarray(lyr.weight[e]) + np.asarray(lyr.bias[e])
            if li < len(params) - 1:
                h = np.where(h > 0, h, 0.01 * h)
        np.testing.assert_allclose(np.asarray(out[e]), h, rtol=1e-4,
                                   atol=1e-5)


def test_ensemble_rejects_shallow():
    with pytest.raises(ValueError):
        EnsembleMLP(d_in=3, d_out=2, n_hidden=8, n_layers=1, ensemble_size=2)

"""Math-kernel tests: JAX ops vs the NumPy oracle / closed forms.

Oracle strategy follows the reference's own test style
(tests/gaussian_utils_test.py: compare against an independent
implementation to tight tolerance), upgraded to pytest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import ops
from mjmpc_tpu.oracle import numpy_ref

jax.config.update("jax_enable_x64", False)


class TestCostToGo:
    def test_matches_oracle(self, rng):
        costs = rng.randn(16, 32)
        gamma_seq = ops.gamma_sequence(0.99, 32)
        got = np.asarray(ops.cost_to_go(jnp.asarray(costs), gamma_seq))
        want = numpy_ref.cost_to_go(costs.copy(), gamma_seq)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gamma_zero_passthrough(self, rng):
        costs = rng.randn(4, 8)
        gamma_seq = ops.gamma_sequence(0.0, 8)
        got = np.asarray(ops.cost_to_go(jnp.asarray(costs), gamma_seq))
        np.testing.assert_allclose(got, costs)

    def test_undiscounted_is_reverse_cumsum(self, rng):
        costs = rng.randn(3, 10)
        gamma_seq = ops.gamma_sequence(1.0, 10)
        got = np.asarray(ops.cost_to_go(jnp.asarray(costs), gamma_seq))
        want = np.cumsum(costs[:, ::-1], axis=-1)[:, ::-1]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_recursion(self, rng):
        """ctg[t] = c[t] + gamma * ctg[t+1] — the defining recursion."""
        gamma = 0.95
        costs = rng.randn(2, 12)
        gamma_seq = ops.gamma_sequence(gamma, 12)
        ctg = np.asarray(ops.cost_to_go(jnp.asarray(costs), gamma_seq))
        np.testing.assert_allclose(
            ctg[:, :-1], costs[:, :-1] + gamma * ctg[:, 1:], rtol=1e-4, atol=1e-5)


class TestArFilter:
    def test_identity_coeffs(self, rng):
        eps = rng.randn(5, 9, 3)
        out = np.asarray(ops.ar_filter(jnp.asarray(eps), (1.0, 0.0, 0.0)))
        np.testing.assert_allclose(out, eps)

    @pytest.mark.parametrize("coeffs", [(0.5, 0.3, 0.2), (1.0, 0.5, 0.0)])
    def test_matches_reference_recurrence(self, rng, coeffs):
        eps = rng.randn(6, 16, 2)
        want = eps.copy()
        b0, b1, b2 = coeffs
        for i in range(2, want.shape[1]):
            want[:, i] = b0 * want[:, i] + b1 * want[:, i - 1] + b2 * want[:, i - 2]
        got = np.asarray(ops.ar_filter(jnp.asarray(eps), coeffs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_short_horizon_noop(self, rng):
        eps = rng.randn(4, 2, 3)
        got = np.asarray(ops.ar_filter(jnp.asarray(eps), (0.5, 0.25, 0.25)))
        np.testing.assert_allclose(got, eps)


class TestFilteredNoise:
    def test_moments(self):
        cov = jnp.asarray(np.diag([2.0, 0.5]))
        key = jax.random.PRNGKey(0)
        eps = ops.filtered_noise(key, cov, (4096, 8))
        var = np.var(np.asarray(eps), axis=(0, 1))
        np.testing.assert_allclose(var, [2.0, 0.5], rtol=0.1)

    def test_full_cov_sampling(self):
        cov_np = np.array([[1.0, 0.6], [0.6, 1.0]])
        key = jax.random.PRNGKey(1)
        eps = np.asarray(ops.gaussian_noise(key, jnp.asarray(cov_np), (20000,)))
        emp = np.cov(eps, rowvar=False)
        np.testing.assert_allclose(emp, cov_np, atol=0.05)

    def test_deterministic_in_key(self):
        cov = jnp.eye(3)
        key = jax.random.PRNGKey(7)
        a = ops.filtered_noise(key, cov, (8, 4), (0.7, 0.2, 0.1))
        b = ops.filtered_noise(key, cov, (8, 4), (0.7, 0.2, 0.1))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGaussianUtils:
    """Oracle: closed forms evaluated with scipy (reference used torch)."""

    def _setup(self, rng, n=4, s=6):
        mean = rng.randn(n, s)
        a = rng.randn(n, n)
        cov = a @ a.T + n * np.eye(n)
        x = rng.randn(n, s)
        return mean, cov, x

    def test_logprob_full(self, rng):
        from scipy.stats import multivariate_normal
        mean, cov, x = self._setup(rng)
        got = np.asarray(ops.gaussian_logprob(
            jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(x)))
        want = np.array([
            multivariate_normal.logpdf(x[:, i], mean[:, i], cov)
            for i in range(x.shape[1])])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)

    def test_logprob_diagonal(self, rng):
        from scipy.stats import multivariate_normal
        mean, _, x = self._setup(rng)
        cov = np.diag(rng.rand(4) + 0.5)
        got = np.asarray(ops.gaussian_logprob(
            jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(x), cov_type="diagonal"))
        want = np.array([
            multivariate_normal.logpdf(x[:, i], mean[:, i], cov)
            for i in range(x.shape[1])])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)

    def test_logprobgrad_is_grad_of_logprob(self, rng):
        mean, cov, x = self._setup(rng, n=3, s=1)
        grad = np.asarray(ops.gaussian_logprobgrad(
            jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(x)))
        f = lambda m: ops.gaussian_logprob(m, jnp.asarray(cov), jnp.asarray(x))[0]
        auto = np.asarray(jax.grad(f)(jnp.asarray(mean)))
        np.testing.assert_allclose(grad.T, auto, rtol=1e-3, atol=1e-3)

    def test_entropy(self, rng):
        from scipy.stats import multivariate_normal
        _, cov, _ = self._setup(rng)
        got = float(ops.gaussian_entropy(jnp.asarray(cov)))
        want = multivariate_normal(np.zeros(4), cov).entropy()
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_kl_self_is_zero(self, rng):
        mean, cov, _ = self._setup(rng, s=1)
        kl = np.asarray(ops.gaussian_kl(
            jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(mean), jnp.asarray(cov)))
        np.testing.assert_allclose(kl, 0.0, atol=1e-3)

    def test_kl_diagonal_closed_form(self, rng):
        d0 = rng.rand(3) + 0.5
        d1 = rng.rand(3) + 0.5
        m0 = rng.randn(3, 1)
        m1 = rng.randn(3, 1)
        got = float(ops.gaussian_kl(
            jnp.asarray(m0), jnp.asarray(np.diag(d0)),
            jnp.asarray(m1), jnp.asarray(np.diag(d1)), cov_type="diagonal")[0])
        want = 0.5 * (np.sum(d0 / d1) + np.sum((m1 - m0)[:, 0] ** 2 / d1)
                      - 3 + np.sum(np.log(d1)) - np.sum(np.log(d0)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestScaleCtrl:
    def test_clip(self):
        lows = jnp.array([-2.0, 0.0])
        highs = jnp.array([2.0, 4.0])
        ctrl = jnp.array([[3.0, -0.5], [-1.0, 0.25]])
        out = np.asarray(ops.scale_ctrl(ctrl, lows, highs))
        np.testing.assert_allclose(out, [[2.0, 1.0], [-2.0, 2.5]])

    def test_tanh_bounds(self, rng):
        lows = jnp.array([-1.0])
        highs = jnp.array([3.0])
        ctrl = jnp.asarray(rng.randn(100, 1) * 10)
        out = np.asarray(ops.scale_ctrl(ctrl, lows, highs, squash_fn="tanh"))
        assert out.min() >= -1.0 and out.max() <= 3.0

"""Controller-update parity vs the NumPy oracle at identical injected
noise/costs (SURVEY §4 build-plan item: controller parity vs a NumPy
re-implementation of the reference update equations)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import solvers
from mjmpc_tpu.oracle import numpy_ref
from mjmpc_tpu.ops import gamma_sequence
from mjmpc_tpu.rollout.engine import Trajectories
from mjmpc_tpu.solvers.base import GaussianState

N, H, DA = 32, 12, 3


def _traj(rng, mean):
    actions = mean[None] + rng.randn(N, H, DA) * 0.7
    costs = rng.rand(N, H) * 3.0
    zeros = np.zeros((N, H))
    return Trajectories(
        observations=jnp.zeros((N, H, 4)),
        actions=jnp.asarray(actions, jnp.float32),
        costs=jnp.asarray(costs, jnp.float32),
        dones=jnp.asarray(zeros, bool),
        next_observations=jnp.zeros((N, H, 4)),
        successes=jnp.asarray(zeros, bool),
    ), actions, costs


def _state(rng, cov_scale=0.5):
    mean = rng.randn(H, DA)
    cov = np.diag(rng.rand(DA) + cov_scale)
    return mean, cov, GaussianState(
        mean=jnp.asarray(mean, jnp.float32), cov=jnp.asarray(cov, jnp.float32),
        step=jnp.array(0, jnp.int32), key=jax.random.PRNGKey(0))


class TestMPPIParity:
    @pytest.mark.parametrize("alpha,tbw", [(1, False), (0, False), (1, True)])
    def test_update(self, rng, alpha, tbw):
        mean, cov, state = _state(rng)
        solver = solvers.MPPI(d_action=DA, horizon=H, num_particles=N,
                              gamma=0.98, lam=0.05, step_size=0.55,
                              alpha=alpha, time_based_weights=tbw)
        traj, actions, costs = _traj(rng, mean)
        got = np.asarray(solver.update(state, traj).mean)
        want = numpy_ref.mppi_update(mean, cov, actions, costs,
                                     gamma_sequence(0.98, H), 0.05, 0.55,
                                     alpha, tbw)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    def test_value(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.MPPI(d_action=DA, horizon=H, num_particles=N,
                              gamma=0.98, lam=0.05, alpha=0)
        traj, actions, costs = _traj(rng, mean)
        got = float(solver.value(state, traj))
        want = numpy_ref.mppi_calc_val(mean, cov, actions, costs,
                                       gamma_sequence(0.98, H), 0.05, 0)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestRandomShootingParity:
    def test_update(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.RandomShooting(d_action=DA, horizon=H,
                                        num_particles=N, gamma=0.95,
                                        step_size=0.7)
        traj, actions, costs = _traj(rng, mean)
        got = np.asarray(solver.update(state, traj).mean)
        want = numpy_ref.random_shooting_update(mean, actions, costs,
                                                gamma_sequence(0.95, H), 0.7)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCEMParity:
    @pytest.mark.parametrize("cov_type", ["diagonal", "full"])
    def test_update(self, rng, cov_type):
        mean, cov, state = _state(rng)
        if cov_type == "full":
            a = rng.randn(DA, DA) * 0.1
            cov = cov + a @ a.T
            state = state._replace(cov=jnp.asarray(cov, jnp.float32))
        solver = solvers.CEM(d_action=DA, horizon=H, num_particles=N,
                             gamma=1.0, step_size=0.6, elite_frac=0.25,
                             cov_type=cov_type)
        traj, actions, costs = _traj(rng, mean)
        new = solver.update(state, traj)
        want_mean, want_cov = numpy_ref.cem_update(
            mean, cov, actions, costs, gamma_sequence(1.0, H), 0.25, 0.6,
            cov_type)
        np.testing.assert_allclose(np.asarray(new.mean), want_mean,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new.cov), want_cov,
                                   rtol=1e-3, atol=1e-4)


class TestDMDParity:
    @pytest.mark.parametrize("cov_type,update_cov",
                             [("diagonal", True), ("full", True),
                              ("diagonal", False)])
    def test_update(self, rng, cov_type, update_cov):
        mean, cov, state = _state(rng)
        solver = solvers.DMDMPC(d_action=DA, horizon=H, num_particles=N,
                                gamma=0.99, lam=0.1, step_size=0.8,
                                cov_type=cov_type, update_cov=update_cov)
        traj, actions, costs = _traj(rng, mean)
        new = solver.update(state, traj)
        want_mean, want_cov = numpy_ref.dmd_update(
            mean, cov, actions, costs, gamma_sequence(0.99, H), 0.1, 0.8,
            update_cov, cov_type)
        np.testing.assert_allclose(np.asarray(new.mean), want_mean,
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(new.cov), want_cov,
                                   rtol=2e-3, atol=2e-4)


class TestPFMPCParity:
    def test_systematic_resample(self, rng):
        solver = solvers.PFMPC(d_action=DA, horizon=H, num_particles=N)
        samples = rng.randn(N, H, DA)
        w = rng.rand(N)
        w /= w.sum()
        r = 0.4 / N
        got = np.asarray(solver.systematic_resample(
            jnp.asarray(samples, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.float32(r)))
        want = numpy_ref.pf_systematic_resample(samples, w, r)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_resample_concentrates_on_heavy_particle(self):
        solver = solvers.PFMPC(d_action=1, horizon=2, num_particles=8)
        samples = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1) * jnp.ones((8, 2, 1))
        w = jnp.zeros(8).at[5].set(1.0)
        out = np.asarray(solver.systematic_resample(samples, w, jnp.float32(0.01)))
        np.testing.assert_allclose(out, 5.0)

    def test_update_and_shift_run(self, rng):
        solver = solvers.PFMPC(d_action=DA, horizon=H, num_particles=N,
                               lam=0.2, cov_shift=0.05, cov_resample=1.0,
                               base_action="repeat")
        state = solver.init_state(jax.random.PRNGKey(0))
        traj, _, _ = _traj(rng, np.zeros((H, DA)))
        state = solver.update(state, traj)
        np.testing.assert_allclose(
            np.asarray(state.mean),
            np.asarray(state.action_samples).mean(0), rtol=1e-5, atol=1e-6)
        shifted = solver.shift(state._replace(step=state.step + 1))
        assert shifted.action_samples.shape == (N, H, DA)


class TestMPPIQParity:
    @pytest.mark.parametrize("with_q", [False, True])
    def test_returns(self, rng, with_q):
        solver = solvers.MPPIQ(d_action=DA, horizon=H, num_particles=N,
                               gamma=0.97, td_lam=0.9, beta=0.1)
        costs = rng.rand(N, H)
        qvals = rng.rand(N, H) if with_q else None
        got = np.asarray(solver.calculate_returns(
            jnp.asarray(costs, jnp.float32),
            None if qvals is None else jnp.asarray(qvals, jnp.float32)))
        want = numpy_ref.mppiq_returns(costs, qvals, 0.97, 0.9, H)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_update_no_q_matches_oracle_weights(self, rng):
        """With q_fn=None and alpha=1, weights = softmax(-q_hat/beta)."""
        mean, cov, state = _state(rng)
        solver = solvers.MPPIQ(d_action=DA, horizon=H, num_particles=N,
                               gamma=0.97, td_lam=0.9, beta=0.1, alpha=1,
                               step_size=0.5, time_based_weights=True)
        traj, actions, costs = _traj(rng, mean)
        got = np.asarray(solver.update(state, traj).mean)
        q_hat = numpy_ref.mppiq_returns(costs, None, 0.97, 0.9, H)
        w = np.exp((-1.0 / 0.1) * (q_hat - q_hat.max(0)))
        w = w / w.sum(0)
        want = (1 - 0.5) * mean + 0.5 * np.einsum("nh,nhd->hd", w, actions)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestShiftSemantics:
    def test_null_shift(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.MPPI(d_action=DA, horizon=H, num_particles=N,
                              base_action="null")
        out = np.asarray(solver.shift(state).mean)
        np.testing.assert_allclose(out[:-1], mean[1:], rtol=1e-6)
        np.testing.assert_allclose(out[-1], 0.0)

    def test_repeat_shift(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.MPPI(d_action=DA, horizon=H, num_particles=N,
                              base_action="repeat")
        out = np.asarray(solver.shift(state).mean)
        np.testing.assert_allclose(out[-1], mean[-1], rtol=1e-6)

    def test_cem_shift_grows_cov(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.CEM(d_action=DA, horizon=H, num_particles=N,
                             beta=0.1, init_cov=2.0, base_action="null")
        out = solver.shift(state)
        np.testing.assert_allclose(np.asarray(out.cov),
                                   cov + 0.1 * np.diag([2.0] * DA), rtol=1e-5)

    def test_zero_control_seq(self, rng):
        mean, cov, state = _state(rng)
        solver = solvers.MPPI(d_action=DA, horizon=H, num_particles=N,
                              use_zero_control_seq=True)
        noise = np.asarray(solver.sample_noise(state))
        np.testing.assert_allclose(noise[-1], -mean, rtol=1e-5, atol=1e-6)


class TestRegistry:
    def test_make_solver(self):
        s = solvers.make_solver("mppi", d_action=2, horizon=4, num_particles=8)
        assert isinstance(s, solvers.MPPI)

    def test_unknown(self):
        with pytest.raises(ValueError):
            solvers.make_solver("ilqr_nope")

"""NumPy oracle: faithful host-side re-implementation of the reference
update equations, used ONLY in tests to validate the JAX solvers.

Each function re-states the math of the corresponding reference routine
(cited per function) in plain NumPy, including the reference's exact RNG
procedure (global np.random reseed + multivariate_normal) so that JAX
solver updates can be checked against identical injected noise.
"""
from __future__ import annotations

import numpy as np
import scipy.special


def generate_noise(cov, filter_coeffs, shape, base_seed):
    """Reference noise procedure (control_utils.py:24-34): reseed global
    NumPy, draw multivariate normal over (N, H), AR(2)-filter in place."""
    np.random.seed(base_seed)
    b0, b1, b2 = filter_coeffs
    d = cov.shape[0]
    eps = np.random.multivariate_normal(mean=np.zeros((d,)), cov=cov, size=shape)
    for i in range(2, eps.shape[1]):
        eps[:, i, :] = b0 * eps[:, i, :] + b1 * eps[:, i - 1, :] + b2 * eps[:, i - 2, :]
    return eps


def cost_to_go(cost_seq, gamma_seq):
    """Reference discounted cost-to-go (control_utils.py:37-46)."""
    if np.any(gamma_seq == 0):
        return cost_seq
    cost_seq = gamma_seq * cost_seq
    cost_seq = np.cumsum(cost_seq[:, ::-1], axis=-1)[:, ::-1]
    cost_seq /= gamma_seq
    return cost_seq


# ---------------------------------------------------------------------------
# Controller update rules. All take explicit (mean, cov, ...) state and the
# sampled actions/costs, and return the updated state — mirroring one
# _update_distribution call of the reference class cited.
# ---------------------------------------------------------------------------

def mppi_update(mean, cov, actions, costs, gamma_seq, lam, step_size, alpha,
                time_based_weights=False):
    """MPPI exponential-utility update (mppi.py:69-111)."""
    delta = actions - mean[None, :, :]
    traj_costs = cost_to_go(costs, gamma_seq)
    if not time_based_weights:
        traj_costs = traj_costs[:, 0]
    control_costs = _mppi_control_costs(mean, cov, delta, gamma_seq, alpha,
                                        time_based_weights)
    total_costs = traj_costs + lam * control_costs
    w = scipy.special.softmax((-1.0 / lam) * total_costs, axis=0)
    weighted_seq = w.T * actions.T
    new_mean = (1.0 - step_size) * mean + step_size * np.sum(weighted_seq.T, axis=0)
    return new_mean


def _mppi_control_costs(mean, cov, delta, gamma_seq, alpha, time_based_weights):
    """mppi.py:99-111."""
    if alpha == 1:
        if not time_based_weights:
            return np.zeros(delta.shape[0])
        return np.zeros((delta.shape[0], delta.shape[1]))
    u_normalized = mean.dot(np.linalg.inv(cov))[np.newaxis, :, :]
    control_costs = 0.5 * u_normalized * (mean[np.newaxis, :, :] + 2.0 * delta)
    control_costs = np.sum(control_costs, axis=-1)
    control_costs = cost_to_go(control_costs, gamma_seq)
    if not time_based_weights:
        control_costs = control_costs[:, 0]
    return control_costs


def mppi_calc_val(mean, cov, actions, costs, gamma_seq, lam, alpha):
    """MPPI free-energy value estimate (mppi.py:113-131)."""
    delta = actions - mean[None, :, :]
    traj_costs = cost_to_go(costs, gamma_seq)[:, 0]
    control_costs = _mppi_control_costs(mean, cov, delta, gamma_seq, alpha, False)
    total = traj_costs + lam * control_costs
    return -lam * scipy.special.logsumexp((-1.0 / lam) * total,
                                          b=(1.0 / total.shape[0]))


def random_shooting_update(mean, actions, costs, gamma_seq, step_size):
    """random_shooting.py:52-62."""
    Q = cost_to_go(costs, gamma_seq)
    best_id = np.argmin(Q, axis=0)[0]
    return (1.0 - step_size) * mean + step_size * actions[best_id]


def cem_update(mean, cov, actions, costs, gamma_seq, elite_frac, step_size,
               cov_type="diagonal"):
    """cem.py:65-86; elites reshaped to [H*n_elite, dA] before cov."""
    num_particles, horizon, d_action = actions.shape
    num_elite = int(num_particles * elite_frac)
    Q = cost_to_go(costs, gamma_seq)
    elite_ids = np.argsort(Q[:, 0], axis=-1)[0:num_elite]
    elite_actions = actions[elite_ids, :, :]
    elite_deltas = (actions - mean[None, :, :])[elite_ids, :, :]
    elite_deltas = elite_deltas.reshape(horizon * num_elite, d_action)
    if cov_type == "diagonal":
        cov_update = np.diag(np.var(elite_deltas, axis=0))
    else:
        cov_update = np.cov(elite_deltas, rowvar=False)
    new_cov = (1.0 - step_size) * cov + step_size * cov_update
    new_mean = (1.0 - step_size) * mean + step_size * np.mean(elite_actions, axis=0)
    return new_mean, new_cov


def dmd_update(mean, cov, actions, costs, gamma_seq, lam, step_size,
               update_cov=False, cov_type="diagonal"):
    """gaussian_dmd.py:65-104."""
    num_particles, horizon, d_action = actions.shape
    delta = actions - mean[None, :, :]
    traj_costs = cost_to_go(costs, gamma_seq)[:, 0]
    w = scipy.special.softmax((-1.0 / lam) * traj_costs)
    new_cov = cov
    if update_cov:
        if cov_type == "diagonal":
            weighted_delta = w * (delta ** 2).T
            cov_update = np.diag(np.mean(np.sum(weighted_delta.T, axis=0), axis=0))
        else:
            weighted_delta = np.sqrt(w) * delta.T
            weighted_delta = weighted_delta.T.reshape((horizon * num_particles, d_action))
            cov_update = np.dot(weighted_delta.T, weighted_delta) / horizon
        new_cov = (1.0 - step_size) * cov + step_size * cov_update
    weighted_seq = w * actions.T
    new_mean = (1.0 - step_size) * mean + step_size * np.sum(weighted_seq.T, axis=0)
    return new_mean, new_cov


def pf_systematic_resample(act_seq, weights, r):
    """Low-variance systematic resampling, sequential-walk form
    (particle_filter_controller.py:159-174). `r` in [0, 1/M)."""
    M = act_seq.shape[0]
    out = np.zeros_like(act_seq)
    c = 0.0
    i = 0
    for m in range(M):
        u = r + m * 1.0 / M
        while c < u and i < M:
            c += weights[i]
            i += 1
        out[m] = act_seq[i - 1]
    return out


def mppiq_update(mean, cov, actions, costs, gamma, td_lam, beta,
                 step_size, alpha, time_based_weights=True):
    """MPPIQ distribution update (mppiq.py:73-89): per-step control
    costs, TD(lambda) blended returns, time-based softmax weights."""
    horizon = mean.shape[0]
    delta = actions - mean[None, :, :]
    if alpha == 1:
        control_costs = np.zeros(costs.shape)
    else:
        u_normalized = mean.dot(np.linalg.inv(cov))[np.newaxis, :, :]
        control_costs = 0.5 * u_normalized * (mean[np.newaxis, :, :]
                                              + 2.0 * delta)
        control_costs = np.sum(control_costs, axis=-1)
    total = costs + beta * control_costs
    q_hat = mppiq_returns(total, None, gamma, td_lam, horizon)
    if not time_based_weights:
        q_hat = q_hat[:, 0]
    w = scipy.special.softmax((-1.0 / beta) * q_hat, axis=0)
    if time_based_weights:
        weighted = np.einsum("nh,nhd->hd", w, actions)
    else:
        weighted = np.einsum("n,nhd->hd", w, actions)
    return (1.0 - step_size) * mean + step_size * weighted


def mppiq_returns(costs, qvals, gamma, td_lam, horizon):
    """TD(lambda) blended returns (mppiq.py:104-126)."""
    if qvals is None:
        qvals = np.zeros(costs.shape)
        qvals[:, -1] = costs[:, -1]
    td_errors = costs[:, 0:-1] + gamma * qvals[:, 1:] - qvals[:, 0:-1]
    if horizon == 1:
        weight_seq = np.array([1.0])
    else:
        weight_seq = np.cumprod([1.0] + [gamma * td_lam] * (horizon - 2)).reshape(1, horizon - 1)
    q_lam_minus_q = cost_to_go(td_errors, weight_seq)
    q_lam = qvals[:, 0:-1] + td_lam * q_lam_minus_q
    q_lam = np.hstack([q_lam, qvals[:, [-1]]])
    return q_lam

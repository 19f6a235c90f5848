"""MPPI with Q-function estimates: TD(lambda)-blended returns.

The value-function-blending controller of the ICLR'21 paper ("Blending MPC
& Value Function Approximation..."). Math matches reference
mjmpc/control/mppiq.py:73-160: per-step control costs, blended returns
q_lam = q + lam * ctg(td_errors, (gamma*lam)^t), time-based softmax
weights. Q estimates come from an injected q_fn applied on device to the
rollout observations (the reference got `trajectories["qvals"]` from its
rollout function).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..envs.base import Env
from ..rollout.engine import Trajectories, rollout_open_loop
from .base import GaussianMPC, GaussianState


@dataclasses.dataclass(frozen=True)
class MPPIQ(GaussianMPC):
    beta: float = 1.0     # temperature (reference uses beta, not lam)
    td_lam: float = 1.0
    alpha: int = 0
    time_based_weights: bool = True
    # q_fn(observations [.., d_obs], actions [.., d_action]) -> qvals [..]
    q_fn: Optional[Callable] = None

    @property
    def uses_observations(self) -> bool:
        """A plugged Q function reads rollout observations, which the
        costs-only fused rollout does not produce."""
        return self.q_fn is not None

    def calculate_returns(self, costs, qvals) -> jax.Array:
        """TD(lambda) blended returns (mppiq.py:104-126)."""
        if qvals is None:
            qvals = jnp.zeros_like(costs)
            qvals = qvals.at[:, -1].set(costs[:, -1])
        if self.horizon == 1:
            # no TD errors at H=1: the blended return IS the terminal
            # q estimate (= the terminal cost when no Q is plugged in)
            return qvals
        td_errors = costs[:, :-1] + self.gamma * qvals[:, 1:] - qvals[:, :-1]
        weight_seq = np.cumprod(
            [1.0] + [self.gamma * self.td_lam] * (self.horizon - 2)
        ).reshape(1, self.horizon - 1)
        q_lam_minus_q = ops.cost_to_go(td_errors, weight_seq)
        q_lam = qvals[:, :-1] + self.td_lam * q_lam_minus_q
        return jnp.concatenate([q_lam, qvals[:, -1:]], axis=1)

    def _control_costs(self, state: GaussianState, delta: jax.Array) -> jax.Array:
        """Per-step (undiscounted) control costs (mppiq.py:128-136)."""
        if self.alpha == 1:
            return jnp.zeros((delta.shape[0], delta.shape[1]), delta.dtype)
        u_normalized = (state.mean @ jnp.linalg.inv(state.cov))[None, :, :]
        cc = 0.5 * u_normalized * (state.mean[None, :, :] + 2.0 * delta)
        return jnp.sum(cc, axis=-1)

    def _qvals(self, traj: Trajectories) -> Optional[jax.Array]:
        if self.q_fn is None:
            return None
        return self.q_fn(traj.observations, traj.actions)

    def _exp_util(self, state, costs, qvals, delta) -> jax.Array:
        total = costs + self.beta * self._control_costs(state, delta)
        q_hat = self.calculate_returns(total, qvals)
        if not self.time_based_weights:
            q_hat = q_hat[:, 0]
        return jax.nn.softmax((-1.0 / self.beta) * q_hat, axis=0)

    def update(self, state: GaussianState, traj: Trajectories) -> GaussianState:
        """mppiq.py:73-89."""
        delta = traj.actions - state.mean[None, :, :]
        w = self._exp_util(state, traj.costs, self._qvals(traj), delta)
        if self.time_based_weights:
            weighted = jnp.einsum("nh,nhd->hd", w, traj.actions)
        else:
            weighted = jnp.einsum("n,nhd->hd", w, traj.actions)
        return state._replace(mean=self._interp_mean(state.mean, weighted))

    def value(self, state: GaussianState, traj: Trajectories) -> jax.Array:
        """Blended free energy (mppiq.py:138-160)."""
        delta = traj.actions - state.mean[None, :, :]
        total = traj.costs + self.beta * self._control_costs(state, delta)
        q_hat = self.calculate_returns(total, self._qvals(traj))[:, 0]
        n = q_hat.shape[0]
        return -self.beta * (jax.scipy.special.logsumexp(
            (-1.0 / self.beta) * q_hat) - jnp.log(jnp.float32(n)))

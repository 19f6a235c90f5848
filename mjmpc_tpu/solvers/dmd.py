"""Dynamic Mirror Descent MPC with Gaussian sampling (Wagener et al. 2019).

Math matches reference mjmpc/control/gaussian_dmd.py:65-139: exponentiated-
utility weights, optional covariance adaptation (diagonal second moment or
full sqrt-weighted outer product / H), beta*I covariance growth on shift,
free-energy value estimate.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import ops
from ..rollout.engine import Trajectories
from .base import GaussianMPC, GaussianState


@dataclasses.dataclass(frozen=True)
class DMDMPC(GaussianMPC):
    lam: float = 1.0
    beta: float = 0.0
    update_cov: bool = False

    def _exp_util(self, costs) -> jax.Array:
        traj_costs = ops.cost_to_go(costs, self.gamma_seq)[:, 0]
        return jax.nn.softmax((-1.0 / self.lam) * traj_costs)

    def update(self, state: GaussianState, traj: Trajectories) -> GaussianState:
        delta = traj.actions - state.mean[None, :, :]
        w = self._exp_util(traj.costs)

        new_cov = state.cov
        if self.update_cov:
            if self.cov_type == "diagonal":
                # diag(mean_t sum_i w_i delta^2) (gaussian_dmd.py:76-78)
                second_moment = jnp.einsum("n,nhd->hd", w, delta ** 2)
                cov_update = jnp.diag(jnp.mean(second_moment, axis=0))
            elif self.cov_type == "full":
                # (sqrt(w) delta)^T (sqrt(w) delta) / H (gaussian_dmd.py:79-83)
                wd = jnp.sqrt(w)[:, None, None] * delta
                flat = wd.reshape(self.num_particles * self.horizon, self.d_action)
                cov_update = flat.T @ flat / self.horizon
            else:
                raise ValueError(f"unknown cov_type {self.cov_type!r}")
            new_cov = (1.0 - self.step_size) * state.cov + self.step_size * cov_update

        weighted = jnp.einsum("n,nhd->hd", w, traj.actions)
        return state._replace(mean=self._interp_mean(state.mean, weighted),
                              cov=new_cov)

    def shift(self, state: GaussianState) -> GaussianState:
        """Shift mean; grow cov by beta*I when adapting (gaussian_dmd.py:106-116)."""
        state = super().shift(state)
        if self.update_cov:
            state = state._replace(
                cov=state.cov + self.beta * jnp.eye(self.d_action))
        return state

    def value(self, state: GaussianState, traj: Trajectories):
        """Free energy (gaussian_dmd.py:126-139)."""
        traj_costs = ops.cost_to_go(traj.costs, self.gamma_seq)[:, 0]
        n = traj_costs.shape[0]
        return -self.lam * (jax.scipy.special.logsumexp(
            (-1.0 / self.lam) * traj_costs) - jnp.log(jnp.float32(n)))

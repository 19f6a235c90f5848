"""Cross-Entropy Method MPC.

Math matches reference mjmpc/control/cem.py:65-113: elite selection by
cost-to-go argsort, step-size-blended mean/covariance updates (diagonal
variance or full action-dim covariance over elites reshaped to
[H*n_elite, dA]), covariance growth by beta*diag(init_cov) on shift.

The elite top-k is a jax.lax.top_k over the particle axis — under pjit
this lowers to a sharded top-k + all-gather of candidates.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import ops
from ..rollout.engine import Trajectories
from .base import GaussianMPC, GaussianState


@dataclasses.dataclass(frozen=True)
class CEM(GaussianMPC):
    elite_frac: float = 0.1
    beta: float = 0.0   # covariance growth on shift (cem.py:89-95)

    @property
    def num_elite(self) -> int:
        # floor at 1: int(N * frac) == 0 for small N would select an
        # empty elite set whose mean/var are NaN (silent under jit)
        return max(1, int(self.num_particles * self.elite_frac))

    def update(self, state: GaussianState, traj: Trajectories) -> GaussianState:
        q = ops.cost_to_go(traj.costs, self.gamma_seq)[:, 0]
        # lowest-cost elites: top_k of negated costs (== argsort[:k])
        _, elite_ids = jax.lax.top_k(-q, self.num_elite)
        elite_actions = traj.actions[elite_ids]                  # [k, H, dA]
        elite_deltas = elite_actions - state.mean[None, :, :]
        flat = elite_deltas.reshape(self.horizon * self.num_elite, self.d_action)
        if self.cov_type == "diagonal":
            cov_update = jnp.diag(jnp.var(flat, axis=0))
        elif self.cov_type == "full":
            # np.cov semantics: unbiased (ddof=1) covariance of rows.
            centered = flat - jnp.mean(flat, axis=0, keepdims=True)
            cov_update = centered.T @ centered / (flat.shape[0] - 1)
        else:
            raise ValueError(f"unknown cov_type {self.cov_type!r}")
        new_cov = (1.0 - self.step_size) * state.cov + self.step_size * cov_update
        new_mean = self._interp_mean(state.mean, jnp.mean(elite_actions, axis=0))
        return state._replace(mean=new_mean, cov=new_cov)

    def shift(self, state: GaussianState) -> GaussianState:
        """Shift mean and grow covariance (cem.py:89-95)."""
        state = super().shift(state)
        return state._replace(
            cov=state.cov + self.beta * jnp.diag(jnp.asarray(self.init_cov_diag)))

    def value(self, state: GaussianState, traj: Trajectories):
        """Average cost-to-go (cem.py:107-113)."""
        return jnp.mean(ops.cost_to_go(traj.costs, self.gamma_seq)[:, 0])

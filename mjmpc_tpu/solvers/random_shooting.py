"""Naive random-shooting MPC.

Math matches reference mjmpc/control/random_shooting.py:52-69: step-size
interpolation of the mean toward the lowest cost-to-go action sequence.
The argmin reduces over the (shardable) particle axis.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import ops
from ..rollout.engine import Trajectories
from .base import GaussianMPC, GaussianState


@dataclasses.dataclass(frozen=True)
class RandomShooting(GaussianMPC):
    def update(self, state: GaussianState, traj: Trajectories) -> GaussianState:
        q = ops.cost_to_go(traj.costs, self.gamma_seq)
        best_id = jnp.argmin(q[:, 0], axis=0)
        return state._replace(
            mean=self._interp_mean(state.mean, traj.actions[best_id]))

    def value(self, state: GaussianState, traj: Trajectories):
        """Average cost-to-go (random_shooting.py:65-69)."""
        return jnp.mean(ops.cost_to_go(traj.costs, self.gamma_seq)[:, 0])

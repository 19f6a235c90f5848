"""Random shooting over a learned NN policy.

Reference mjmpc/control/random_shooting_nn.py (+ its CLMPC base,
clmpc.py:81-129): particles roll out a neural policy perturbed by
filtered action noise (through the shared-memory TorchModelVecEnv pool);
the update keeps the best rollout's action sequence, step-size-blended
into the open-loop mean; the executed action is mean[0].

Here the policy is a pure-function MLP whose params live in the solver
state, the rollout is the fused closed-loop scan, and the whole solve is
one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..envs.base import Env
from ..models.mlp import MLPPolicy
from ..rollout.engine import Trajectories, rollout_closed_loop_policy

from .base import _fold  # single RNG-derivation point

_TAG_ROLLOUT = 40


class RSNNState(NamedTuple):
    mean: jax.Array          # [H, dA] best-rollout blended action sequence
    policy_params: Any       # MLP pytree
    step: jax.Array
    key: jax.Array



@dataclasses.dataclass(frozen=True)
class RandomShootingNN:
    d_obs: int
    d_action: int
    horizon: int
    num_particles: int
    hidden: Tuple[int, ...] = (64, 64)
    gamma: float = 1.0
    n_iters: int = 1
    step_size: float = 1.0
    init_cov: float = 0.5
    filter_coeffs: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    sample_mode: str = "mean"
    action_lows: Optional[np.ndarray] = None
    action_highs: Optional[np.ndarray] = None

    @property
    def gamma_seq(self) -> np.ndarray:
        return ops.gamma_sequence(self.gamma, self.horizon)

    @property
    def policy(self) -> MLPPolicy:
        return MLPPolicy(self.d_obs, self.d_action, self.hidden)

    def init_state(self, key: jax.Array) -> RSNNState:
        pkey, skey = jax.random.split(key)
        return RSNNState(
            mean=jnp.zeros((self.horizon, self.d_action), jnp.float32),
            policy_params=self.policy.init_params(pkey),
            step=jnp.array(0, jnp.int32), key=skey)

    def sample_noise(self, state: RSNNState) -> jax.Array:
        key = _fold(state.key, _TAG_ROLLOUT, state.step)
        cov = jnp.diag(jnp.full((self.d_action,), self.init_cov))
        return ops.filtered_noise(key, cov,
                                  (self.num_particles, self.horizon),
                                  self.filter_coeffs)

    def update(self, state: RSNNState, traj: Trajectories) -> RSNNState:
        """Best-rollout action sequence blended into the mean
        (clmpc.py:106-129 / random_shooting_nn.py:105-129)."""
        ctg = ops.cost_to_go(traj.costs, self.gamma_seq)[:, 0]
        best = jnp.argmin(ctg)
        target = traj.actions[best]
        mean = (1.0 - self.step_size) * state.mean + self.step_size * target
        return state._replace(mean=mean)

    def act(self, state: RSNNState) -> jax.Array:
        return state.mean[0]


def build_solve_fn(solver: RandomShootingNN, env: Env, shard_particles=None):
    shard = shard_particles or (lambda x: x)
    policy = solver.policy

    def solve(env_params, env_state, state: RSNNState):
        s = state
        for _ in range(solver.n_iters):
            noise = shard(solver.sample_noise(s))
            traj = rollout_closed_loop_policy(
                env, env_params, env_state,
                lambda obs: policy(s.policy_params, obs), noise)
            s = solver.update(s, traj)
        action = solver.act(s)
        s = s._replace(step=s.step + 1,
                       mean=jnp.roll(s.mean, -1, axis=0).at[-1].set(0.0))
        return action, jnp.float32(0.0), s

    return solve

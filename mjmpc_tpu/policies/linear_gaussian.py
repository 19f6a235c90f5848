"""Linear-Gaussian policy as a pure-function module.

Reference mjmpc/policies/linear_gaussian_policy.py:11-148 (torch
nn.Linear mean + learnable per-dim log_std, zero-init). Here the policy
is a params pytree + pure functions, so it jits into rollouts and its
"shared-memory parameter broadcast" (torch_model_vec_env.py:112-113)
becomes just passing the pytree into the sharded solve.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LGPolicyParams(NamedTuple):
    weight: jax.Array    # [d_obs, d_action]
    bias: jax.Array      # [d_action]
    log_std: jax.Array   # [d_action]


@dataclasses.dataclass(frozen=True)
class LinearGaussianPolicy:
    d_obs: int
    d_action: int
    min_log_std: float = -3.0
    init_log_std: float = 0.0

    def init_params(self) -> LGPolicyParams:
        """Zero-init mean, init_log_std stds (reference :22-28)."""
        return LGPolicyParams(
            weight=jnp.zeros((self.d_obs, self.d_action), jnp.float32),
            bias=jnp.zeros((self.d_action,), jnp.float32),
            log_std=jnp.full((self.d_action,), self.init_log_std, jnp.float32))

    def mean(self, params: LGPolicyParams, obs: jax.Array) -> jax.Array:
        return obs @ params.weight + params.bias

    def get_action(self, params: LGPolicyParams, obs: jax.Array,
                   mode: str = "sample",
                   white_noise: Optional[jax.Array] = None,
                   key: Optional[jax.Array] = None):
        """action + info dict (reference get_action :59-77)."""
        mean = self.mean(params, obs)
        std = jnp.exp(params.log_std)
        if mode == "mean":
            action = mean
        elif mode == "sample":
            if white_noise is None:
                white_noise = jax.random.normal(key, mean.shape)
            action = mean + std * white_noise
        else:
            raise ValueError(f"unknown mode {mode!r}")
        log_prob = self.log_prob(params, obs, action)
        return action, dict(mean=mean, log_std=params.log_std,
                            evaluation=mean, log_prob=log_prob)

    def log_prob(self, params: LGPolicyParams, obs: jax.Array,
                 actions: jax.Array) -> jax.Array:
        """Per-dimension diagonal-Gaussian log prob (reference :79-84)."""
        mean = self.mean(params, obs)
        var = jnp.exp(2.0 * params.log_std)
        return (-0.5 * (actions - mean) ** 2 / var
                - params.log_std - 0.5 * jnp.log(2.0 * jnp.pi))

    def entropy(self, params: LGPolicyParams) -> jax.Array:
        return jnp.sum(params.log_std + 0.5 * (1.0 + jnp.log(2.0 * jnp.pi)))

    def clamp_cov(self, params: LGPolicyParams) -> LGPolicyParams:
        """log_std >= min_log_std (reference clamp_cov :96-97)."""
        return params._replace(
            log_std=jnp.maximum(params.log_std, self.min_log_std))

    def grow_cov(self, params: LGPolicyParams, beta: float) -> LGPolicyParams:
        return params._replace(log_std=params.log_std + beta)

    def as_rollout_weights(self, params: LGPolicyParams) -> jax.Array:
        """[d_obs+1, d_action] matrix for the closed-loop-linear rollout
        (u = W.T [obs; 1]; rollout/engine.rollout_closed_loop_linear)."""
        return jnp.concatenate([params.weight, params.bias[None, :]], axis=0)

    @staticmethod
    def from_rollout_weights(w: jax.Array,
                             log_std: jax.Array) -> LGPolicyParams:
        return LGPolicyParams(weight=w[:-1], bias=w[-1], log_std=log_std)

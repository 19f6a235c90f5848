"""Uniform random policy (reference mjmpc/policies/random_policy.py:13-24)."""
from __future__ import annotations

import jax
import numpy as np

from ..envs.base import Env
from .base import Policy


class RandomPolicy(Policy):
    def __init__(self, env: Env, seed: int = 0):
        self.env = env
        self.reset(seed)

    def reset(self, seed=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)

    def _draw(self, shape):
        self._key, sub = jax.random.split(self._key)
        lows = np.asarray(self.env.action_lows, np.float32)
        highs = np.asarray(self.env.action_highs, np.float32)
        return np.asarray(jax.random.uniform(
            sub, shape + (self.env.d_action,), np.float32, lows, highs))

    def get_action(self, env_state=None):
        return self._draw(())

    def get_action_seq(self, env_state=None, horizon: int = 1):
        return self._draw((horizon,))

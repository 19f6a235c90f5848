"""Plain MLP policy (the NN the reference's closed-loop controllers roll
out through TorchModelVecEnv — e.g. a SAC actor mean network)."""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class MLPLayerParams(NamedTuple):
    weight: jax.Array
    bias: jax.Array


@dataclasses.dataclass(frozen=True)
class MLPPolicy:
    d_obs: int
    d_action: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "tanh"
    squash: bool = True      # tanh-squash outputs into [-1, 1]

    def _dims(self):
        sizes = [self.d_obs, *self.hidden, self.d_action]
        return list(zip(sizes[:-1], sizes[1:]))

    def init_params(self, key: jax.Array) -> List[MLPLayerParams]:
        params = []
        for (n_in, n_out) in self._dims():
            key, sub = jax.random.split(key)
            lim = float(np.sqrt(6.0 / (n_in + n_out)))
            params.append(MLPLayerParams(
                weight=jax.random.uniform(sub, (n_in, n_out), jnp.float32,
                                          -lim, lim),
                bias=jnp.zeros((n_out,), jnp.float32)))
        return params

    def __call__(self, params, obs: jax.Array) -> jax.Array:
        from .ensemble import _activation
        act = _activation(self.activation)
        h = obs
        for i, lyr in enumerate(params):
            h = h @ lyr.weight + lyr.bias
            if i < len(params) - 1:
                h = act(h)
        return jnp.tanh(h) if self.squash else h

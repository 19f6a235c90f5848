"""Batched-ensemble MLP (reference mjmpc/utils/ensemble_model.py:14-100).

The reference runs E independent MLPs in one torch.baddbmm per layer; here
the ensemble dimension is a leading axis on every weight ([E, in, out])
contracted with einsum — exactly the layout the MXU wants (one batched
matmul per layer), and trivially shardable over the mesh (ensemble members
are independent: PartitionSpec on the E axis).
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class EnsembleLayerParams(NamedTuple):
    weight: jax.Array  # [E, n_in, n_out]
    bias: jax.Array    # [E, 1, n_out]


def _activation(name: str):
    if name == "swish":
        return jax.nn.swish
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "tanh":
        return jnp.tanh
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unknown non_linearity {name!r}")


def _init_weight(key, shape, non_linearity):
    fan_in, fan_out = shape[1], shape[2]
    if non_linearity in ("swish", "tanh"):
        # xavier uniform
        lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(key, shape, jnp.float32, -lim, lim)
    if non_linearity in ("relu", "leaky_relu"):
        # kaiming normal
        std = float(np.sqrt(2.0 / fan_in))
        return std * jax.random.normal(key, shape, jnp.float32)
    # linear: xavier normal
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(key, shape, jnp.float32)


@dataclasses.dataclass(frozen=True)
class EnsembleMLP:
    d_in: int
    d_out: int
    n_hidden: int
    n_layers: int
    ensemble_size: int
    non_linearity: str = "leaky_relu"

    def __post_init__(self):
        if self.n_layers < 2:
            raise ValueError("minimum depth of model is 2")

    def _layer_dims(self):
        dims = []
        for i in range(self.n_layers + 1):
            n_in = self.d_in if i == 0 else self.n_hidden
            n_out = self.d_out if i == self.n_layers else self.n_hidden
            act = "linear" if i == self.n_layers else self.non_linearity
            dims.append((n_in, n_out, act))
        return dims

    def init_params(self, key: jax.Array) -> List[EnsembleLayerParams]:
        params = []
        for (n_in, n_out, act) in self._layer_dims():
            key, sub = jax.random.split(key)
            params.append(EnsembleLayerParams(
                weight=_init_weight(sub, (self.ensemble_size, n_in, n_out),
                                    act),
                bias=jnp.zeros((self.ensemble_size, 1, n_out), jnp.float32)))
        return params

    def __call__(self, params: Sequence[EnsembleLayerParams],
                 x: jax.Array) -> jax.Array:
        """x: [E, B, d_in] -> [E, B, d_out] (one batched matmul/layer)."""
        for (_, _, act), lyr in zip(self._layer_dims(), params):
            x = jnp.einsum("ebi,eio->ebo", x, lyr.weight,
                           preferred_element_type=jnp.float32) + lyr.bias
            x = _activation(act)(x)
        return x


def init_ensemble(key: jax.Array, d_in: int, d_out: int, n_hidden: int,
                  n_layers: int, ensemble_size: int,
                  non_linearity: str = "leaky_relu"):
    model = EnsembleMLP(d_in, d_out, n_hidden, n_layers, ensemble_size,
                        non_linearity)
    return model, model.init_params(key)

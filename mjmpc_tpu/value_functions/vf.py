"""Least-squares value-function baselines as pure JAX.

Reference semantics preserved (mjmpc/value_functions/*):
- LinearVF  (linear_val_func.py:21-58): features = obs ⊕ normalized
  timestep (t+1)/H, plus bias column; one global weight vector.
- QuadraticVF (quadratic_val_func.py:8-67): obs ⊕ upper-triangular
  obs_i*obs_j products ⊕ time, plus bias.
- LinearTimeVaryingVF / QuadraticTimeVaryingVF
  (quadratic_time_varying_val_func.py:12-78): independent weights per
  horizon step, fit with a batched solve over the horizon dimension.
- fit: regularized normal equations; on NaN result the regularization is
  escalated x10 and the solve retried, up to 10 times
  (linear_val_func.py:48-56) — here a lax.while_loop so the whole fit
  stays on device.

A VF is a frozen spec (feature map + fit axis) with params as an explicit
pytree {weights, bias}: predict(params, obs) -> values, and
fit(params, obs, returns, delta_reg) -> (params, err_before, err_after).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VFParams(NamedTuple):
    weights: jax.Array  # [d_feat] or [H, d_feat]
    bias: jax.Array     # [] or [H]


def _tri_indices(d: int):
    return np.triu_indices(d)


def _linear_features(obs: jax.Array, horizon: int) -> jax.Array:
    """obs [N, H, dO] -> [N, H, dO+1]: obs ⊕ (t+1)/H."""
    n, h = obs.shape[0], obs.shape[1]
    t = (jnp.arange(1, h + 1, dtype=obs.dtype) / horizon)
    tcol = jnp.broadcast_to(t[None, :, None], (n, h, 1))
    return jnp.concatenate([obs, tcol], axis=-1)


def _quadratic_features(obs: jax.Array, horizon: int) -> jax.Array:
    """obs ⊕ upper-tri obs_i obs_j ⊕ time (quadratic_val_func.py:23-43)."""
    d = obs.shape[-1]
    iu, ju = _tri_indices(d)
    quad = obs[..., iu] * obs[..., ju]
    n, h = obs.shape[0], obs.shape[1]
    t = (jnp.arange(1, h + 1, dtype=obs.dtype) / horizon)
    tcol = jnp.broadcast_to(t[None, :, None], (n, h, 1))
    return jnp.concatenate([obs, quad, tcol], axis=-1)


def _tv_linear_features(obs: jax.Array, horizon: int) -> jax.Array:
    """Time-varying VFs carry no time feature — time is the batch dim."""
    return obs


def _tv_quadratic_features(obs: jax.Array, horizon: int) -> jax.Array:
    d = obs.shape[-1]
    iu, ju = _tri_indices(d)
    return jnp.concatenate([obs, obs[..., iu] * obs[..., ju]], axis=-1)


def _solve_retry(gram: jax.Array, moment: jax.Array, delta_reg: jax.Array,
                 eye: jax.Array):
    """Regularized solve with NaN-retry escalation (x10, up to 10 tries)."""
    def attempt(reg):
        return jnp.linalg.solve(gram + reg * eye, moment)

    def cond(carry):
        i, reg, x = carry
        return (i < 10) & jnp.any(~jnp.isfinite(x))

    def body(carry):
        i, reg, _ = carry
        reg = jnp.where(reg == 0.0, 1e-8, reg * 10.0)
        return i + 1, reg, attempt(reg)

    x0 = attempt(delta_reg)
    _, _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), delta_reg, x0))
    return x


@dataclasses.dataclass(frozen=True)
class ValueFunction:
    """A baseline spec: feature map + whether weights vary with time."""
    name: str
    d_obs: int
    horizon: int
    feature_fn: Callable
    time_varying: bool

    @property
    def d_feat(self) -> int:
        probe = jnp.zeros((1, self.horizon, self.d_obs))
        return int(self.feature_fn(probe, self.horizon).shape[-1])

    def init_params(self) -> VFParams:
        if self.time_varying:
            return VFParams(weights=jnp.zeros((self.horizon, self.d_feat)),
                            bias=jnp.zeros((self.horizon,)))
        return VFParams(weights=jnp.zeros((self.d_feat,)),
                        bias=jnp.zeros(()))

    def predict(self, params: VFParams, obs: jax.Array) -> jax.Array:
        """obs [N, H, dO] -> values [N, H]."""
        feat = self.feature_fn(obs, self.horizon)
        if self.time_varying:
            return jnp.einsum("nhf,hf->nh", feat, params.weights) + params.bias
        return feat @ params.weights + params.bias

    def fit(self, params: VFParams, obs: jax.Array, returns: jax.Array,
            delta_reg: float = 0.0, return_errors: bool = False):
        """Closed-form regularized LSQ (reference fit methods)."""
        feat = self.feature_fn(obs, self.horizon)
        ones = jnp.ones(feat.shape[:-1] + (1,), feat.dtype)
        feat = jnp.concatenate([feat, ones], axis=-1)  # bias column
        reg = jnp.asarray(delta_reg, feat.dtype)
        d = feat.shape[-1]
        eye = jnp.eye(d, dtype=feat.dtype)

        if return_errors:
            pred = self.predict(params, obs)
            err_before = (jnp.sum((returns - pred) ** 2)
                          / jnp.sum(returns ** 2))

        if self.time_varying:
            # horizon as batch dim (quadratic_time_varying_val_func.py:61-78)
            f = jnp.swapaxes(feat, 0, 1)            # [H, N, d]
            r = jnp.swapaxes(returns, 0, 1)         # [H, N]
            gram = jnp.einsum("hnf,hng->hfg", f, f)
            moment = jnp.einsum("hnf,hn->hf", f, r)
            x = jax.vmap(_solve_retry, in_axes=(0, 0, None, None))(
                gram, moment, reg, eye)
            new = VFParams(weights=x[:, :-1], bias=x[:, -1])
        else:
            f = feat.reshape(-1, d)
            r = returns.reshape(-1)
            x = _solve_retry(f.T @ f, f.T @ r, reg, eye)
            new = VFParams(weights=x[:-1], bias=x[-1])

        if return_errors:
            pred = self.predict(new, obs)
            err_after = (jnp.sum((returns - pred) ** 2)
                         / jnp.sum(returns ** 2))
            return new, err_before, err_after
        return new


_FEATURES = {
    "linear": (_linear_features, False),
    "quadratic": (_quadratic_features, False),
    "linear_time_varying": (_tv_linear_features, True),
    "time_varying_linear": (_tv_linear_features, True),
    "quadratic_time_varying": (_tv_quadratic_features, True),
    "time_varying_quadratic": (_tv_quadratic_features, True),
}

REGISTRY = sorted(set(_FEATURES))


def make_vf(kind: str, d_obs: int, horizon: int) -> ValueFunction:
    if kind not in _FEATURES:
        raise ValueError(f"unknown baseline {kind!r}; known: {REGISTRY}")
    fn, tv = _FEATURES[kind]
    return ValueFunction(name=kind, d_obs=d_obs, horizon=horizon,
                         feature_fn=fn, time_varying=tv)

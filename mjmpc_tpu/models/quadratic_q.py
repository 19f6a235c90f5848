"""Quadratic Q-function with Cholesky-parameterized PSD curvature.

Reference mjmpc/control/softqmpc/models/simple_quadratic_model.py:
Q(s, a) = 0.5 zᵀ P z + Jᵀ z + c with z = [s; a], P = L Lᵀ (lower-tri L
packed as a vector). Because P is PSD, Q is convex in a and induces a
closed-form conditional action Gaussian (the soft-Q policy):
    μ(s) = Paa⁻¹ (−Ja − Pas s),   Σ = λ Paa⁻¹
(get_act_mean_sigma, simple_quadratic_model.py:80-124), plus grow_cov in
moment space (:126-139).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QuadraticQParams(NamedTuple):
    l_packed: jax.Array   # [d_total*(d_total+1)/2] lower-tri entries of L
    j: jax.Array          # [d_total]
    c: jax.Array          # []


@dataclasses.dataclass(frozen=True)
class QuadraticQFunc:
    d_obs: int
    d_action: int
    jitter: float = 1e-6   # PSD guard when inverting Paa

    @property
    def d_total(self) -> int:
        return self.d_obs + self.d_action

    @property
    def _tril(self):
        return np.tril_indices(self.d_total)

    def init_params(self, key: jax.Array) -> QuadraticQParams:
        """L, J ~ N(0, 1), c = 0 (reference :20-28)."""
        kl, kj = jax.random.split(key)
        d_l = self.d_total * (self.d_total + 1) // 2
        return QuadraticQParams(
            l_packed=jax.random.normal(kl, (d_l,), jnp.float32),
            j=jax.random.normal(kj, (self.d_total,), jnp.float32),
            c=jnp.float32(0.0))

    def p_matrix(self, params: QuadraticQParams) -> jax.Array:
        rows, cols = self._tril
        lmat = jnp.zeros((self.d_total, self.d_total), jnp.float32)
        lmat = lmat.at[rows, cols].set(params.l_packed)
        return lmat @ lmat.T

    def __call__(self, params: QuadraticQParams, obs: jax.Array,
                 actions: jax.Array) -> jax.Array:
        """Q values for batched (obs [..., dO], actions [..., dA])."""
        z = jnp.concatenate([obs, actions], axis=-1)
        p = self.p_matrix(params)
        quad = 0.5 * jnp.einsum("...i,ij,...j->...", z, p, z)
        lin = z @ params.j
        return quad + lin + params.c

    def loss(self, params: QuadraticQParams, obs, actions, targets,
             reg: float = 0.0) -> jax.Array:
        """0.5 * MSE (+ L2 mirrored from the reference's SGD weight_decay)."""
        out = self(params, obs, actions)
        # accept reference-style [B, 1] targets without mis-broadcasting
        err = out - jnp.reshape(targets, out.shape)
        l2 = sum(jnp.sum(p ** 2) for p in params[:2])
        return 0.5 * jnp.mean(err ** 2) + 0.5 * reg * l2

    def act_mean_sigma(self, params: QuadraticQParams, obs: jax.Array,
                       lam: float) -> Tuple[jax.Array, jax.Array]:
        """Conditional soft-Q action Gaussian at a single observation."""
        p = self.p_matrix(params)
        pas = p[self.d_obs:, :self.d_obs]
        paa = p[self.d_obs:, self.d_obs:]
        paa = paa + self.jitter * jnp.eye(self.d_action)
        chol = jnp.linalg.cholesky(paa)
        rhs = -params.j[self.d_obs:] - pas @ obs
        mu = jax.scipy.linalg.cho_solve((chol, True), rhs)
        sigma = lam * jax.scipy.linalg.cho_solve(
            (chol, True), jnp.eye(self.d_action))
        return mu, sigma

    def grow_cov(self, params: QuadraticQParams, beta: float,
                 lam: float) -> QuadraticQParams:
        """Σ ← λP⁻¹ + βI in moment space, repacked (reference :126-139).

        The reference maps back with Pnew = (1/λ)·Σ⁻¹, inconsistent with
        its own Σ = λ·P⁻¹ convention (at β=0 it rescales P by 1/λ²,
        SURVEY.md 'quirks'); here the round-trip is the self-consistent
        Pnew = λ·Σ⁻¹, which is the identity at β=0.
        """
        p = self.p_matrix(params) + self.jitter * jnp.eye(self.d_total)
        chol = jnp.linalg.cholesky(p)
        sigma = lam * jax.scipy.linalg.cho_solve(
            (chol, True), jnp.eye(self.d_total))
        sigma = sigma + beta * jnp.eye(self.d_total)
        chol_s = jnp.linalg.cholesky(sigma)
        p_new = lam * jax.scipy.linalg.cho_solve(
            (chol_s, True), jnp.eye(self.d_total))
        l_new = jnp.linalg.cholesky(p_new)
        rows, cols = self._tril
        return params._replace(l_packed=l_new[rows, cols])

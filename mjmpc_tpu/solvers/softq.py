"""Soft-Q MPC: quadratic-Q-guided sampling control.

Reference mjmpc/control/softqmpc/algs/softq_controller.py. Each solve:

1. roll out N particles, each step sampling from the Q-induced conditional
   Gaussian a ~ N(μ(s), λ Paa⁻¹) (softq_controller.py:136-196 — the
   reference does this with a SERIAL per-particle, per-step host loop; here
   it is the standard vmapped scan with the Q-policy as the action fn);
2. soft-Bellman targets: terminal costs replaced by Q(s_H, a_H); targets =
   cost_to_go(costs − λ·entropy) + λ·entropy (softq_controller.py:222-247);
3. one SGD step on 0.5·MSE with weight decay (the reference's
   torch.optim.SGD(lr, weight_decay=reg), softq_controller.py:62-64),
   clipped by global gradient norm (`grad_clip`). The reference's raw
   SGD diverges to NaN within 2 solves on arm-scale tasks (cost-to-go
   targets of O(1e2) through a quartic-in-L loss surface); clipping is
   a deliberate robustness deviation documented in docs/PARITY.md —
   the fit matches the reference exactly while the gradient norm is
   under the clip.

The action-noise covariance Σ = λ Paa⁻¹ depends only on the Q parameters
(not the state), so per-step sampling factorizes into white noise [N,H,dA]
pre-multiplied by chol(Σ) — the rollout stays one fused scan.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..envs.base import Env
from ..models.quadratic_q import QuadraticQFunc, QuadraticQParams
from ..rollout.engine import Trajectories, _scan_rollout

_TAG_ROLLOUT = 30
_TAG_ACT = 31


class SoftQState(NamedTuple):
    q_params: QuadraticQParams
    step: jax.Array
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class SoftQMPC:
    d_obs: int
    d_action: int
    horizon: int
    num_particles: int        # reference n_rollouts
    lam: float = 0.1
    lr: float = 0.01
    reg: float = 0.0
    grad_clip: float = 10.0   # global-norm clip on the Q-fit gradient
                              # (0 disables; see module docstring)
    gamma: float = 1.0
    n_iters: int = 1
    n_grad_steps: int = 1
    sample_mode: str = "mean"
    action_lows: Optional[np.ndarray] = None
    action_highs: Optional[np.ndarray] = None
    # Optional per-feature observation whitening applied before the
    # quadratic features: z = [(obs - shift) / scale; a]. The raw
    # sawyer-scale obs mixes O(1) radians with O(0.1) site deltas, so
    # the un-whitened quartic loss surface is dominated by a few
    # features (the round-3 plateau diagnosis — see harness/softq_diag).
    # None = identity (the reference's behavior).
    obs_shift: Optional[np.ndarray] = None
    obs_scale: Optional[np.ndarray] = None

    def _whiten(self, obs: jax.Array) -> jax.Array:
        if self.obs_shift is None and self.obs_scale is None:
            return obs
        shift = 0.0 if self.obs_shift is None else jnp.asarray(
            self.obs_shift, jnp.float32)
        scale = 1.0 if self.obs_scale is None else jnp.asarray(
            self.obs_scale, jnp.float32)
        return (obs - shift) / scale

    @property
    def gamma_seq(self) -> np.ndarray:
        return ops.gamma_sequence(self.gamma, self.horizon)

    @property
    def model(self) -> QuadraticQFunc:
        return QuadraticQFunc(self.d_obs, self.d_action)

    def init_state(self, key: jax.Array) -> SoftQState:
        pkey, skey = jax.random.split(key)
        return SoftQState(q_params=self.model.init_params(pkey),
                          step=jnp.array(0, jnp.int32), key=skey)

    # ---- policy from Q -----------------------------------------------------
    def _policy(self, params: QuadraticQParams):
        """(mean_fn(obs_batch) -> [B, dA], chol(Σ) [dA, dA], entropy)."""
        model = self.model
        mu_single = lambda o: model.act_mean_sigma(
            params, self._whiten(o), self.lam)[0]
        _, sigma = model.act_mean_sigma(
            params, jnp.zeros((self.d_obs,)), self.lam)
        chol = jnp.linalg.cholesky(
            sigma + model.jitter * jnp.eye(self.d_action))
        entropy = ops.gaussian_entropy(sigma)
        return jax.vmap(mu_single), chol, entropy

    # ---- update -------------------------------------------------------------
    def update(self, state: SoftQState, traj: Trajectories,
               entropy: jax.Array) -> SoftQState:
        model = self.model
        params = state.q_params

        # Terminal cost <- Q(s_H, a_H) (softq_controller.py:224-229)
        term_q = model(params, self._whiten(traj.observations[:, -1]),
                       traj.actions[:, -1])
        costs = traj.costs.at[:, -1].set(term_q)

        ent = jnp.full_like(costs, entropy)
        total = costs - self.lam * ent
        targets = ops.cost_to_go(total, self.gamma_seq) + self.lam * ent

        obs_in = self._whiten(
            traj.observations[:, :-1].reshape(-1, self.d_obs))
        act_in = traj.actions[:, :-1].reshape(-1, self.d_action)
        tgt_in = targets[:, :-1].reshape(-1)

        def one_sgd(p, _):
            g = jax.grad(model.loss)(p, obs_in, act_in, tgt_in, self.reg)
            if self.grad_clip:
                gnorm = jnp.sqrt(sum(jnp.sum(gw ** 2)
                                     for gw in jax.tree_util.tree_leaves(g)))
                scale = jnp.minimum(1.0, self.grad_clip
                                    / jnp.maximum(gnorm, 1e-12))
                g = jax.tree_util.tree_map(lambda gw: gw * scale, g)
            p = jax.tree_util.tree_map(lambda w, gw: w - self.lr * gw, p, g)
            return p, None

        params, _ = jax.lax.scan(one_sgd, params, None,
                                 length=self.n_grad_steps)
        return state._replace(q_params=params)

    # ---- action --------------------------------------------------------------
    def act(self, state: SoftQState, obs: jax.Array,
            mode: Optional[str] = None) -> jax.Array:
        mode = mode or self.sample_mode
        mu, sigma = self.model.act_mean_sigma(state.q_params,
                                              self._whiten(obs), self.lam)
        if mode == "mean":
            return mu
        if mode == "sample":
            key = jax.random.fold_in(
                jax.random.fold_in(state.key, _TAG_ACT), state.step)
            chol = jnp.linalg.cholesky(
                sigma + self.model.jitter * jnp.eye(self.d_action))
            return mu + chol @ jax.random.normal(key, (self.d_action,))
        raise ValueError(f"unknown sample mode {mode!r}")


def build_solve_fn(solver: SoftQMPC, env: Env, shard_particles=None):
    """One SoftQMPC solve (reference optimize: rollouts + Q fit + act)."""
    shard = shard_particles or (lambda x: x)

    def solve(env_params, env_state, state: SoftQState):
        s = state
        for _ in range(solver.n_iters):
            mean_fn, chol, entropy = solver._policy(s.q_params)
            key = jax.random.fold_in(
                jax.random.fold_in(s.key, _TAG_ROLLOUT), s.step)
            white = jax.random.normal(
                key, (solver.num_particles, solver.horizon, solver.d_action))
            noise = shard(white @ chol.T)
            traj = _scan_rollout(env, env_params, env_state, noise,
                                 lambda t, obs: mean_fn(obs))
            s = solver.update(s, traj, entropy)
        obs = env.observe(env_params, env_state)
        action = solver.act(s, obs)
        s = s._replace(step=s.step + 1)
        return action, jnp.float32(0.0), s

    return solve

"""Soft actor-critic in JAX/optax.

Reference mjmpc/control/softqmpc/algs/sac/ (sac.py, model.py/
policy_network.py, q_network.py, utils.py): squashed-Gaussian policy,
twin Q networks with target soft updates, automatic entropy-temperature
tuning. Everything but the replay buffer is one jitted update step; the
networks are the same MLP shapes as the reference's (256, 256 hidden by
default).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp import MLPPolicy

_LOG_STD_MIN, _LOG_STD_MAX = -20.0, 2.0
_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class GaussianPolicy:
    """Squashed diagonal-Gaussian actor (reference policy_network.py)."""
    d_obs: int
    d_action: int
    hidden: Sequence[int] = (256, 256)

    @property
    def _net(self) -> MLPPolicy:
        return MLPPolicy(self.d_obs, 2 * self.d_action, self.hidden,
                         activation="relu", squash=False)

    def init_params(self, key):
        return self._net.init_params(key)

    def dist(self, params, obs):
        out = self._net(params, obs)
        mean, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, _LOG_STD_MIN, _LOG_STD_MAX)
        return mean, log_std

    def sample(self, params, obs, key):
        """(action, log_prob, tanh(mean)) with the tanh-squash correction
        (reference policy_network.py sample())."""
        mean, log_std = self.dist(params, obs)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mean.shape)
        pre = mean + std * eps
        action = jnp.tanh(pre)
        log_prob = jnp.sum(
            -0.5 * (eps ** 2) - log_std - 0.5 * jnp.log(2 * jnp.pi)
            - jnp.log(1.0 - action ** 2 + _EPS), axis=-1)
        return action, log_prob, jnp.tanh(mean)


@dataclasses.dataclass(frozen=True)
class QNetwork:
    """Twin Q (reference q_network.py): two MLPs on [obs, act]."""
    d_obs: int
    d_action: int
    hidden: Sequence[int] = (256, 256)

    @property
    def _net(self) -> MLPPolicy:
        return MLPPolicy(self.d_obs + self.d_action, 1, self.hidden,
                         activation="relu", squash=False)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return (self._net.init_params(k1), self._net.init_params(k2))

    def __call__(self, params, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = self._net(params[0], x)[..., 0]
        q2 = self._net(params[1], x)[..., 0]
        return q1, q2

    def min_q(self, params, obs, act):
        q1, q2 = self(params, obs, act)
        return jnp.minimum(q1, q2)


class SACParams(NamedTuple):
    policy: Any
    q: Any
    q_target: Any
    log_alpha: jax.Array
    policy_opt: Any
    q_opt: Any
    alpha_opt: Any


@dataclasses.dataclass(frozen=True)
class SAC:
    d_obs: int
    d_action: int
    hidden: Sequence[int] = (256, 256)
    gamma: float = 0.99
    tau: float = 0.005
    lr: float = 3e-4
    auto_entropy: bool = True
    init_alpha: float = 0.2

    @property
    def actor(self) -> GaussianPolicy:
        return GaussianPolicy(self.d_obs, self.d_action, self.hidden)

    @property
    def critic(self) -> QNetwork:
        return QNetwork(self.d_obs, self.d_action, self.hidden)

    @property
    def target_entropy(self) -> float:
        return -float(self.d_action)

    def _opts(self):
        return (optax.adam(self.lr), optax.adam(self.lr),
                optax.adam(self.lr))

    def init_params(self, key) -> SACParams:
        kp, kq = jax.random.split(key)
        policy = self.actor.init_params(kp)
        q = self.critic.init_params(kq)
        log_alpha = jnp.asarray(np.log(self.init_alpha), jnp.float32)
        p_opt, q_opt, a_opt = self._opts()
        return SACParams(
            policy=policy, q=q, q_target=jax.tree_util.tree_map(
                lambda x: x, q),
            log_alpha=log_alpha,
            policy_opt=p_opt.init(policy), q_opt=q_opt.init(q),
            alpha_opt=a_opt.init(log_alpha))

    def act(self, params: SACParams, obs, key=None, deterministic=False):
        if deterministic:
            mean, _ = self.actor.dist(params.policy, obs)
            return jnp.tanh(mean)
        return self.actor.sample(params.policy, obs, key)[0]

    def update(self, params: SACParams, batch, key) -> Tuple[SACParams,
                                                             dict]:
        """One SAC gradient step (reference sac.py update_parameters).

        batch: dict of arrays obs [B, dO], action [B, dA], reward [B],
        next_obs [B, dO], done [B]. Rewards are REWARDS (maximize), as in
        the reference SAC (costs are negated before storage).
        """
        p_opt, q_opt, a_opt = self._opts()
        kn, kp = jax.random.split(key)
        alpha = jnp.exp(params.log_alpha)

        # --- critic
        next_a, next_logp, _ = self.actor.sample(params.policy,
                                                 batch["next_obs"], kn)
        target_q = self.critic.min_q(params.q_target, batch["next_obs"],
                                     next_a) - alpha * next_logp
        target = (batch["reward"]
                  + (1.0 - batch["done"]) * self.gamma * target_q)
        target = jax.lax.stop_gradient(target)

        def q_loss_fn(qp):
            q1, q2 = self.critic(qp, batch["obs"], batch["action"])
            return jnp.mean((q1 - target) ** 2) + jnp.mean(
                (q2 - target) ** 2)

        q_loss, q_grad = jax.value_and_grad(q_loss_fn)(params.q)
        q_up, q_opt_state = q_opt.update(q_grad, params.q_opt)
        new_q = optax.apply_updates(params.q, q_up)

        # --- actor
        def pi_loss_fn(pp):
            a, logp, _ = self.actor.sample(pp, batch["obs"], kp)
            q = self.critic.min_q(new_q, batch["obs"], a)
            return jnp.mean(alpha * logp - q), logp

        (pi_loss, logp), pi_grad = jax.value_and_grad(
            pi_loss_fn, has_aux=True)(params.policy)
        p_up, p_opt_state = p_opt.update(pi_grad, params.policy_opt)
        new_policy = optax.apply_updates(params.policy, p_up)

        # --- temperature
        if self.auto_entropy:
            def alpha_loss_fn(la):
                return -jnp.mean(jnp.exp(la) * jax.lax.stop_gradient(
                    logp + self.target_entropy))
            a_loss, a_grad = jax.value_and_grad(alpha_loss_fn)(
                params.log_alpha)
            a_up, a_opt_state = a_opt.update(a_grad, params.alpha_opt)
            new_log_alpha = optax.apply_updates(params.log_alpha, a_up)
        else:
            a_loss = jnp.float32(0.0)
            new_log_alpha = params.log_alpha
            a_opt_state = params.alpha_opt

        # --- target soft update (reference sac/utils.py soft_update)
        new_target = jax.tree_util.tree_map(
            lambda t, s: (1.0 - self.tau) * t + self.tau * s,
            params.q_target, new_q)

        new_params = SACParams(
            policy=new_policy, q=new_q, q_target=new_target,
            log_alpha=new_log_alpha, policy_opt=p_opt_state,
            q_opt=q_opt_state, alpha_opt=a_opt_state)
        info = dict(q_loss=q_loss, pi_loss=pi_loss, alpha_loss=a_loss,
                    alpha=jnp.exp(new_log_alpha))
        return new_params, info

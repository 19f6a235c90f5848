"""Batched rollout engine: the reference's hot loop, fully on device.

The reference serially replays `env.step` per particle per timestep inside
worker processes (gym_env_wrapper.py:89-156, scattered over pipes by
subproc_vec_env.py:161-186). Here the whole batch advances in lockstep:
a `lax.scan` over the horizon of a `vmap` over particles — one XLA program,
no host round trips, particle axis free to shard over a device mesh.

Semantics preserved from the reference rollout:
- every particle starts from the same initial state
  (gym_env_wrapper.py:123-127 re-sets the deep-copied state per particle);
- open-loop action: u[b, t] = mean[t] + noise[b, t]
  (gym_env_wrapper.py:133-140);
- closed-loop-linear: u[b, t] = mean.T @ [obs_b; 1] + noise[b, t];
- recorded actions are the *pre-clip* commanded actions (the env clips
  internally), matching act_vec in gym_env_wrapper.py:151;
- costs are negated rewards (example_mpc.py:127).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..envs.base import Env


class Trajectories(NamedTuple):
    """Batch of rollout results (reference trajectories dict)."""
    observations: jax.Array       # [N, H, d_obs]
    actions: jax.Array            # [N, H, d_action]
    costs: jax.Array              # [N, H]
    dones: jax.Array              # [N, H]
    next_observations: jax.Array  # [N, H, d_obs]
    successes: jax.Array          # [N, H] (zeros when env has no predicate)


def _broadcast_state(state, n: int):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), state)


def _scan_rollout(env: Env, params, state0, noise: jax.Array, action_fn):
    """Common core: scan over horizon of vmapped env.step.

    action_fn(t, obs_batch [N, d_obs]) -> mean action batch [N, d_action];
    noise [N, H, dA] is added on top.
    """
    n = noise.shape[0]
    batch_state = _broadcast_state(state0, n)
    obs0 = jax.vmap(env.observe, in_axes=(None, 0))(params, batch_state)

    step_v = jax.vmap(env.step, in_axes=(None, 0, 0))
    if env.success is not None:
        success_v = jax.vmap(env.success, in_axes=(None, 0))
    else:
        success_v = None

    noise_t = jnp.moveaxis(noise, 1, 0)  # [H, N, dA]

    def body(carry, inp):
        state, obs, t = carry
        eps = inp
        u = action_fn(t, obs) + eps
        new_state, next_obs, reward, done = step_v(params, state, u)
        succ = (success_v(params, new_state) if success_v is not None
                else jnp.zeros_like(reward, dtype=bool))
        out = (obs, u, -reward, done, next_obs, succ)
        return (new_state, next_obs, t + 1), out

    (_, _, _), outs = jax.lax.scan(
        body, (batch_state, obs0, jnp.array(0, jnp.int32)), noise_t)
    obs, acts, costs, dones, next_obs, succ = outs
    return Trajectories(
        observations=jnp.moveaxis(obs, 0, 1),
        actions=jnp.moveaxis(acts, 0, 1),
        costs=jnp.moveaxis(costs, 0, 1),
        dones=jnp.moveaxis(dones, 0, 1),
        next_observations=jnp.moveaxis(next_obs, 0, 1),
        successes=jnp.moveaxis(succ, 0, 1),
    )


def rollout_open_loop(env: Env, params, state0, mean: jax.Array,
                      noise: jax.Array) -> Trajectories:
    """Open-loop rollout: u[b,t] = mean[t] + noise[b,t].

    mean: [H, dA]; noise: [N, H, dA]. state0 is a single env state pytree.
    """
    def action_fn(t, obs):
        return jnp.broadcast_to(mean[t], (obs.shape[0], mean.shape[-1]))
    return _scan_rollout(env, params, state0, noise, action_fn)


def rollout_closed_loop_linear(env: Env, params, state0, weights: jax.Array,
                               noise: jax.Array) -> Trajectories:
    """Closed-loop linear-policy rollout: u = W.T @ [obs; 1] + noise.

    weights: [d_obs + 1, dA] (reference clgaussian_mpc.py:63-73 /
    gym_env_wrapper.py:137-138 'closed_loop_linear' mode).
    """
    def action_fn(t, obs):
        ones = jnp.ones(obs.shape[:-1] + (1,), obs.dtype)
        return jnp.concatenate([obs, ones], axis=-1) @ weights
    return _scan_rollout(env, params, state0, noise, action_fn)


def rollout_closed_loop_policy(env: Env, params, state0, policy_fn,
                               noise: jax.Array) -> Trajectories:
    """Closed-loop rollout under an arbitrary policy: u = policy_fn(obs)
    + noise. policy_fn maps an obs batch [N, d_obs] -> actions [N, dA].

    The reference's TorchModelVecEnv path (rollout_cl with a shared-memory
    torch policy queried per step per worker, gym_env_wrapper.py:255-325)
    — here the policy apply is just part of the fused scan body.
    """
    return _scan_rollout(env, params, state0, noise,
                         lambda t, obs: policy_fn(obs))


def make_rollout_fn(env: Env, mode: str = "open_loop"):
    """Bind an env into a rollout closure matching the reference's
    injected rollout_fn contract (README.md:135-141, example_mpc.py:112-133),
    as a pure function: (params, state0, mean, noise) -> Trajectories."""
    if mode == "open_loop":
        def fn(params, state0, mean, noise):
            return rollout_open_loop(env, params, state0, mean, noise)
    elif mode == "closed_loop_linear":
        def fn(params, state0, weights, noise):
            return rollout_closed_loop_linear(env, params, state0, weights, noise)
    elif mode == "closed_loop_policy":
        def fn(params, state0, policy_fn, noise):
            return rollout_closed_loop_policy(env, params, state0,
                                              policy_fn, noise)
    else:
        raise ValueError(f"unknown rollout mode {mode!r}")
    return fn

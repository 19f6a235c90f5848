"""Env wrappers: observation normalization and frame stacking as pure
state transforms.

The reference wraps its vec-env with VecNormalize (running-mean-std
obs/return normalization, vec_normalize.py:9-40 + running_mean_std.py)
and VecFrameStack (vec_frame_stack.py:7-40). Here a wrapper produces a
new Env whose state pytree carries the extra statistics/buffer, so the
wrapped env composes with vmap/scan/sharding exactly like any other —
the running statistics update with Chan's parallel-merge formula, the
same math as the reference's RunningMeanStd.update.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env


class RMSState(NamedTuple):
    mean: jax.Array
    var: jax.Array
    count: jax.Array


def rms_init(shape, epsilon: float = 1e-4) -> RMSState:
    return RMSState(mean=jnp.zeros(shape, jnp.float32),
                    var=jnp.ones(shape, jnp.float32),
                    count=jnp.float32(epsilon))


def rms_update(rms: RMSState, x: jax.Array) -> RMSState:
    """Single-sample running update (reference running_mean_std.py:16-36,
    batch size 1 per env step)."""
    delta = x - rms.mean
    tot = rms.count + 1.0
    new_mean = rms.mean + delta / tot
    m_a = rms.var * rms.count
    m_2 = m_a + (delta ** 2) * rms.count / tot
    return RMSState(mean=new_mean, var=m_2 / tot, count=tot)


class NormalizedState(NamedTuple):
    inner: Any
    rms: RMSState
    ret: jax.Array       # discounted return accumulator (reward norm)
    ret_rms: RMSState


def normalize_obs(env: Env, clip_obs: float = 10.0,
                  norm_reward: bool = False, clip_reward: float = 10.0,
                  gamma: float = 0.99, epsilon: float = 1e-8) -> Env:
    """VecNormalize equivalent (vec_normalize.py:9-74)."""

    def norm(rms: RMSState, x):
        return jnp.clip((x - rms.mean) / jnp.sqrt(rms.var + epsilon),
                        -clip_obs, clip_obs)

    def init(params, key):
        inner = env.init(params, key)
        return NormalizedState(inner=inner, rms=rms_init((env.d_obs,)),
                               ret=jnp.float32(0.0),
                               ret_rms=rms_init(()))

    def observe(params, state):
        return norm(state.rms, env.observe(params, state.inner))

    def step(params, state, action):
        inner, obs, reward, done = env.step(params, state.inner, action)
        rms = rms_update(state.rms, obs)
        ret = state.ret * gamma + reward
        ret_rms = rms_update(state.ret_rms, ret)
        if norm_reward:
            reward = jnp.clip(
                reward / jnp.sqrt(ret_rms.var + epsilon),
                -clip_reward, clip_reward)
        new = NormalizedState(inner=inner, rms=rms, ret=ret,
                              ret_rms=ret_rms)
        return new, norm(rms, obs), reward, done

    success = None
    if env.success is not None:
        success = lambda params, state: env.success(params, state.inner)

    return dataclasses.replace(env, name=env.name + "+norm", init=init,
                               step=step, observe=observe, success=success)


class StackedState(NamedTuple):
    inner: Any
    frames: jax.Array    # [k, d_obs]


def frame_stack(env: Env, k: int = 4) -> Env:
    """VecFrameStack equivalent (vec_frame_stack.py:7-40): obs is the
    concatenation of the last k raw observations (oldest first, zero
    padded at episode start)."""

    def init(params, key):
        inner = env.init(params, key)
        frames = jnp.zeros((k, env.d_obs), jnp.float32)
        frames = frames.at[-1].set(env.observe(params, inner))
        return StackedState(inner=inner, frames=frames)

    def observe(params, state):
        return state.frames.reshape(-1)

    def step(params, state, action):
        inner, obs, reward, done = env.step(params, state.inner, action)
        frames = jnp.roll(state.frames, -1, axis=0).at[-1].set(obs)
        new = StackedState(inner=inner, frames=frames)
        return new, frames.reshape(-1), reward, done

    success = None
    if env.success is not None:
        success = lambda params, state: env.success(params, state.inner)

    return dataclasses.replace(env, name=env.name + f"+stack{k}",
                               d_obs=env.d_obs * k, init=init, step=step,
                               observe=observe, success=success)

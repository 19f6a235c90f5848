"""SimplePendulum-v0: analytic pendulum swing-up.

Dynamics, cost, and observation match the reference environment
(/root/reference/mjmpc/envs/basic/pendulum.py:33-61): torque-limited
pendulum, reward = -(angle^2 + 0.1*thdot^2 + 0.001*u^2), obs =
[cos th, sin th, thdot], semi-implicit Euler at dt=0.05.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env


class PendulumParams(NamedTuple):
    g: jax.Array
    m: jax.Array
    l: jax.Array
    dt: jax.Array
    max_speed: jax.Array
    max_torque: jax.Array


class PendulumState(NamedTuple):
    th: jax.Array
    thdot: jax.Array


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def default_params() -> PendulumParams:
    return PendulumParams(
        g=jnp.float32(10.0), m=jnp.float32(1.0), l=jnp.float32(1.0),
        dt=jnp.float32(0.05), max_speed=jnp.float32(8.0),
        max_torque=jnp.float32(2.0))


def init(params: PendulumParams, key: jax.Array) -> PendulumState:
    hi = jnp.array([jnp.pi, 1.0])
    s = jax.random.uniform(key, (2,), minval=-hi, maxval=hi)
    return PendulumState(th=s[0], thdot=s[1])


def observe(params: PendulumParams, state: PendulumState) -> jax.Array:
    return jnp.stack([jnp.cos(state.th), jnp.sin(state.th), state.thdot])


def step(params: PendulumParams, state: PendulumState, action: jax.Array):
    u = jnp.clip(action[0], -params.max_torque, params.max_torque)
    cost = angle_normalize(state.th) ** 2 + 0.1 * state.thdot ** 2 + 0.001 * u ** 2
    thdot = state.thdot + (
        -3.0 * params.g / (2.0 * params.l) * jnp.sin(state.th + jnp.pi)
        + 3.0 / (params.m * params.l ** 2) * u) * params.dt
    th = state.th + thdot * params.dt
    thdot = jnp.clip(thdot, -params.max_speed, params.max_speed)
    new = PendulumState(th=th, thdot=thdot)
    return new, observe(params, new), -cost, jnp.array(False)


def make(max_episode_steps: int = 200) -> Env:
    return Env(
        name="SimplePendulum-v0",
        d_obs=3,
        d_action=1,
        action_lows=np.array([-2.0], np.float32),
        action_highs=np.array([2.0], np.float32),
        params=default_params(),
        init=init,
        step=step,
        observe=observe,
        max_episode_steps=max_episode_steps,
    )

"""Continuous-action cartpole swing-up.

Covers the reference's classic-control suite (cartpole via the external
mj_envs dependency, configs/classic_control/cartpole-v0.yml). Dynamics are
the standard cart-pole equations (Barto-Sutton form) with a continuous
force input; cost penalizes pole angle from upright, cart offset, and
velocities, so both balance and swing-up configs work.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env
from .pendulum import angle_normalize


class CartpoleParams(NamedTuple):
    gravity: jax.Array
    masscart: jax.Array
    masspole: jax.Array
    length: jax.Array      # half pole length
    force_mag: jax.Array
    dt: jax.Array
    x_limit: jax.Array


class CartpoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array   # 0 = upright
    theta_dot: jax.Array


def default_params() -> CartpoleParams:
    return CartpoleParams(
        gravity=jnp.float32(9.8), masscart=jnp.float32(1.0),
        masspole=jnp.float32(0.1), length=jnp.float32(0.5),
        force_mag=jnp.float32(10.0), dt=jnp.float32(0.02),
        x_limit=jnp.float32(2.4))


def init(params: CartpoleParams, key: jax.Array) -> CartpoleState:
    s = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
    return CartpoleState(x=s[0], x_dot=s[1], theta=s[2], theta_dot=s[3])


def observe(params: CartpoleParams, state: CartpoleState) -> jax.Array:
    return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])


def step(params: CartpoleParams, state: CartpoleState, action: jax.Array):
    force = jnp.clip(action[0], -1.0, 1.0) * params.force_mag
    total_mass = params.masscart + params.masspole
    polemass_length = params.masspole * params.length

    costh = jnp.cos(state.theta)
    sinth = jnp.sin(state.theta)
    temp = (force + polemass_length * state.theta_dot ** 2 * sinth) / total_mass
    theta_acc = (params.gravity * sinth - costh * temp) / (
        params.length * (4.0 / 3.0 - params.masspole * costh ** 2 / total_mass))
    x_acc = temp - polemass_length * theta_acc * costh / total_mass

    x_dot = state.x_dot + params.dt * x_acc
    x = state.x + params.dt * x_dot
    theta_dot = state.theta_dot + params.dt * theta_acc
    theta = state.theta + params.dt * theta_dot
    new = CartpoleState(x=x, x_dot=x_dot, theta=theta, theta_dot=theta_dot)

    ang = angle_normalize(theta)
    cost = (ang ** 2 + 0.01 * x ** 2 + 0.01 * theta_dot ** 2
            + 0.001 * x_dot ** 2 + 0.001 * (force / params.force_mag) ** 2)
    # Penalize leaving the track instead of terminating (static shapes).
    cost = cost + 100.0 * (jnp.abs(x) > params.x_limit)
    done = jnp.abs(x) > params.x_limit
    return new, observe(params, new), -cost, done


def success(params: CartpoleParams, state: CartpoleState) -> jax.Array:
    return jnp.abs(angle_normalize(state.theta)) < 0.2


def make(max_episode_steps: int = 200) -> Env:
    return Env(
        name="cartpole-v0",
        d_obs=4,
        d_action=1,
        action_lows=np.array([-1.0], np.float32),
        action_highs=np.array([1.0], np.float32),
        params=default_params(),
        init=init,
        step=step,
        observe=observe,
        success=success,
        max_episode_steps=max_episode_steps,
    )


# Dynamics-randomization mapping for the reference's cartpole dyn config
# (examples/configs/classic_control/cartpole_dyn_randomize.yml): mass axes
# map onto the analytic params; its zeroed axes (inertia, damping,
# frictionloss) keep defaults via the randomizer's [0, 0] tolerance.
from .randomize import register_param_paths as _register_param_paths  # noqa: E402

_register_param_paths("cartpole-v0", {
    "body_mass": {"cart": "masscart", "pole": "masspole"},
})

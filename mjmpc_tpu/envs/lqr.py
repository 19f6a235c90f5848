"""Linear-quadratic regulator environment.

Matches the reference analytic fake backend
(/root/reference/mjmpc/envs/basic/lqr.py:31-45): x' = Ax + Bu,
reward = -(x'Qx + u'Ru). Serves as the ground-truth test fixture — the
optimal controller has a closed-form Riccati solution against which
solvers are validated (reference softqmpc/tests/*lqr_test.py strategy).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env


class LQRParams(NamedTuple):
    A: jax.Array
    B: jax.Array
    Q: jax.Array
    R: jax.Array


class LQRState(NamedTuple):
    x: jax.Array  # [d_state]


def init(params: LQRParams, key: jax.Array) -> LQRState:
    d = params.A.shape[0]
    return LQRState(x=jax.random.uniform(key, (d,), minval=-100.0, maxval=100.0))


def observe(params: LQRParams, state: LQRState) -> jax.Array:
    return state.x


def step(params: LQRParams, state: LQRState, action: jax.Array):
    x = state.x
    cost = x @ params.Q @ x + action @ params.R @ action
    new_x = params.A @ x + params.B @ action
    new = LQRState(x=new_x)
    return new, new_x, -cost, jnp.array(False)


def riccati_gain(A: np.ndarray, B: np.ndarray, Q: np.ndarray, R: np.ndarray,
                 iters: int = 500) -> np.ndarray:
    """Infinite-horizon discrete LQR gain K (u* = -K x) by value iteration.

    The analytic oracle used in tests (reference
    simple_quadratic_model_lqr_test.py:7-27 role).
    """
    P = Q.copy()
    for _ in range(iters):
        BtP = B.T @ P
        K = np.linalg.solve(R + BtP @ B, BtP @ A)
        P = Q + A.T @ P @ (A - B @ K)
    return np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)


def make(A=None, B=None, Q=None, R=None, max_episode_steps: int = 100) -> Env:
    if A is None:
        # Default: 2D double integrator, mildly unstable.
        A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
        B = np.array([[0.0], [0.1]], np.float32)
        Q = np.eye(2, dtype=np.float32)
        R = 0.1 * np.eye(1, dtype=np.float32)
    params = LQRParams(A=jnp.asarray(A), B=jnp.asarray(B),
                       Q=jnp.asarray(Q), R=jnp.asarray(R))
    d_action = np.asarray(B).shape[-1]
    return Env(
        name="LQR-v0",
        d_obs=np.asarray(A).shape[0],
        d_action=d_action,
        action_lows=np.full((d_action,), -np.inf, np.float32),
        action_highs=np.full((d_action,), np.inf, np.float32),
        params=params,
        init=init,
        step=step,
        observe=observe,
        max_episode_steps=max_episode_steps,
    )

"""Pure-function environment protocol.

The reference wraps stateful gym environments and replays them serially per
particle (gym_env_wrapper.py:89-156). Here an environment is a set of pure
functions over an explicit state pytree so that rollouts become
`vmap(lax.scan(step))` — thousands of particles advance in lockstep on one
chip, and the particle axis shards over a device mesh.

Env contract (all pure, all jit/vmap-compatible):
    env.init(params, key)               -> state pytree (episode start)
    env.step(params, state, action)     -> (next_state, obs, reward, done)
    env.observe(params, state)          -> obs

`params` is the dynamics-model pytree (masses, lengths, inertias, ...),
passed explicitly so that dynamics randomization (reference
gym_env_wrapper.py:367-416) becomes a vmap over perturbed model pytrees
instead of per-process mutation of a MuJoCo model.

State pytrees are what the reference calls "env state" (the deepcopied dict
broadcast to every worker in SubprocVecEnv.set_env_state); here they are
just JAX arrays, replicated or donated as needed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

StepFn = Callable[[Any, Any, jax.Array], Tuple[Any, jax.Array, jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class Env:
    """An environment as a bundle of pure functions + static metadata."""
    name: str
    d_obs: int
    d_action: int
    action_lows: np.ndarray
    action_highs: np.ndarray
    params: Any
    init: Callable[[Any, jax.Array], Any]
    step: StepFn
    observe: Callable[[Any, Any], jax.Array]
    # Optional per-step success predicate: (params, state) -> bool scalar
    # (reference reacher_env.py:112-125 `goal_achieved` semantics).
    success: Optional[Callable[[Any, Any], jax.Array]] = None
    max_episode_steps: int = 1000
    # Optional fused rollout fast path: (params, state, mean [H, dA],
    # noise [N, H, dA]) -> costs [N, H], equivalent to the costs of
    # rollout_open_loop but computed by a single Pallas kernel
    # (ops/pallas_chain.py). Model constants are BAKED at build time, so
    # solvers must bypass it when planning against perturbed params
    # (build_solve_fn's fused flag — the dynamics-randomization path).
    fused_rollout: Optional[Callable[[Any, Any, jax.Array, jax.Array],
                                     jax.Array]] = None
    # Optional fused CLOSED-LOOP-LINEAR rollout: (params, state,
    # weights [d_obs + 1, dA], noise [N, H, dA]) ->
    # (obs [N, H, d_obs], actions [N, H, dA], costs [N, H]),
    # equivalent to rollout_closed_loop_linear with the policy matmul
    # and observation computed inside the kernel
    # (ops/pallas_chain.build_chain_cl_rollout; the Reinforce fast path).
    fused_cl_rollout: Optional[Callable[[Any, Any, jax.Array, jax.Array],
                                        Any]] = None
    # Optional fused open-loop rollout WITH observations: (params, state,
    # mean [H, dA], noise [N, H, dA]) -> (obs [N, H, d_obs],
    # costs [N, H]) — the fast path for observation-consuming open-loop
    # solvers (MPPIQ with a plugged Q). Actions are mean + noise,
    # reconstructed by the caller.
    fused_obs_rollout: Optional[Callable[[Any, Any, jax.Array, jax.Array],
                                         Any]] = None

    def with_params(self, params) -> "Env":
        """Rebind the dynamics parameters (for randomization sweeps)."""
        return dataclasses.replace(self, params=params)

    def clip_action(self, action: jax.Array) -> jax.Array:
        return jnp.clip(action, jnp.asarray(self.action_lows),
                        jnp.asarray(self.action_highs))

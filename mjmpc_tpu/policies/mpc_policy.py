"""MPCPolicy: string -> controller factory + stateful get_action shell.

Reference mjmpc/policies/mpc_policy.py:10-37. There the policy holds a
stateful controller whose optimize() does host-side NumPy updates between
process-pool rollouts; here it holds (a) a frozen solver config, (b) a
jitted solve function, and (c) the solver-state pytree, so get_action is
one device call per control step.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .. import solvers
from ..envs.base import Env
from .base import Policy


class MPCPolicy(Policy):
    def __init__(self, controller_type: str, env: Env, param_dict: dict,
                 seed: int = 0, batch_size: int = 1):
        self.controller_type = controller_type
        self.env = env
        params = dict(param_dict)
        params.setdefault("d_action", env.d_action)
        params.setdefault("action_lows", env.action_lows)
        params.setdefault("action_highs", env.action_highs)
        self.solver = solvers.make_solver(controller_type, **params)
        self._solve = jax.jit(solvers.make_solve_fn(self.solver, env))
        self._seed = seed
        self.reset(seed)

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self._seed = seed
        self.solver_state = self.solver.init_state(
            jax.random.PRNGKey(self._seed))

    def get_action(self, env_state, calc_val: bool = False):
        """One MPC solve from the given env state (the reference's
        controller.optimize path). Returns (action np[dA], value float)."""
        action, value, self.solver_state = self._solve(
            self.env.params, env_state, self.solver_state)
        return np.asarray(action), float(value)

    def get_action_seq(self, env_state, horizon: Optional[int] = None):
        mean = getattr(self.solver_state, "mean", None)
        if mean is None:
            raise NotImplementedError
        seq = np.asarray(mean)
        return seq if horizon is None else seq[:horizon]

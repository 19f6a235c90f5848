"""SAC-augmented MPC: MPPIQ guided by a SAC-learned twin Q.

Reference mjmpc/control/softqmpc/algs/sac_mpc.py:47-120 (SACMPC —
commented out of the upstream registry but part of the §2.7 capability
surface): MPC collects transitions, SAC trains on them, the learned
min(Q1, Q2) becomes the terminal/step value estimate inside the MPPIQ
blended returns. Negative sign discipline: SAC maximizes reward, MPPIQ
consumes costs, so q_fn returns -Q.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs as envs_mod
from .. import solvers
from .replay import ReplayMemory
from .sac import SAC, SACParams


@dataclasses.dataclass
class SACMPC:
    env: object
    horizon: int = 16
    num_particles: int = 256
    beta: float = 0.5
    td_lam: float = 0.9
    gamma: float = 0.99
    init_cov: float = 1.0
    batch_size: int = 128
    updates_per_step: int = 1
    replay_capacity: int = 100_000
    seed: int = 0

    def __post_init__(self):
        env = self.env
        self.sac = SAC(d_obs=env.d_obs, d_action=env.d_action,
                       gamma=self.gamma)
        self._key = jax.random.PRNGKey(self.seed)
        self._key, pk = jax.random.split(self._key)
        self.sac_params: SACParams = self.sac.init_params(pk)
        self.memory = ReplayMemory(self.replay_capacity, seed=self.seed)
        self._update = jax.jit(self.sac.update)
        self._build_solver()

    def _build_solver(self):
        env, sac = self.env, self.sac

        base = solvers.MPPIQ(
            d_action=env.d_action, horizon=self.horizon,
            num_particles=self.num_particles, beta=self.beta,
            td_lam=self.td_lam, gamma=self.gamma, init_cov=self.init_cov,
            step_size=0.55, filter_coeffs=(0.25, 0.8, 0.0),
            base_action="repeat")
        self.solver = base

        # The live Q params must be an ARGUMENT of the jitted step — a
        # q_fn closing over self.* would be baked in as a constant at
        # trace time and SAC updates would never reach the planner.
        def solve_with_q(env_params, env_state, solver_state, q_params):
            def q_fn(obs, acts):
                # MPPIQ consumes costs: negate the SAC state-action value.
                q = sac.critic.min_q(q_params,
                                     obs.reshape(-1, env.d_obs),
                                     acts.reshape(-1, env.d_action))
                return -q.reshape(obs.shape[:-1])
            solver = dataclasses.replace(base, q_fn=q_fn)
            return solvers.make_solve_fn(solver, env)(
                env_params, env_state, solver_state)

        self._solve = jax.jit(solve_with_q)

        # Fused control step: solve + env.step in ONE device program
        # (CLAUDE.md invariant: no host round trips inside the control
        # loop) — only the replay-buffer push stays on host.
        def control_step(env_params, env_state, solver_state, q_params):
            obs = env.observe(env_params, env_state)
            action, _, solver_state = solve_with_q(
                env_params, env_state, solver_state, q_params)
            action = env.clip_action(action)
            env_state, next_obs, reward, done = env.step(
                env_params, env_state, action)
            return (env_state, solver_state, obs, action, next_obs,
                    reward)

        self._control_step = jax.jit(control_step)
        self._key, sk = jax.random.split(self._key)
        self.solver_state = self.solver.init_state(sk)

    def train(self, n_steps: int, episode_length: int = 200,
              min_buffer: int = 500):
        """Interleaved MPC control + SAC updates. Returns episode rewards."""
        env = self.env
        ep_rewards, ep_reward = [], 0.0
        self._key, ek = jax.random.split(self._key)
        env_state = env.init(env.params, ek)
        t = 0
        for step in range(n_steps):
            (env_state, self.solver_state, obs, action, next_obs,
             reward) = self._control_step(
                env.params, env_state, self.solver_state,
                self.sac_params.q)
            self.memory.push(np.asarray(obs), np.asarray(action),
                             float(reward), np.asarray(next_obs), False)
            ep_reward += float(reward)
            t += 1

            if len(self.memory) >= min_buffer:
                for _ in range(self.updates_per_step):
                    batch = {k: jnp.asarray(v) for k, v in
                             self.memory.sample(self.batch_size).items()}
                    self._key, uk = jax.random.split(self._key)
                    self.sac_params, info = self._update(
                        self.sac_params, batch, uk)

            if t >= episode_length:
                ep_rewards.append(ep_reward)
                ep_reward, t = 0.0, 0
                self._key, ek, sk = jax.random.split(self._key, 3)
                env_state = env.init(env.params, ek)
                self.solver_state = self.solver.init_state(sk)
        return ep_rewards

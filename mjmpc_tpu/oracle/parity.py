"""Parity-noise mode: run the TPU solver against the CPU reference math
at identical seeds and compare control sequences.

BASELINE.md requires 'control-sequence deviation within tolerance of CPU
mjmpc at identical horizon/num_particles/seeds (parity-noise mode)'. The
reference's noise is drawn by reseeding GLOBAL NumPy every solve
(control_utils.py:24-34) — not reproducible with JAX PRNG bit-for-bit —
so in parity mode the noise is generated host-side with the exact
reference procedure (oracle.numpy_ref.generate_noise) and INJECTED into
both sides (SURVEY.md §7 'hard parts', plan (a)):

  CPU side:  serial double-precision rollout (C++ oracle) + NumPy
             reference update equations,
  TPU side:  the framework's fused rollout + solver update with the same
             injected noise,

stepping both for `n_steps` MPC solves and reporting the worst deviation
of the executed control sequence.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs, ops, solvers
from ..rollout.engine import rollout_open_loop
from . import numpy_ref
from . import cpp_oracle


def run_mppi_parity(n_steps: int = 10, horizon: int = 16,
                    num_particles: int = 64, base_seed: int = 123,
                    lam: float = 0.05, step_size: float = 0.7,
                    gamma: float = 0.99,
                    filter_coeffs=(0.25, 0.8, 0.0)) -> Tuple[float, float]:
    """(max control deviation, max mean-sequence deviation) over an
    n_step closed-loop pendulum run at identical injected noise."""
    env = envs.make("SimplePendulum-v0")
    solver = solvers.MPPI(d_action=1, horizon=horizon,
                          num_particles=num_particles, lam=lam,
                          step_size=step_size, gamma=gamma, alpha=1,
                          init_cov=1.0, filter_coeffs=filter_coeffs,
                          base_action="null")

    @jax.jit
    def tpu_update(mean, env_state, noise):
        state = solver.init_state(jax.random.PRNGKey(0))._replace(
            mean=jnp.asarray(mean, jnp.float32))
        traj = rollout_open_loop(env, env.params, env_state, state.mean,
                                 jnp.asarray(noise, jnp.float32))
        return solver.update(state, traj).mean

    def cpu_update(mean, actions, costs):
        return cpp_oracle.mppi_update(mean, actions, costs, gamma, lam,
                                      step_size)

    return _run_parity((cpu_update, tpu_update), n_steps, horizon,
                       num_particles, base_seed,
                       filter_coeffs=filter_coeffs)


def _run_parity(update_pair, n_steps, horizon, num_particles, base_seed,
                filter_coeffs=(0.25, 0.8, 0.0)):
    """Shared closed-loop parity loop: update_pair = (cpu_update,
    tpu_update) where each maps (mean, costs/traj pieces) -> new mean."""
    env = envs.make("SimplePendulum-v0")
    cov = np.eye(1, dtype=np.float64)
    cpu_update, tpu_update = update_pair

    env_state = env.init(env.params, jax.random.PRNGKey(1))
    th, thdot = float(env_state.th), float(env_state.thdot)
    mean_cpu = np.zeros((horizon, 1))
    mean_tpu = np.zeros((horizon, 1))
    max_act_dev = 0.0
    max_mean_dev = 0.0
    from ..envs.pendulum import PendulumState
    step_fn = jax.jit(env.step)

    for t in range(n_steps):
        noise = numpy_ref.generate_noise(
            cov, filter_coeffs, (num_particles, horizon), base_seed + t)
        costs_cpu = cpp_oracle.pendulum_rollout(
            env.params, th, thdot, mean_cpu, noise)
        mean_cpu = cpu_update(mean_cpu, mean_cpu[None] + noise, costs_cpu)

        env_state = PendulumState(th=jnp.float32(th),
                                  thdot=jnp.float32(thdot))
        mean_tpu = np.asarray(tpu_update(mean_tpu, env_state, noise))

        max_mean_dev = max(max_mean_dev,
                           float(np.abs(mean_cpu - mean_tpu).max()))
        a_cpu = mean_cpu[0]
        max_act_dev = max(max_act_dev,
                          float(np.abs(a_cpu - mean_tpu[0]).max()))
        env_state, _, _, _ = step_fn(
            env.params, env_state,
            jnp.asarray(np.clip(a_cpu, -2, 2), jnp.float32))
        th, thdot = float(env_state.th), float(env_state.thdot)
        mean_cpu = np.vstack([mean_cpu[1:], np.zeros((1, 1))])
        mean_tpu = np.vstack([mean_tpu[1:], np.zeros((1, 1))])
    return max_act_dev, max_mean_dev


def run_random_shooting_parity(n_steps=8, horizon=12, num_particles=48,
                               base_seed=123, step_size=0.7, gamma=0.99):
    env = envs.make("SimplePendulum-v0")
    solver = solvers.RandomShooting(
        d_action=1, horizon=horizon, num_particles=num_particles,
        step_size=step_size, gamma=gamma, init_cov=1.0)
    gamma_seq = ops.gamma_sequence(gamma, horizon)

    @jax.jit
    def tpu_update(mean, env_state, noise):
        state = solver.init_state(jax.random.PRNGKey(0))._replace(
            mean=jnp.asarray(mean, jnp.float32))
        traj = rollout_open_loop(env, env.params, env_state, state.mean,
                                 jnp.asarray(noise, jnp.float32))
        return solver.update(state, traj).mean

    def cpu_update(mean, actions, costs):
        return numpy_ref.random_shooting_update(
            mean, actions, costs, gamma_seq, step_size)

    return _run_parity((cpu_update, tpu_update), n_steps, horizon,
                       num_particles, base_seed)[0]


def run_cem_parity(n_steps=8, horizon=12, num_particles=48,
                   base_seed=123, step_size=0.8, gamma=0.99,
                   elite_frac=0.25):
    env = envs.make("SimplePendulum-v0")
    solver = solvers.CEM(
        d_action=1, horizon=horizon, num_particles=num_particles,
        step_size=step_size, gamma=gamma, elite_frac=elite_frac,
        beta=0.0, init_cov=1.0, cov_type="diagonal")
    gamma_seq = ops.gamma_sequence(gamma, horizon)

    @jax.jit
    def tpu_update(mean, env_state, noise):
        state = solver.init_state(jax.random.PRNGKey(0))._replace(
            mean=jnp.asarray(mean, jnp.float32))
        traj = rollout_open_loop(env, env.params, env_state, state.mean,
                                 jnp.asarray(noise, jnp.float32))
        return solver.update(state, traj).mean

    def cpu_update(mean, actions, costs):
        new_mean, _ = numpy_ref.cem_update(
            mean, np.eye(1), actions, costs, gamma_seq, elite_frac,
            step_size, "diagonal")
        return new_mean

    return _run_parity((cpu_update, tpu_update), n_steps, horizon,
                       num_particles, base_seed)[0]


def main():
    act_dev, mean_dev = run_mppi_parity()
    rs_dev = run_random_shooting_parity()
    cem_dev = run_cem_parity()
    print(f"parity-noise MPPI: max action dev {act_dev:.2e}, "
          f"mean-seq dev {mean_dev:.2e}")
    print(f"parity-noise random_shooting: max action dev {rs_dev:.2e}")
    print(f"parity-noise CEM(diag): max action dev {cem_dev:.2e}")
    return act_dev, mean_dev


if __name__ == "__main__":
    main()

"""Headline benchmark: MPPI solves/s at H=32, N=4096 (BASELINE.md target:
>= 100 solves/s per chip on reacher_7dof-v0; falls back to the pendulum
model if the arm model is not yet registered).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

from mjmpc_tpu import envs, solvers

HORIZON = 32
NUM_PARTICLES = 4096
TARGET_SOLVES_PER_S = 100.0


def main():
    name = ("reacher_7dof-v0" if "reacher_7dof-v0" in envs.available()
            else "SimplePendulum-v0")
    env = envs.make(name)
    solver = solvers.MPPI(
        d_action=env.d_action, horizon=HORIZON, num_particles=NUM_PARTICLES,
        lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
        filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")

    solve = jax.jit(solvers.make_solve_fn(solver, env), donate_argnums=(2,))
    solver_state = solver.init_state(jax.random.PRNGKey(0))
    env_state = env.init(env.params, jax.random.PRNGKey(1))

    # Warmup / compile.
    action, _, solver_state = solve(env.params, env_state, solver_state)
    jax.block_until_ready(action)

    # Timed: chained solves (state donated — the production control loop).
    # Best of 3 windows: the remote-TPU tunnel adds dispatch jitter that a
    # single window under-reports.
    n_solves = 100
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_solves):
            action, _, solver_state = solve(env.params, env_state,
                                            solver_state)
        jax.block_until_ready(action)
        best = min(best, time.perf_counter() - start)

    solves_per_s = n_solves / best
    print(json.dumps({
        "metric": f"mppi_solves_per_s[{name},H={HORIZON},N={NUM_PARTICLES}]",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()

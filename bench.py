"""Headline benchmark: MPPI solves/s at H=32, N=4096 (BASELINE.md target:
>= 100 solves/s per chip on reacher_7dof-v0; falls back to the pendulum
model if the arm model is not yet registered).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Extra accountability fields (VERDICT r1 items 2-3):
  value        — MEDIAN over WINDOWS timing windows (stable across runs;
                 best-of-3 rode the remote-tunnel jitter and drifted >20%
                 between reports)
  spread_pct   — (p75 - p25) / median * 100 over the windows
  flops_per_solve / bytes_per_solve — XLA cost_analysis of the compiled
                 solve executable
  achieved_tflops / mfu_pct_bf16 — achieved FLOP/s at the median rate,
                 and its fraction of the v5e bf16 MXU peak (197 TFLOP/s;
                 the solve is dominated by f32 elementwise rollout
                 physics, so this is a roofline position statement, not a
                 matmul-efficiency claim)
  particle_substeps_per_s — N * H * substeps * solves/s, the physics
                 throughput behind the solves/s number
"""
from __future__ import annotations

import json
import statistics
import time

import jax

from mjmpc_tpu import envs, solvers

HORIZON = 32
NUM_PARTICLES = 4096
TARGET_SOLVES_PER_S = 100.0
# A window must hold >= ~0.4 s of device work: at ~25k solves/s a
# 100-solve window is 4 ms and the median rides pure timer/dispatch
# noise (the round-1 23% headline drift). The chip is multi-tenant
# (random ~20% dips, no systematic ramp — measured trace in RESULTS.md),
# so the median needs enough windows to shrug the dips off: 15 x 10k
# puts the run-to-run agreement inside ~2-3%.
WINDOWS = 15
SOLVES_PER_WINDOW = 10_000
V5E_BF16_PEAK_FLOPS = 197e12


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

    # Cost analysis via an AOT lower/compile. The timing loop stays on
    # the JIT dispatch path: calling the AOT executable directly costs
    # ~30 us of Python arg handling per call and HALVES the measured
    # rate at these solve sizes (measured 14.6k vs ~30k solves/s). The
    # duplicate compile is served by the compilation cache.
    from mjmpc_tpu.harness.benchmark import cost_dict
    cost = cost_dict(solve.lower(env.params, env_state,
                                 solver_state).compile())
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # Warmup: one compile call, then ~0.4 s of steady work so the first
    # timed window starts from a hot dispatch pipeline.
    action, _, solver_state = solve(env.params, env_state, solver_state)
    jax.block_until_ready(action)
    for _ in range(10_000):
        action, _, solver_state = solve(env.params, env_state, solver_state)
    jax.block_until_ready(action)

    rates = []
    for _ in range(WINDOWS):
        start = time.perf_counter()
        for _ in range(SOLVES_PER_WINDOW):
            action, _, solver_state = solve(env.params, env_state,
                                            solver_state)
        jax.block_until_ready(action)
        rates.append(SOLVES_PER_WINDOW / (time.perf_counter() - start))

    rates.sort()
    median = statistics.median(rates)
    q1 = rates[len(rates) // 4]
    q3 = rates[(3 * len(rates)) // 4]
    spread_pct = 100.0 * (q3 - q1) / median
    achieved = flops * median

    print(json.dumps({
        "metric": f"mppi_solves_per_s[{name},H={HORIZON},N={NUM_PARTICLES}]",
        "value": round(median, 2),
        "unit": "solves/s",
        "vs_baseline": round(median / TARGET_SOLVES_PER_S, 3),
        "spread_pct": round(spread_pct, 2),
        "flops_per_solve": flops,
        "bytes_per_solve": bytes_accessed,
        "achieved_tflops": round(achieved / 1e12, 4),
        "mfu_pct_bf16": round(100.0 * achieved / V5E_BF16_PEAK_FLOPS, 3),
        "particle_substeps_per_s": round(
            NUM_PARTICLES * HORIZON * median, 0),
    }))


if __name__ == "__main__":
    main()

"""Benchmark runner: solves/s and op microbenchmarks.

The reference has no benchmark suite (SURVEY.md §6 — batch_timing_test.py
is empty); this implements the BASELINE.md benchmark configs: MPPI on
reacher_7dof, random_shooting/CEM on the classic tasks, PFMPC, plus op
microbenches (noise sampler, cost-to-go) on XLA and Pallas paths.

Usage: python -m mjmpc_tpu.harness.benchmark [--quick] [--json PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import envs, ops, solvers


def _finite_read(out) -> float:
    """Read (device->host) a scalar that data-depends on `out` and check
    it is finite. On this remote-TPU runtime `block_until_ready` reports
    a FAULTED program complete immediately and an unread loop can time
    host ENQUEUE rate — only a value READ proves device execution
    (RESULTS.md round-3 measurement correction)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    val = float(jnp.sum(jnp.asarray(leaf, jnp.float32)))
    if not np.isfinite(val):
        raise RuntimeError(f"non-finite benchmark output: {val}")
    return val


def _time(fn, *args, iters: int = 50, warmup: int = 2) -> float:
    """Steady-state seconds/call. Each iteration's first output leaf is
    accumulated and the window ends by READING the accumulator, so the
    measured span data-depends on every timed call (the small on-device
    add per call is included in the rate — conservative)."""
    for _ in range(warmup):
        out = fn(*args)
    _finite_read(out)
    acc = None
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        acc = leaf if acc is None else acc + leaf
    val = float(jnp.sum(jnp.asarray(acc, jnp.float32)))
    dt = (time.perf_counter() - start) / iters
    if not np.isfinite(val):
        raise RuntimeError(f"non-finite benchmark output: {val}")
    return dt


def bench_solver(env_name: str, controller: str, horizon: int,
                 num_particles: int, iters: int = 50,
                 **solver_kwargs) -> Dict[str, Any]:
    env = envs.make(env_name)
    defaults = dict(d_action=env.d_action, horizon=horizon,
                    num_particles=num_particles, gamma=1.0,
                    filter_coeffs=(0.25, 0.8, 0.0))
    if controller == "mppi":
        defaults.update(lam=0.01, init_cov=3.0, step_size=0.55,
                        base_action="repeat")
    elif controller == "cem":
        defaults.update(elite_frac=0.2, beta=0.3, step_size=0.9)
    elif controller == "pfmpc":
        defaults = dict(d_action=env.d_action, horizon=horizon,
                        num_particles=num_particles, lam=0.1,
                        cov_shift=0.1, cov_resample=1.0)
    solver = solvers.make_solver(controller, **{**defaults, **solver_kwargs})

    solve = jax.jit(solvers.make_solve_fn(solver, env))
    sstate = solver.init_state(jax.random.PRNGKey(0))
    estate = env.init(env.params, jax.random.PRNGKey(1))

    # chained-state timing: the production control loop. The final
    # action data-depends on every solve through the chained solver
    # state, so ONE read at the end verifies the whole window.
    for _ in range(2):
        a, _, sstate = solve(env.params, estate, sstate)
    _finite_read(a)
    start = time.perf_counter()
    s = sstate
    for _ in range(iters):
        a, _, s = solve(env.params, estate, s)
    _finite_read(a)
    dt = (time.perf_counter() - start) / iters

    return dict(metric=f"{controller}_solves_per_s"
                       f"[{env_name},H={horizon},N={num_particles}]",
                value=round(1.0 / dt, 2), unit="solves/s")


def bench_ops(num_particles: int = 4096, horizon: int = 32,
              d_action: int = 7) -> List[Dict[str, Any]]:
    rows = []
    key = jax.random.PRNGKey(0)
    cov = jnp.eye(d_action)
    coeffs = (0.25, 0.8, 0.0)

    nz = jax.jit(lambda k: ops.filtered_noise(
        k, cov, (num_particles, horizon), coeffs))
    dt = _time(nz, key)
    rows.append(dict(metric="filtered_noise_xla_us", value=round(dt * 1e6, 1),
                     unit="us"))

    try:
        from ..ops import pallas_kernels as pk
        nzp = jax.jit(lambda s: pk.filtered_noise_pallas(
            s, (num_particles, horizon), d_action, coeffs))
        dt = _time(nzp, 42)
        rows.append(dict(metric="filtered_noise_pallas_us",
                         value=round(dt * 1e6, 1), unit="us"))
    except Exception as e:  # pragma: no cover - informational
        rows.append(dict(metric="filtered_noise_pallas_us", value=-1,
                         unit="us", error=str(e)))

    costs = jax.random.uniform(key, (num_particles, horizon))
    gseq = ops.gamma_sequence(0.99, horizon)
    ctg = jax.jit(lambda c: ops.cost_to_go(c, gseq))
    dt = _time(ctg, costs)
    rows.append(dict(metric="cost_to_go_us", value=round(dt * 1e6, 1),
                     unit="us"))
    return rows


DEFAULT_SUITE = [
    ("reacher_7dof-v0", "mppi", 32, 4096),
    ("reacher_7dof-v0", "mppi", 32, 16384),
    ("SimplePendulum-v0", "mppi", 32, 4096),
    ("SimplePendulum-v0", "random_shooting", 32, 4096),
    ("SimplePendulum-v0", "cem", 32, 4096),
    ("reacher_7dof-v0", "cem", 16, 4096),
    ("SimplePendulum-v0", "pfmpc", 32, 4096),
    # contact-rich hand suite: free quaternion object + 14 contact pairs
    # per substep through the batched points_frame path
    ("pen-v0", "mppi", 32, 1024),
    # locomotion family through the fused drag/contact kernels
    # (ops/pallas_chain.build_chain_ext_rollout)
    ("Swimmer-v0", "mppi", 32, 4096),
    ("HalfCheetah-v0", "mppi", 32, 1024),
]


def bench_latency(env_name: str = "reacher_7dof-v0", horizon: int = 32,
                  num_particles: int = 4096, iters: int = 30):
    """Blocked per-solve latency — the real-time control metric (one MPC
    solve per control step; reference pays an IPC round trip here)."""
    if env_name not in envs.available():
        env_name = "SimplePendulum-v0"
    env = envs.make(env_name)
    solver = solvers.MPPI(
        d_action=env.d_action, horizon=horizon, num_particles=num_particles,
        lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
        filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    s = solver.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    out = solve(env.params, est, s)
    _finite_read(out)
    lats = []
    for _ in range(iters):
        start = time.perf_counter()
        out = solve(env.params, est, s)
        _finite_read(out)   # device->host action readback IS part of
        lats.append(time.perf_counter() - start)   # real control latency
    med = float(np.median(lats))
    return dict(metric=f"mppi_solve_latency_ms"
                       f"[{env_name},H={horizon},N={num_particles}]",
                value=round(med * 1e3, 3), unit="ms")


def bench_sharded(horizon: int = 32, particles_per_device: int = 4096,
                  iters: int = 30):
    """Weak-scaling probe: sharded solve with N scaled by device count
    (run on a pod slice for the BASELINE 1->2 host numbers)."""
    from .. import parallel
    n_dev = len(jax.devices())
    mesh = parallel.make_mesh()
    env = envs.make("reacher_7dof-v0" if "reacher_7dof-v0"
                    in envs.available() else "SimplePendulum-v0")
    n = particles_per_device * n_dev
    solver = solvers.MPPI(
        d_action=env.d_action, horizon=horizon, num_particles=n,
        lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
        filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
    solve = parallel.build_sharded_solve_fn(solver, env, mesh)
    s = solver.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    a, _, s = solve(env.params, est, s)
    _finite_read(a)
    start = time.perf_counter()
    for _ in range(iters):
        a, _, s = solve(env.params, est, s)
    _finite_read(a)
    dt = (time.perf_counter() - start) / iters
    return dict(metric=f"sharded_mppi_solves_per_s"
                       f"[{env.name},H={horizon},N={n},devices={n_dev}]",
                value=round(1.0 / dt, 2), unit="solves/s")


def bench_aggregate(env_name: str = "reacher_7dof-v0", horizon: int = 32,
                    num_particles: int = 4096, batches=(1, 2, 4, 8),
                    iters: int = 10) -> List[Dict[str, Any]]:
    """Aggregate throughput: B independent MPC solves batched into ONE
    dispatch (vmap over env/solver states; on the fused kernel path the
    batch lifts into the pallas grid). The single-chip utilization probe
    (VERDICT r2 item 3): if B doubles aggregate solves/s, the
    single-stream headline is dispatch/occupancy-bound, not
    compute-bound."""
    if env_name not in envs.available():
        env_name = "SimplePendulum-v0"
    env = envs.make(env_name)
    solver = solvers.MPPI(
        d_action=env.d_action, horizon=horizon, num_particles=num_particles,
        lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
        filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
    solve = solvers.build_solve_fn(solver, env)
    vsolve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0)))
    rows = []
    for b in batches:
        est = jax.vmap(env.init, in_axes=(None, 0))(
            env.params, jax.random.split(jax.random.PRNGKey(1), b))
        s = jax.vmap(solver.init_state)(
            jax.random.split(jax.random.PRNGKey(0), b))
        for _ in range(2):
            a, _, s = vsolve(env.params, est, s)
        _finite_read(a)
        start = time.perf_counter()
        for _ in range(iters):
            a, _, s = vsolve(env.params, est, s)
        _finite_read(a)   # chained solver state: one read covers all
        dt = (time.perf_counter() - start) / iters
        rows.append(dict(
            metric=f"aggregate_mppi_solves_per_s"
                   f"[{env_name},H={horizon},N={num_particles},B={b}]",
            value=round(b / dt, 2), unit="solves/s",
            ms_per_dispatch=round(dt * 1e3, 3)))
    return rows


def cost_dict(compiled) -> dict:
    """Normalize compiled.cost_analysis() across jax versions (dict,
    [dict], or None)."""
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return cost


def bench_roofline(env_name: str = "reacher_7dof-v0", horizon: int = 32,
                   num_particles: int = 4096, iters: int = 50,
                   peak_flops: float = 197e12):
    """FLOP/byte accounting of the headline solve (VERDICT r1 item 2).

    XLA cost_analysis of the compiled executable gives flops + bytes
    accessed per solve; combined with the measured rate this places the
    solve on the roofline: achieved FLOP/s, MFU vs the v5e bf16 MXU peak
    (197 TFLOP/s), and arithmetic intensity. The solve is rollout-physics
    dominated (small-matrix f32), so MFU is a position statement, not a
    matmul-efficiency target."""
    if env_name not in envs.available():
        env_name = "SimplePendulum-v0"
    env = envs.make(env_name)
    solver = solvers.MPPI(
        d_action=env.d_action, horizon=horizon, num_particles=num_particles,
        lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
        filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    s = solver.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    cost = cost_dict(solve.lower(env.params, est, s).compile())
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    # time the JIT dispatch path (direct AOT-executable calls pay ~30 us
    # of Python arg handling per call — bench.py note)
    dt = _time(lambda: solve(env.params, est, s), iters=iters)
    achieved = flops / dt
    return dict(
        metric=f"roofline[{env_name},H={horizon},N={num_particles}]",
        value=round(achieved / 1e12, 4), unit="TFLOP/s",
        flops_per_solve=flops, bytes_per_solve=nbytes,
        mfu_pct_bf16=round(100.0 * achieved / peak_flops, 3),
        ai_flops_per_byte=round(flops / nbytes, 3) if nbytes else None,
        # XLA's analytical bytes-accessed counts fused intermediates, so
        # this is NOT physical HBM bandwidth (it can exceed it by 100x)
        analytic_bytes_gb_per_s=round(nbytes / dt / 1e9, 2))


def bench_weak_scaling(horizon: int = 32, particles_per_device: int = 512,
                       iters: int = 20):
    """Weak-scaling trend over 1/2/4/8-device sub-meshes with FIXED
    particles per device (BASELINE >= 80% efficiency row). On the CPU
    virtual mesh this measures partitioning/collective overhead trends
    only — ICI efficiency needs real multi-chip hardware; run with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
    to reproduce the RESULTS.md table."""
    from .. import parallel
    rows = []
    all_dev = jax.devices()
    base_rate = None
    for nd in (1, 2, 4, 8):
        if nd > len(all_dev):
            break
        mesh = parallel.make_mesh(episodes=1, particles=nd,
                                  devices=all_dev[:nd])
        env = envs.make("reacher_7dof-v0" if "reacher_7dof-v0"
                        in envs.available() else "SimplePendulum-v0")
        n = particles_per_device * nd
        solver = solvers.MPPI(
            d_action=env.d_action, horizon=horizon, num_particles=n,
            lam=0.01, init_cov=3.0, step_size=0.55, gamma=1.0,
            filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
        solve = parallel.build_sharded_solve_fn(solver, env, mesh)
        s = solver.init_state(jax.random.PRNGKey(0))
        est = env.init(env.params, jax.random.PRNGKey(1))
        dt = _time(lambda: solve(env.params, est, s), iters=iters)
        rate = 1.0 / dt
        if base_rate is None:
            base_rate = rate
        rows.append(dict(
            metric=f"weak_scaling[devices={nd},N={n}]",
            value=round(rate, 2), unit="solves/s",
            efficiency_pct=round(100.0 * rate / base_rate, 1)))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer iterations / smaller suite")
    parser.add_argument("--json", type=str, default=None,
                        help="also write results to this file")
    parser.add_argument("--profile", type=str, default=None,
                        help="capture a jax.profiler trace to this dir")
    parser.add_argument("--weak-scaling", action="store_true",
                        help="only run the 1/2/4/8-device weak-scaling "
                             "trend (use the 8-device CPU virtual mesh)")
    parser.add_argument("--cpu-mesh", action="store_true",
                        help="force an 8-device virtual CPU mesh")
    args = parser.parse_args(argv)

    if args.cpu_mesh and jax.default_backend() != "cpu":
        # The platform must be pinned before ANY backend touch, and
        # importing this module's parents already touched it (the
        # container pins JAX_PLATFORMS=axon). Re-exec with a bootstrap
        # that pins CPU first.
        rest = [a for a in (argv if argv is not None else sys.argv[1:])
                if a != "--cpu-mesh"]
        code = (
            "import os; os.environ['XLA_FLAGS'] = "
            "os.environ.get('XLA_FLAGS','') + "
            "' --xla_force_host_platform_device_count=8'; "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from mjmpc_tpu.harness import benchmark; "
            f"benchmark.main({rest!r})")
        os.execv(sys.executable, [sys.executable, "-c", code])

    if args.weak_scaling:
        rows = bench_weak_scaling()
        for row in rows:
            print(json.dumps(row))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(rows, f, indent=2)
        return rows

    suite = DEFAULT_SUITE[:3] if args.quick else DEFAULT_SUITE
    iters = 10 if args.quick else 50

    rows = []

    def _run(label, fn, *a, **kw):
        # one failing row (e.g. a kernel-compile regression on one env)
        # must not lose the rest of the suite
        try:
            out = fn(*a, **kw)
        except Exception as e:  # pragma: no cover - resilience path
            out = dict(metric=label, value=-1, unit="error",
                       error=f"{type(e).__name__}: {e}"[:500])
        for row in (out if isinstance(out, list) else [out]):
            rows.append(row)
            print(json.dumps(row), flush=True)

    for env_name, controller, horizon, n in suite:
        if env_name not in envs.available():
            continue
        _run(f"{controller}[{env_name},H={horizon},N={n}]",
             bench_solver, env_name, controller, horizon, n, iters=iters)
    _run("latency", bench_latency)
    _run("roofline", bench_roofline, iters=iters)
    _run("aggregate", bench_aggregate,
         batches=(1, 2) if args.quick else (1, 2, 4, 8),
         iters=iters // 5 or 2)
    if len(jax.devices()) > 1:
        _run("sharded", bench_sharded)
    _run("ops", bench_ops)

    if args.profile:
        with jax.profiler.trace(args.profile):
            bench_latency(iters=5)
        print(json.dumps(dict(metric="profile_trace", value=args.profile,
                              unit="path")))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()

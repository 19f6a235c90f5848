"""Read-verified on-chip timings: (a) the BASELINE final row — Reinforce
closed-loop blending (qtv VF + KL line search) at 16,384 particles through
the fused CL chain kernel on reacher_7dof; (b) a dyn-randomized pen MPPI
solve on the fused forest kernel (geom_friction/geom_size perturbed params,
fast path retained)."""
import json, time
import jax, jax.numpy as jnp, numpy as np
from mjmpc_tpu import envs, solvers

# (a) 16K-particle closed-loop Reinforce
env = envs.make("reacher_7dof-v0")
solver = solvers.Reinforce(
    d_obs=env.d_obs, d_action=env.d_action, horizon=32,
    num_particles=16384, lr=1.0, gamma=1.0, n_iters=5,
    baseline_type="quadratic_time_varying", delta_kl=15.0,
    delta_reg=0.001, filter_coeffs=(0.25, 0.8, 0.0))
solve = jax.jit(solvers.make_solve_fn(solver, env), donate_argnums=(2,))
s = solver.init_state(jax.random.PRNGKey(0))
est = env.init(env.params, jax.random.PRNGKey(1))
for _ in range(3):
    a, _, s = solve(env.params, est, s)
print(json.dumps({"probe_action0": float(a[0]),
                  "fit_error": float(s.fit_error)}), flush=True)
k = 50
t0 = time.perf_counter()
for _ in range(k):
    a, _, s = solve(env.params, est, s)
v = float(a[0]); dt = (time.perf_counter() - t0) / k
assert v == v
print(json.dumps({
    "metric": "reinforce_cl_solves_per_s[reacher_7dof-v0,H=32,N=16384,"
              "n_iters=5,qtv_vf,kl_search]",
    "value": round(1.0/dt, 2), "unit": "solves/s",
    "ms_per_solve": round(dt*1e3, 3), "read_verified": True,
    "fused_cl": env.fused_cl_rollout is not None}), flush=True)

# (b) randomized pen solve, fused fast path retained
env = envs.make("pen-v0")
rand_env, _, randomized = envs.randomize_dynamics(
    env, {"geom_friction": {"pen": [0.2, 0.1]},
          "geom_size": {"pen": [0.2, -0.1]}}, base_seed=7)
from mjmpc_tpu.harness.episode import _fused_mode
mode = _fused_mode(env, rand_env.params)
assert mode == "auto", mode
mppi = solvers.MPPI(d_action=env.d_action, horizon=32, num_particles=1024,
                    lam=0.05, init_cov=0.5, step_size=0.7, gamma=1.0,
                    filter_coeffs=(0.25, 0.8, 0.0), base_action="repeat")
solve = jax.jit(solvers.make_solve_fn(mppi, env), donate_argnums=(2,))
for label, p in [("nominal", env.params), ("randomized", rand_env.params)]:
    s = mppi.init_state(jax.random.PRNGKey(0))
    est = env.init(env.params, jax.random.PRNGKey(1))
    for _ in range(3):
        a, _, s = solve(p, est, s)
    float(a[0])
    k = 40
    t0 = time.perf_counter()
    for _ in range(k):
        a, _, s = solve(p, est, s)
    v = float(a[0]); dt = (time.perf_counter() - t0) / k
    assert v == v
    print(json.dumps({
        "metric": f"mppi_solves_per_s[pen-v0,{label},H=32,N=1024,fused]",
        "value": round(1.0/dt, 2), "unit": "solves/s",
        "read_verified": True}), flush=True)

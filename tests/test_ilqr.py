"""iLQR correctness: on the LQR env it must recover near-Riccati-optimal
control (the analytic oracle the reference reserved for its softq tests);
on the pendulum it must reduce cost monotonically-ish and act finitely.
The reference ilqr.py is a non-functional stub — this is an upgrade, not
a port (SURVEY.md quirks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.envs.lqr import LQRState, riccati_gain


def test_ilqr_exact_on_lqr():
    """On a linear-quadratic problem iLQR's plan must equal the exact
    finite-horizon dynamic-programming solution (one Newton step is
    exact on a quadratic)."""
    env = envs.make("LQR-v0")
    p = env.params
    h = 30
    a_m = np.asarray(p.A, np.float64)
    b_m = np.asarray(p.B, np.float64)
    q_m = np.asarray(p.Q, np.float64)
    r_m = np.asarray(p.R, np.float64)

    # exact finite-horizon DP (zero terminal cost, like the solver)
    pp = np.zeros((2, 2))
    ks = []
    for _ in range(h):
        k = np.linalg.solve(r_m + b_m.T @ pp @ b_m, b_m.T @ pp @ a_m)
        pp = q_m + k.T @ r_m @ k + (a_m - b_m @ k).T @ pp @ (a_m - b_m @ k)
        ks.append(k)
    ks = ks[::-1]

    x0 = np.array([1.5, -0.8])
    u0_opt = float((-ks[0] @ x0)[0])
    x = x0.copy()
    cost_opt = 0.0
    for t in range(h):
        u = -ks[t] @ x
        cost_opt += x @ q_m @ x + u @ r_m @ u
        x = a_m @ x + b_m @ u

    solver = solvers.ILQR(d_action=1, horizon=h, n_iters=3, mu=1e-6)
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    s = solver.init_state(jax.random.PRNGKey(0))
    a, plan_cost, s = solve(env.params,
                            LQRState(x=jnp.asarray(x0, jnp.float32)), s)
    np.testing.assert_allclose(float(a[0]), u0_opt, rtol=1e-3)
    np.testing.assert_allclose(float(plan_cost), cost_opt, rtol=1e-4)


def test_ilqr_cost_decreases_on_pendulum():
    env = envs.make("SimplePendulum-v0")
    solver = solvers.ILQR(d_action=1, horizon=24, n_iters=8, mu=1e-2,
                          action_lows=env.action_lows,
                          action_highs=env.action_highs)
    solve = jax.jit(solvers.make_solve_fn(solver, env))
    from mjmpc_tpu.envs.pendulum import PendulumState
    state = PendulumState(th=jnp.float32(2.5), thdot=jnp.float32(0.0))
    s = solver.init_state(jax.random.PRNGKey(0))
    a, cost1, s = solve(env.params, state, s)
    assert np.isfinite(float(cost1))
    assert np.isfinite(np.asarray(a)).all()
    # replanning from the hotstart keeps improving or holds
    a2, cost2, s = solve(env.params, state, s)
    assert float(cost2) <= float(cost1) * 1.05

"""Pallas TPU kernels for the sampling-MPC hot ops.

Two fused kernels replace multi-kernel XLA sequences on the solve's
critical path:

1. `filtered_noise_pallas` — the AR(2) filtered-noise sampler
   (reference control_utils.py:24-34) as ONE kernel: on-chip PRNG ->
   Box-Muller standard normals -> AR(2) IIR recurrence along the horizon.
   The XLA path (jax.random.normal + lax.scan) round-trips [N,H,dA]
   through HBM per scan step; here the whole (H, TILE_N) panel lives in
   registers/VMEM. Covariance coloring (matmul by chol(cov) on the action
   axis) commutes with the per-dim time filter, so it is applied after
   the kernel as one MXU matmul.
   NOTE: uses the TPU hardware PRNG — same distribution, different bit
   stream from jax.random (parity tests use the XLA path / NumPy oracle).

2. `pendulum_rollout_pallas` — the fused rollout+cost kernel for the
   analytic pendulum (the reference's GymEnvWrapper.rollout hot loop,
   gym_env_wrapper.py:125-153, collapsed into one kernel): H Euler steps
   and running-cost evaluation for a TILE_N-wide particle panel without
   leaving VMEM.

Layouts put particles on the 128-lane axis (the wide, parallel dimension)
and the horizon on sublanes, so the sequential-in-H recurrences are
unrolled row ops over [TILE_N] vectors — exactly what the VPU wants.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256
_TWO_PI = 2.0 * np.pi


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (the CPU test mesh)."""
    return jax.default_backend() != "tpu"


def _uniform01(shape):
    """U[2^-25, 1) from hardware PRNG bits (24-bit mantissa path).

    Mosaic has no uint32->f32 cast; the top-24-bit value fits in a
    non-negative int32, so route the cast through a bitcast.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (2.0 ** -25)


def _standard_normal(shape):
    """Box-Muller pair; uses two PRNG draws, returns one normal panel."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


# ---------------------------------------------------------------------------
# Filtered-noise sampler
# ---------------------------------------------------------------------------

def _noise_kernel(seed_ref, out_ref, *, horizon: int,
                  coeffs: Tuple[float, float, float]):
    d = pl.program_id(0)
    j = pl.program_id(1)
    # Distinct stream per (action-dim, particle-tile) grid cell.
    pltpu.prng_seed(seed_ref[0] + d * 7919 + j * 104729)

    b0, b1, b2 = coeffs
    z = _standard_normal((horizon, out_ref.shape[2]))
    if (b0, b1, b2) != (1.0, 0.0, 0.0) and horizon > 2:
        # AR(2) IIR along the horizon: rows 0,1 pass through, then
        # e[t] = b0 z[t] + b1 e[t-1] + b2 e[t-2] (static unroll, H <= 64).
        rows = [z[0], z[1]]
        for t in range(2, horizon):
            rows.append(b0 * z[t] + b1 * rows[t - 1] + b2 * rows[t - 2])
        z = jnp.stack(rows)
    out_ref[0] = z


def filtered_noise_pallas(seed, shape: Tuple[int, int], d_action: int,
                          filter_coeffs: Sequence[float] = (1.0, 0.0, 0.0),
                          chol: jax.Array = None) -> jax.Array:
    """AR(2)-filtered noise [N, H, dA] in one fused kernel.

    seed: int32 scalar (fold the solver key into it host-side).
    chol: optional [dA, dA] lower Cholesky factor of the action covariance
    (applied after filtering — the two linear maps commute).
    """
    n, horizon = shape
    n_pad = _round_up(max(n, 8), _TILE_N)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(_noise_kernel, horizon=horizon,
                               coeffs=tuple(float(c) for c in filter_coeffs))
    out = pl.pallas_call(
        kernel,
        grid=(d_action, n_pad // _TILE_N),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, horizon, _TILE_N),
            lambda d, j: (d, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_action, horizon, n_pad),
                                       jnp.float32),
        interpret=_interpret(),
    )(seed_arr)

    eps = jnp.transpose(out, (2, 1, 0))[:n]          # [N, H, dA]
    if chol is not None:
        eps = eps @ chol.T
    return eps


# ---------------------------------------------------------------------------
# Fused pendulum rollout (analytic-env fast path)
# ---------------------------------------------------------------------------

def _pendulum_kernel(state_ref, mean_ref, noise_ref, costs_ref, *,
                     horizon: int, g: float, m: float, l: float, dt: float,
                     max_speed: float, max_torque: float):
    th = jnp.broadcast_to(state_ref[0, 0], (costs_ref.shape[1],))
    thdot = jnp.broadcast_to(state_ref[0, 1], (costs_ref.shape[1],))
    two_pi = np.float32(2.0 * np.pi)
    for t in range(horizon):
        u = jnp.clip(mean_ref[t, 0] + noise_ref[t], -max_torque, max_torque)
        ang = ((th + np.pi) % two_pi) - np.pi
        cost = ang * ang + 0.1 * thdot * thdot + 0.001 * u * u
        thdot = thdot + (-3.0 * g / (2.0 * l) * jnp.sin(th + np.pi)
                         + 3.0 / (m * l * l) * u) * dt
        th = th + thdot * dt                      # pre-clip thdot, like env
        thdot = jnp.clip(thdot, -max_speed, max_speed)
        costs_ref[t] = cost


def pendulum_rollout_pallas(params, th0, thdot0, mean: jax.Array,
                            noise: jax.Array) -> jax.Array:
    """Fused N-particle H-step pendulum rollout -> costs [N, H].

    Matches envs/pendulum.py step semantics exactly (cost evaluated at the
    pre-step state, torque clipped, speed clamped).
    """
    n, horizon = noise.shape[0], noise.shape[1]
    n_pad = _round_up(max(n, 8), _TILE_N)
    noise_t = jnp.zeros((horizon, n_pad), jnp.float32)
    noise_t = noise_t.at[:, :n].set(jnp.transpose(noise[..., 0], (1, 0)))
    state = jnp.stack([th0, thdot0]).reshape(1, 2)

    kernel = functools.partial(
        _pendulum_kernel, horizon=horizon,
        g=float(params.g), m=float(params.m), l=float(params.l),
        dt=float(params.dt), max_speed=float(params.max_speed),
        max_torque=float(params.max_torque))

    costs = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE_N,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((horizon, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((horizon, _TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((horizon, _TILE_N), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((horizon, n_pad), jnp.float32),
        interpret=_interpret(),
    )(state, mean, noise_t)
    return jnp.transpose(costs, (1, 0))[:n]


# ---------------------------------------------------------------------------
# Whole-solve kernel: one MPPI solve for the pendulum in a single Pallas
# call — noise, rollout, cost-to-go, softmax weights, and the mean update
# never leave VMEM. (alpha=1, non-time-based weights: the tuned
# README configuration.)
#
# MEASURED NEGATIVE RESULT (kept as a documented demonstrator): at
# N=2048, H=32 on v5e this single-program kernel runs ~4x SLOWER than
# the XLA multi-op solve (1330 us vs 316 us). One grid cell means no
# pipelining, the hand-written Box-Muller costs more than XLA's fused
# threefry, and the 32 sequential lane-reductions in the mean update
# serialize on the VPU. The XLA path stays the production default —
# exactly the "let XLA fuse" rule of the TPU playbook; this kernel
# documents where the crossover is NOT.
# ---------------------------------------------------------------------------

def _mppi_solve_kernel(seed_ref, state_ref, mean_ref, out_ref, costs_ref, *,
                       horizon: int, n: int, coeffs, sigma: float,
                       lam: float, step_size: float, gamma: float,
                       g: float, m: float, l: float, dt: float,
                       max_speed: float, max_torque: float):
    # 1. noise: on-chip PRNG -> standard normal -> AR(2) -> scale
    pltpu.prng_seed(seed_ref[0])
    z = _standard_normal((horizon, n))
    b0, b1, b2 = coeffs
    if (b0, b1, b2) != (1.0, 0.0, 0.0) and horizon > 2:
        rows = [z[0], z[1]]
        for t in range(2, horizon):
            rows.append(b0 * z[t] + b1 * rows[t - 1] + b2 * rows[t - 2])
        z = jnp.stack(rows)
    eps = sigma * z

    # 2. rollout + per-step cost (fused pendulum dynamics)
    th = jnp.broadcast_to(state_ref[0, 0], (n,))
    thdot = jnp.broadcast_to(state_ref[0, 1], (n,))
    two_pi = np.float32(2.0 * np.pi)
    for t in range(horizon):
        u = jnp.clip(mean_ref[t, 0] + eps[t], -max_torque, max_torque)
        ang = ((th + np.pi) % two_pi) - np.pi
        costs_ref[t] = ang * ang + 0.1 * thdot * thdot + 0.001 * u * u
        thdot = thdot + (-3.0 * g / (2.0 * l) * jnp.sin(th + np.pi)
                         + 3.0 / (m * l * l) * u) * dt
        th = th + thdot * dt
        thdot = jnp.clip(thdot, -max_speed, max_speed)

    # 3. cost-to-go at t=0 (backward recurrence over VMEM rows)
    acc = costs_ref[horizon - 1]
    for t in range(horizon - 2, -1, -1):
        acc = costs_ref[t] + gamma * acc

    # 4. softmax weights over the particle lanes
    neg = -acc * (1.0 / lam)
    w = jnp.exp(neg - jnp.max(neg))
    w = w / jnp.sum(w)

    # 5. step-size-blended weighted-mean update (scalar stores to VMEM are
    # not allowed: accumulate rows, store the whole [H, 1] block once)
    rows = []
    for t in range(horizon):
        weighted = jnp.sum(w * (mean_ref[t, 0] + eps[t]))
        rows.append((1.0 - step_size) * mean_ref[t, 0]
                    + step_size * weighted)
    out_ref[:] = jnp.stack(rows).reshape(horizon, 1)


def mppi_pendulum_solve_pallas(params, th0, thdot0, mean: jax.Array,
                               seed, num_particles: int,
                               filter_coeffs=(1.0, 0.0, 0.0),
                               sigma: float = 1.0, lam: float = 0.01,
                               step_size: float = 0.55,
                               gamma: float = 1.0) -> jax.Array:
    """One full MPPI mean update as a single kernel. mean: [H, 1];
    returns the new mean [H, 1]. num_particles must keep the [H, N]
    panels in VMEM (N <= ~8192 at H=32)."""
    horizon = mean.shape[0]
    n = _round_up(max(num_particles, 128), 128)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    state = jnp.stack([jnp.asarray(th0, jnp.float32),
                       jnp.asarray(thdot0, jnp.float32)]).reshape(1, 2)

    kernel = functools.partial(
        _mppi_solve_kernel, horizon=horizon, n=n,
        coeffs=tuple(float(c) for c in filter_coeffs),
        sigma=float(sigma), lam=float(lam), step_size=float(step_size),
        gamma=float(gamma), g=float(params.g), m=float(params.m),
        l=float(params.l), dt=float(params.dt),
        max_speed=float(params.max_speed),
        max_torque=float(params.max_torque))

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((horizon, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((horizon, n), jnp.float32)],
        interpret=_interpret(),
    )(seed_arr, state, mean)

"""Smooth penalty-contact primitives shared by the contact-rich envs.

The reference delegates contact to MuJoCo's LCP solver inside mujoco_py
(SURVEY.md §2.9); here contact is a compliant spring-damper normal force
with saturated Coulomb friction — fixed-shape, branch-free (`jnp.where`
gates), and differentiable, so thousands of particles roll out in
lockstep under vmap/scan and the whole solve stays one XLA program.

Geometry helpers return force ON body A given the separation vector and
relative surface velocity; the caller applies ±f through
`engine.chain.points_frame` (one linearized-kinematics pass covers every
contact point's position, velocity, and force scatter).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def closest_on_segment(p: jax.Array, a: jax.Array, b: jax.Array):
    """(closest point on segment ab to p, interpolation weight t)."""
    d = b - a
    t = jnp.clip((p - a) @ d / (d @ d + 1e-12), 0.0, 1.0)
    return a + t * d, t


def force_along(n: jax.Array, overlap: jax.Array, rel_vel: jax.Array,
                kp, kd, mu, v_slip: float = 0.02) -> jax.Array:
    """The one friction law every contact shape shares: spring-damper
    normal force along unit normal `n` (clamped non-negative, gated on
    overlap > 0) + Coulomb friction with smooth slip regularization
    (|f_t| <= mu f_n, direction -v_t) — the MuJoCo pyramidal cone's
    smooth stand-in (docs/PARITY.md: penalty contact, no LCP)."""
    vn = rel_vel @ n
    fn = jnp.where(overlap > 0.0, jnp.maximum(kp * overlap - kd * vn, 0.0),
                   0.0)
    vt = rel_vel - vn * n
    ft = -mu * fn * vt / (jnp.linalg.norm(vt) + v_slip)
    return fn * n + ft


def penalty_force(sep: jax.Array, rel_vel: jax.Array, overlap: jax.Array,
                  kp, kd, mu, v_slip: float = 0.02) -> jax.Array:
    """Force on body A. sep: vector from the closest point on B to A's
    point (defines the contact normal); rel_vel: v_A - v_B; overlap:
    combined radius minus distance (> 0 means penetrating)."""
    n = sep / (jnp.linalg.norm(sep) + 1e-9)
    return force_along(n, overlap, rel_vel, kp, kd, mu, v_slip)


def sphere_segment_force(p: jax.Array, v: jax.Array, r_sphere,
                         seg_a: jax.Array, seg_b: jax.Array,
                         v_a: jax.Array, v_b: jax.Array, r_seg,
                         kp, kd, mu):
    """Sphere (at p, vel v) vs capsule segment (world endpoints a/b with
    velocities v_a/v_b, radius r_seg).

    Returns (force on the sphere, t) where t is the closest-point weight:
    the equal-and-opposite force applies to the capsule as (1-t)·(-f) at
    a and t·(-f) at b (point Jacobians are affine in the point, so the
    lerp of endpoint wrenches IS the wrench at the closest point)."""
    c, t = closest_on_segment(p, seg_a, seg_b)
    v_c = (1.0 - t) * v_a + t * v_b
    sep = p - c
    overlap = (r_sphere + r_seg) - jnp.linalg.norm(sep)
    return penalty_force(sep, v - v_c, overlap, kp, kd, mu), t


def sphere_plane_force(p: jax.Array, v: jax.Array, r_sphere, kp, kd, mu,
                       z_plane: float = 0.0, v_slip: float = 0.02):
    """Sphere vs the horizontal plane z = z_plane (force on the sphere).

    The normal is the FIXED +z plane normal — not the center-to-surface
    direction, which would flip sign once the center passes below the
    plane and turn the restoring force into a runaway expulsion."""
    overlap = r_sphere - (p[2] - z_plane)
    return force_along(jnp.array([0.0, 0.0, 1.0], p.dtype), overlap, v,
                       kp, kd, mu, v_slip)


def segment_segment_closest(a0: jax.Array, a1: jax.Array,
                            b0: jax.Array, b1: jax.Array):
    """Closest points between segments a and b: (p_a, p_b, s, t) with
    p_a = lerp(a0, a1, s), p_b = lerp(b0, b1, t). Branch-free clamped
    form of the standard pairwise closest-point recurrence."""
    d1, d2, r = a1 - a0, b1 - b0, a0 - b0
    a, e, b = d1 @ d1 + 1e-12, d2 @ d2 + 1e-12, d1 @ d2
    c, f = d1 @ r, d2 @ r
    denom = a * e - b * b
    s = jnp.clip(jnp.where(denom > 1e-12, (b * f - c * e) / denom, 0.0),
                 0.0, 1.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    return a0 + s * d1, b0 + t * d2, s, t


def capsule_capsule_force(a0, a1, v_a0, v_a1, r_a, b0, b1, r_b,
                          kp, kd, mu):
    """Moving capsule A (endpoint velocities v_a0/v_a1) vs STATIC capsule
    B. Returns (force on A at its closest point, s) — apply to A's
    endpoints as (1-s)·f and s·f."""
    p_a, p_b, s, _ = segment_segment_closest(a0, a1, b0, b1)
    v = (1.0 - s) * v_a0 + s * v_a1
    sep = p_a - p_b
    overlap = (r_a + r_b) - jnp.linalg.norm(sep)
    return penalty_force(sep, v, overlap, kp, kd, mu), s


def sphere_sphere_force(p_a: jax.Array, v_a: jax.Array, r_a,
                        p_b: jax.Array, v_b: jax.Array, r_b,
                        kp, kd, mu):
    """Sphere A vs sphere B (force on A)."""
    sep = p_a - p_b
    overlap = (r_a + r_b) - jnp.linalg.norm(sep)
    return penalty_force(sep, v_a - v_b, overlap, kp, kd, mu)

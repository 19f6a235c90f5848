"""ctypes loader for the C++ CPU rollout oracle.

Builds oracle.cpp with g++ on first use (cached next to the source) and
exposes numpy-friendly wrappers. See oracle/cpp/oracle.cpp for what each
entry point mirrors in the reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cpp", "oracle.cpp")
_LIB = os.path.join(_DIR, "cpp", "liboracle.so")

_lib: Optional[ctypes.CDLL] = None

_D = ctypes.POINTER(ctypes.c_double)
_I64 = ctypes.c_int64
_F64 = ctypes.c_double


def _build() -> None:
    proc = subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"oracle build failed:\n{proc.stderr}")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.ar_filter.argtypes = [_D, _I64, _I64, _I64, _F64, _F64, _F64]
    lib.cost_to_go.argtypes = [_D, _D, _I64, _I64, _D]
    lib.pendulum_rollout.argtypes = [_F64] * 8 + [_D, _D, _I64, _I64, _D]
    lib.lqr_rollout.argtypes = [_D] * 7 + [_I64] * 4 + [_D]
    lib.mppi_update.argtypes = [_D, _D, _D, _I64, _I64, _I64,
                                _F64, _F64, _F64, _D]
    _I64P = ctypes.POINTER(ctypes.c_int64)
    lib.chain_mass_matrix.argtypes = [_I64, _I64P, _I64P] + [_D] * 6
    lib.chain_bias.argtypes = [_I64, _I64P, _I64P] + [_D] * 8
    lib.chain_site.argtypes = [_I64, _I64P, _I64P, _D, _D, _D, _I64,
                               _D, _D]
    lib.chain_step.argtypes = ([_I64, _I64P, _I64P] + [_D] * 12
                               + [_F64, _I64] + [_D] * 3)
    lib.chain_site_rollout.argtypes = (
        [_I64, _I64P, _I64P] + [_D] * 12 + [_F64, _I64] + [_D] * 4
        + [_I64, _I64, _F64, _F64, _I64] + [_D] * 2)
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_D)


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float64))


def ar_filter(eps: np.ndarray, filter_coeffs: Sequence[float]) -> np.ndarray:
    lib = _load()
    out = _c64(eps).copy()
    n, h, da = out.shape
    b0, b1, b2 = (float(c) for c in filter_coeffs)
    lib.ar_filter(_ptr(out), n, h, da, b0, b1, b2)
    return out


def cost_to_go(costs: np.ndarray, gamma_seq: np.ndarray) -> np.ndarray:
    lib = _load()
    c = _c64(costs)
    g = _c64(gamma_seq).reshape(-1)
    n, h = c.shape
    out = np.empty_like(c)
    lib.cost_to_go(_ptr(c), _ptr(out), n, h, _ptr(g))
    return out


def pendulum_rollout(params, th0: float, thdot0: float, mean: np.ndarray,
                     noise: np.ndarray) -> np.ndarray:
    """costs [N, H] for the analytic pendulum (mean [H,1], noise [N,H,1])."""
    lib = _load()
    mean = _c64(mean).reshape(-1)
    noise = _c64(noise)
    n, h = noise.shape[0], noise.shape[1]
    noise2 = noise.reshape(n, h)
    out = np.empty((n, h), np.float64)
    lib.pendulum_rollout(
        float(params.g), float(params.m), float(params.l), float(params.dt),
        float(params.max_speed), float(params.max_torque),
        float(th0), float(thdot0),
        _ptr(mean), _ptr(noise2), n, h, _ptr(out))
    return out


def lqr_rollout(a, b, q_diag, r_diag, x0, mean, noise) -> np.ndarray:
    lib = _load()
    a, b = _c64(a), _c64(b)
    q_diag, r_diag, x0 = _c64(q_diag), _c64(r_diag), _c64(x0)
    mean, noise = _c64(mean), _c64(noise)
    n, h, du = noise.shape
    dx = a.shape[0]
    out = np.empty((n, h), np.float64)
    lib.lqr_rollout(_ptr(a), _ptr(b), _ptr(q_diag), _ptr(r_diag), _ptr(x0),
                    _ptr(mean), _ptr(noise), n, h, dx, du, _ptr(out))
    return out


def mppi_update(mean, actions, costs, gamma: float, lam: float,
                step_size: float) -> np.ndarray:
    lib = _load()
    mean, actions, costs = _c64(mean), _c64(actions), _c64(costs)
    n, h, da = actions.shape
    out = np.empty_like(mean)
    lib.mppi_update(_ptr(mean), _ptr(actions), _ptr(costs), n, h, da,
                    float(gamma), float(lam), float(step_size), _ptr(out))
    return out


# ---------------------------------------------------------------------------
# Chain-engine oracle (all four joint types incl. quaternion ball/free)
# — serial f64 RNEA + Jacobian-composition cross-check for
# engine/chain.py.
# ---------------------------------------------------------------------------

_I64P = ctypes.POINTER(ctypes.c_int64)


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.int64))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


_JTYPE_CODE = {"hinge": 0, "slide": 1, "ball": 2, "free": 3}


def _chain_arrays(model):
    """Flatten a ChainModel into oracle arrays (all four joint types;
    per-DOF arrays use the engine's [nv]/[nq] layouts)."""
    types = model.joint_types
    jtype = _i64([_JTYPE_CODE[t] for t in types])
    nv = int(model.nv)
    parent = _i64(model.parent)
    return dict(
        n=len(types), nv=int(nv), parent=parent, jtype=jtype,
        axis=_c64(model.joint_axis), body_pos=_c64(model.body_pos),
        mass=_c64(model.mass), com=_c64(model.com),
        inertia=_c64(model.inertia).reshape(len(types), 9),
        armature=_c64(model.armature), damping=_c64(model.damping),
        stiffness=_c64(model.stiffness), gear=_c64(model.gear),
        qlow=_c64(model.qpos_low), qhigh=_c64(model.qpos_high),
        gravity=_c64(model.gravity))


def chain_mass_matrix(model, q) -> np.ndarray:
    lib = _load()
    a = _chain_arrays(model)
    out = np.empty((a["nv"], a["nv"]), np.float64)
    lib.chain_mass_matrix(a["n"], _iptr(a["parent"]), _iptr(a["jtype"]),
                          _ptr(a["axis"]), _ptr(a["body_pos"]),
                          _ptr(a["mass"]), _ptr(a["com"]),
                          _ptr(a["inertia"]), _ptr(_c64(q)), _ptr(out))
    return out


def chain_bias(model, q, qd) -> np.ndarray:
    lib = _load()
    a = _chain_arrays(model)
    out = np.empty(a["nv"], np.float64)
    lib.chain_bias(a["n"], _iptr(a["parent"]), _iptr(a["jtype"]),
                   _ptr(a["axis"]), _ptr(a["body_pos"]), _ptr(a["mass"]),
                   _ptr(a["com"]), _ptr(a["inertia"]), _ptr(a["gravity"]),
                   _ptr(_c64(q)), _ptr(_c64(qd)), _ptr(out))
    return out


def chain_site(model, q) -> np.ndarray:
    lib = _load()
    a = _chain_arrays(model)
    out = np.empty(3, np.float64)
    lib.chain_site(a["n"], _iptr(a["parent"]), _iptr(a["jtype"]),
                   _ptr(a["axis"]), _ptr(a["body_pos"]), _ptr(_c64(q)),
                   int(model.site_body), _ptr(_c64(model.site_pos)),
                   _ptr(out))
    return out


def chain_step(model, q, qd, ctrl, n_substeps: int = 1):
    """(q', qd') after n_substeps of the engine's semi-implicit Euler."""
    lib = _load()
    a = _chain_arrays(model)
    qo, qdo = _c64(q).copy(), _c64(qd).copy()
    lib.chain_step(a["n"], _iptr(a["parent"]), _iptr(a["jtype"]),
                   _ptr(a["axis"]), _ptr(a["body_pos"]), _ptr(a["mass"]),
                   _ptr(a["com"]), _ptr(a["inertia"]), _ptr(a["armature"]),
                   _ptr(a["damping"]), _ptr(a["stiffness"]),
                   _ptr(a["gear"]), _ptr(a["qlow"]), _ptr(a["qhigh"]),
                   _ptr(a["gravity"]), float(model.dt), int(n_substeps),
                   _ptr(_c64(ctrl)), _ptr(qo), _ptr(qdo))
    return qo, qdo


def chain_site_rollout(model, q0, qd0, mean, noise, n_substeps: int = 1,
                       ulow: float = -1.0, uhigh: float = 1.0,
                       site_body=None, site_pos=None) -> np.ndarray:
    """Site world positions [N, H, 3] along serial f64 open-loop rollouts
    with u[b,t] = clip(mean[t] + noise[b,t]) — the reference's serial
    per-particle hot loop (gym_env_wrapper.py:123-153) on the chain
    engine. Task costs are computed by the caller from the sites."""
    lib = _load()
    a = _chain_arrays(model)
    q0, qd0 = _c64(q0), _c64(qd0)
    mean, noise = _c64(mean), _c64(noise)
    n_p, h, _ = noise.shape
    sb = int(model.site_body if site_body is None else site_body)
    sp = _c64(model.site_pos if site_pos is None else site_pos)
    out = np.empty((n_p, h, 3), np.float64)
    lib.chain_site_rollout(
        a["n"], _iptr(a["parent"]), _iptr(a["jtype"]), _ptr(a["axis"]),
        _ptr(a["body_pos"]), _ptr(a["mass"]), _ptr(a["com"]),
        _ptr(a["inertia"]), _ptr(a["armature"]), _ptr(a["damping"]),
        _ptr(a["stiffness"]), _ptr(a["gear"]), _ptr(a["qlow"]),
        _ptr(a["qhigh"]), _ptr(a["gravity"]), float(model.dt),
        int(n_substeps), _ptr(q0), _ptr(qd0), _ptr(mean), _ptr(noise),
        n_p, h, float(ulow), float(uhigh), sb, _ptr(sp), _ptr(out))
    return out

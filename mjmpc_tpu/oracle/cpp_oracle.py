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

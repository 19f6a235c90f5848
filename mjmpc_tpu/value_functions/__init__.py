"""Value-function baselines (reference mjmpc/value_functions/).

All four reference baselines — Linear, Quadratic, LinearTimeVarying,
QuadraticTimeVarying — re-built as pure JAX: a params pytree plus
predict/fit functions. Fits are the reference's closed-form regularized
least squares (normal equations, torch.lstsq / batched torch.solve with
horizon as the batch dim) done with jnp.linalg.solve, including the
NaN-retry escalating-regularization loop (linear_val_func.py:48-56), so
fitting runs on-device inside the closed-loop MPC step.
"""
from .vf import (
    VFParams,
    make_vf,
    REGISTRY,
)

__all__ = ["VFParams", "make_vf", "REGISTRY"]

"""Learnable models (reference mjmpc/control/softqmpc/models/ +
mjmpc/utils/ensemble_model.py)."""
from .quadratic_q import QuadraticQFunc, QuadraticQParams
from .ensemble import EnsembleMLP, init_ensemble
from .mlp import MLPPolicy

__all__ = ["QuadraticQFunc", "QuadraticQParams", "EnsembleMLP",
           "init_ensemble", "MLPPolicy"]

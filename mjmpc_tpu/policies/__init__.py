"""Policy API (reference mjmpc/policies/)."""
from .base import Policy
from .mpc_policy import MPCPolicy
from .random_policy import RandomPolicy
from .linear_gaussian import (
    LinearGaussianPolicy,
    LGPolicyParams,
)

__all__ = ["Policy", "MPCPolicy", "RandomPolicy", "LinearGaussianPolicy",
           "LGPolicyParams"]

"""RL sidecar: SAC + SAC-guided MPC (reference mjmpc/control/softqmpc,
SURVEY.md §2.7)."""
from .replay import ReplayMemory, ReplayMemoryTraj
from .sac import SAC, SACParams, GaussianPolicy, QNetwork
from .sac_mpc import SACMPC

__all__ = ["ReplayMemory", "ReplayMemoryTraj", "SAC", "SACParams",
           "GaussianPolicy", "QNetwork", "SACMPC"]

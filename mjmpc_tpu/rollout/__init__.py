from .engine import Trajectories, rollout_open_loop, rollout_closed_loop_linear, make_rollout_fn

__all__ = ["Trajectories", "rollout_open_loop", "rollout_closed_loop_linear",
           "make_rollout_fn"]

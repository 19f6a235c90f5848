"""Experiment harness: reference-schema YAML configs, episode runners,
tune/sweep jobs (reference examples/)."""
from .config import load_config, solver_params_from_config, make_solver_for_env
from .episode import run_episodes
from .checkpoint import save_solver_state, load_solver_state

__all__ = ["load_config", "solver_params_from_config", "make_solver_for_env",
           "run_episodes", "save_solver_state", "load_solver_state"]

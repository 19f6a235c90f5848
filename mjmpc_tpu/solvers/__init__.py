"""Solver registry (reference mjmpc/control/__init__.py:1-18 +
mpc_policy.py factory)."""
from .base import GaussianMPC, GaussianState, build_solve_fn, evaluate_episode
from .mppi import MPPI
from .mppiq import MPPIQ
from .random_shooting import RandomShooting
from .cem import CEM
from .dmd import DMDMPC
from .pfmpc import PFMPC, PFState
from .pfmpc import build_solve_fn as build_pf_solve_fn
from .reinforce import Reinforce, ReinforceState
from .reinforce import build_solve_fn as build_reinforce_solve_fn
from .softq import SoftQMPC, SoftQState
from .softq import build_solve_fn as build_softq_solve_fn
from .random_shooting_nn import RandomShootingNN, RSNNState
from .random_shooting_nn import build_solve_fn as build_rsnn_solve_fn
from .ilqr import ILQR, ILQRState
from .ilqr import build_solve_fn as build_ilqr_solve_fn
from .base import build_optimal_value_fn, guard_finite

REGISTRY = {
    "mppi": MPPI,
    "mppiq": MPPIQ,
    "random_shooting": RandomShooting,
    "cem": CEM,
    "dmd": DMDMPC,
    "gaussian_dmd": DMDMPC,
    "pfmpc": PFMPC,
    "reinforce": Reinforce,
    "softqmpc": SoftQMPC,
    "softq": SoftQMPC,  # the reference configs' section name
                        # (examples/configs/classic_control/cartpole-v0.yml)
    "random_shooting_nn": RandomShootingNN,
    "ilqr": ILQR,
}


def make_solver(name: str, **params):
    if name not in REGISTRY:
        raise ValueError(f"unknown controller {name!r}; known: {sorted(REGISTRY)}")
    return REGISTRY[name](**params)


def make_solve_fn(solver, env, **kwargs):
    """Dispatch to the right solve builder for the solver family."""
    if not isinstance(solver, (GaussianMPC, Reinforce, PFMPC)):
        # fused fast paths: GaussianMPC's + PFMPC's costs-only open-loop
        # kernel, Reinforce's closed-loop-linear kernel; other families
        # must not swallow an explicit fused=False (dyn-randomized
        # planning)
        kwargs.pop("fused", None)
    if isinstance(solver, PFMPC):
        kwargs.pop("calc_val", None)
        return build_pf_solve_fn(solver, env, **kwargs)
    if isinstance(solver, Reinforce):
        kwargs.pop("calc_val", None)
        kwargs.pop("hotstart", None)  # reference _shift is a no-op
        return build_reinforce_solve_fn(solver, env, **kwargs)
    if isinstance(solver, SoftQMPC):
        kwargs.pop("calc_val", None)
        kwargs.pop("hotstart", None)  # reference _shift is a no-op
        return build_softq_solve_fn(solver, env, **kwargs)
    if isinstance(solver, RandomShootingNN):
        kwargs.pop("calc_val", None)
        kwargs.pop("hotstart", None)
        return build_rsnn_solve_fn(solver, env, **kwargs)
    if isinstance(solver, ILQR):
        kwargs.pop("calc_val", None)
        kwargs.pop("hotstart", None)
        kwargs.pop("shard_particles", None)  # iLQR is not particle-based
        return build_ilqr_solve_fn(solver, env, **kwargs)
    return build_solve_fn(solver, env, **kwargs)


__all__ = [
    "GaussianMPC", "GaussianState", "build_solve_fn", "evaluate_episode",
    "MPPI", "MPPIQ", "RandomShooting", "CEM", "DMDMPC", "PFMPC", "PFState",
    "Reinforce", "ReinforceState", "SoftQMPC", "SoftQState",
    "RandomShootingNN", "RSNNState", "build_optimal_value_fn",
    "ILQR", "ILQRState", "guard_finite",
    "REGISTRY", "make_solver", "make_solve_fn",
]

"""Environment registry.

Replaces the reference's gym registration table
(/root/reference/mjmpc/envs/__init__.py:5-37) with a factory map over
pure-function envs. MuJoCo-backed tasks (reacher_7dof, sawyer suite) run on
the in-repo Featherstone articulated-body engine instead of mujoco_py.
"""
from __future__ import annotations

from typing import Callable, Dict

from .base import Env
from .randomize import (randomize_dynamics, randomize_batch,
                        register_names, register_param_paths)
from .wrappers import normalize_obs, frame_stack
from . import pendulum, lqr, point_mass, cartpole

_REGISTRY: Dict[str, Callable[..., Env]] = {
    "SimplePendulum-v0": pendulum.make,
    "LQR-v0": lqr.make,
    "point_mass-v0": point_mass.make,
    "cartpole-v0": cartpole.make,
}


def register(name: str, factory: Callable[..., Env]) -> None:
    _REGISTRY[name] = factory


_CACHE: Dict[str, Env] = {}


def make(name: str, **kwargs) -> Env:
    """Build (or fetch) an env. No-kwarg envs are cached per name: Env
    is an immutable bundle of pure functions + param pytree, and reusing
    the same instance keeps jit/pallas compilation caches warm — the
    hand-suite fused kernels (ops/pallas_forest.py) are expensive to
    compile, and a fresh `make` per call would rebuild distinct closures
    that miss every cache."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown env {name!r}; known: {sorted(_REGISTRY)}")
    if not kwargs:
        env = _CACHE.get(name)
        if env is None:
            env = _CACHE[name] = _REGISTRY[name]()
        return env
    return _REGISTRY[name](**kwargs)


def available() -> list:
    return sorted(_REGISTRY)


def _register_deferred():
    """Envs with heavier deps are registered lazily at import of this pkg."""
    try:
        from . import reacher_7dof
        _REGISTRY.setdefault("reacher_7dof-v0", reacher_7dof.make)
        _REGISTRY.setdefault("continual_reacher-v0", reacher_7dof.make_continual)
    except ImportError:
        pass
    try:
        from . import acrobot
        _REGISTRY.setdefault("acrobot-v0", acrobot.make)
    except ImportError:
        pass
    try:
        from . import swimmer
        _REGISTRY.setdefault("Swimmer-v0", swimmer.make)
    except ImportError:
        pass
    try:
        from . import half_cheetah
        _REGISTRY.setdefault("HalfCheetah-v0", half_cheetah.make)
    except ImportError:
        pass
    try:
        from . import sawyer_tasks, reacher_7dof
        _REGISTRY.setdefault("sawyer_reacher-v0", reacher_7dof.make)
        _REGISTRY.setdefault("sawyer_pusher-v0", sawyer_tasks.make_pusher)
        # the reference's sawyer pusher config names the env 'pusher-v0'
        # (examples/configs/sawyer/pusher-v0.yml:1)
        _REGISTRY.setdefault("pusher-v0", sawyer_tasks.make_pusher)
        _REGISTRY.setdefault("sawyer_door-v0", sawyer_tasks.make_door)
        _REGISTRY.setdefault("sawyer_peg_insertion-v0",
                             sawyer_tasks.make_peg_insertion)
        _REGISTRY.setdefault("sawyer_peg_insertion-v1",
                             sawyer_tasks.make_peg_insertion_v1)
    except ImportError:
        pass
    try:
        from . import pen
        _REGISTRY.setdefault("pen-v0", pen.make)
    except ImportError:
        pass
    try:
        from . import hand_door
        _REGISTRY.setdefault("door-v0", hand_door.make)
    except ImportError:
        # No fallback: hand_door exists, so an ImportError here is a
        # real bug (e.g. a broken transitive import in adroit/contact) —
        # silently serving the arm-door env with different d_obs/d_action
        # would turn it into confusing downstream shape errors.
        pass
    try:
        from . import relocate
        _REGISTRY.setdefault("relocate-v0", relocate.make)
    except ImportError:
        pass
    try:
        from . import hammer
        _REGISTRY.setdefault("hammer-v0", hammer.make)
    except ImportError:
        pass
    try:
        from . import maze
        _REGISTRY.setdefault("maze-v0", maze.make)
        _REGISTRY.setdefault("continual_maze-v0", maze.make_continual)
    except ImportError:
        pass
    try:
        from . import trajopt_reacher
        _REGISTRY.setdefault("trajopt_reacher-v0", trajopt_reacher.make)
    except ImportError:
        pass
    try:
        from . import panda_tasks
        _REGISTRY.setdefault("panda_tray_glass-v0", panda_tasks.make)
        _REGISTRY.setdefault("panda_tray_glass-v1", panda_tasks.make_v1)
        _REGISTRY.setdefault("panda_tray_glass_fixed-v1",
                             panda_tasks.make_fixed_v1)
        _REGISTRY.setdefault("panda_reacher-v0", reacher_7dof.make)
    except ImportError:
        pass
    # the reference's point_mass config names the mjrl-registered id
    # (examples/configs/point_mass-v0.yml:1)
    _REGISTRY.setdefault("mjrl_point_mass-v0", point_mass.make)


_register_deferred()

__all__ = ["Env", "make", "register", "available",
           "randomize_dynamics", "randomize_batch", "register_names",
           "register_param_paths", "normalize_obs", "frame_stack"]

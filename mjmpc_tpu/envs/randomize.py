"""Dynamics randomization: perturb the model-params pytree.

Reference GymEnvWrapper.randomize_dynamics
(/root/reference/mjmpc/envs/gym_env_wrapper.py:367-416): for each
(field, name) with [noise_scale, bias_scale], the value becomes
    biased_mean = (1 + bias_scale) * default
    new ~ U(biased_mean * (1 - noise_scale), biased_mean * (1 + noise_scale))
with defaults cached so repeated randomization never drifts
(tests/dynamics_randomization_test.py).

Here dynamics live in an explicit params pytree, so randomization is a
pure params -> params transform:
- `randomize_dynamics`: one perturbed Env (the reference's per-experiment
  model-mismatch setup);
- `randomize_batch`: a STACKED batch of perturbed param pytrees for
  vmapped domain-randomized rollouts — every particle can see a different
  model, a capability the reference's per-process mutation cannot express.

Field addressing: 'path' strings into the params NamedTuple (e.g.
"model.mass"), plus per-env name->index tables for MuJoCo-style names
(body_mass/r_forearm_roll_link etc. map onto ChainModel rows).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Env
from ..engine.chain import _JOINT_NV

# MuJoCo-style field -> ChainModel attribute (the reference's field set,
# gym_env_wrapper.py:377-400: body_mass/body_inertia/dof_damping/
# dof_frictionloss/geom_size/geom_friction/sensor_noise). Envs whose
# contact model exposes its own friction/geometry leaves register
# geom_friction -> mu and geom_size -> radius paths via
# `register_param_paths` (checked FIRST in _resolve); this table is the
# chain-level fallback, where geom_friction degrades to the viscous
# damping of the named contact DOF (docs/PARITY.md: penalty contact).
_CHAIN_FIELDS = {
    "body_mass": "mass",
    "body_inertia": "inertia",
    "dof_damping": "damping",
    "dof_frictionloss": "frictionloss",
    "dof_armature": "armature",
    "actuator_gear": "gear",
    "geom_friction": "damping",
}

# per-env name tables (index into the chain)
_NAME_TABLES: Dict[str, Dict[str, int]] = {}

# per-env (field, name) -> params-path tables for NON-chain parameters
# (analytic envs like cartpole; sensor-noise leaves)
_PARAM_PATHS: Dict[str, Dict[str, Dict[str, str]]] = {}


def register_param_paths(env_name: str,
                         mapping: Dict[str, Dict[str, str]]) -> None:
    """Map reference dyn-randomize (field, name) pairs onto arbitrary
    params-pytree paths, for envs whose dynamics are not a ChainModel
    (e.g. cartpole-v0: body_mass/cart -> 'masscart') or for sensor
    fields (sensor_noise/target_pos -> 'sensor_bias')."""
    _PARAM_PATHS.setdefault(env_name, {}).update(
        {f: dict(names) for f, names in mapping.items()})


def register_names(env_name: str, body_names, joint_names=None,
                   extra=None) -> None:
    """Register the body/joint name -> chain-row tables for an env.
    `extra` maps additional MuJoCo-style names (geom names, alternate
    spellings in the reference's dyn-randomize YAMLs) onto rows."""
    table = {n: i for i, n in enumerate(body_names)}
    for i, n in enumerate(joint_names or []):
        table.setdefault(n, i)
    table.update(extra or {})
    _NAME_TABLES[env_name] = table


def _get_path(obj, path: str):
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _set_path(obj, path: str, value):
    """Functionally replace a nested NamedTuple field."""
    parts = path.split(".")
    if len(parts) == 1:
        return obj._replace(**{parts[0]: value})
    child = getattr(obj, parts[0])
    return obj._replace(**{parts[0]: _set_path(child, ".".join(parts[1:]),
                                               value)})


def _resolve(env: Env, field: str, name: str) -> Tuple[str, Optional[int]]:
    """(params path, row index or None) for a (field, name) pair."""
    paths = _PARAM_PATHS.get(env.name, {})
    if field in paths and name in paths[field]:
        return paths[field][name], None
    if field in _CHAIN_FIELDS:
        table = _NAME_TABLES.get(env.name)
        if table is None or name not in table:
            raise ValueError(
                f"no name table entry for {name!r} in env {env.name!r}")
        attr = _CHAIN_FIELDS[field]
        row = table[name]
        if attr in ("damping", "armature", "gear", "frictionloss"):
            # per-DOF arrays are [nv]; with quaternion joints a body row
            # spans a slice of velocity DOFs, not a single entry
            model = getattr(env.params, "model", None)
            if model is not None and hasattr(model, "v_offsets"):
                voff = model.v_offsets
                width = _JOINT_NV[model.joint_types[row]]
                if width > 1 or voff[row] != row:
                    return "model." + attr, slice(voff[row],
                                                  voff[row] + width)
        return "model." + attr, row
    if field == "params":  # direct attribute of the params tuple
        return name, None
    raise ValueError(f"unknown dynamics field {field!r}")


def _perturb(default: np.ndarray, dist_params, rng) -> np.ndarray:
    noise_scale, bias_scale = dist_params
    biased = (1.0 + bias_scale) * default
    return rng.uniform(biased - biased * noise_scale,
                       biased + biased * noise_scale)


def randomize_dynamics(env: Env, param_dict: Dict[str, Dict[str, Any]],
                       base_seed: int = 0):
    """Perturbed Env + (default, randomized) value dicts.

    param_dict: {field: {name: [noise_scale, bias_scale]}} — the
    reference's YAML schema (configs/dyn_randomize_configs/*).
    """
    rng = np.random.RandomState(base_seed)
    params = env.params
    defaults: Dict[str, Dict[str, np.ndarray]] = {}
    randomized: Dict[str, Dict[str, np.ndarray]] = {}

    for field, names in param_dict.items():
        defaults[field] = {}
        randomized[field] = {}
        for name, dist in names.items():
            try:
                path, idx = _resolve(env, field, name)
            except ValueError:
                # A [0, 0] spec means "keep the default" regardless of
                # where the value lives — tolerate unmapped names for
                # exactly that case (the reference's cartpole dyn config
                # lists zeroed axes for params its own model lacks too).
                if float(dist[0]) == 0.0 and float(dist[1]) == 0.0:
                    defaults[field][name] = None
                    randomized[field][name] = None
                    continue
                raise
            arr = np.asarray(_get_path(params, path))
            cur = arr[idx] if idx is not None else arr
            defaults[field][name] = np.array(cur, copy=True)
            new_val = _perturb(np.asarray(cur, np.float64), dist, rng)
            new_arr = np.array(arr, copy=True)
            if idx is not None:
                new_arr[idx] = new_val
            else:
                new_arr = np.asarray(new_val, arr.dtype)
            randomized[field][name] = np.asarray(new_val)
            params = _set_path(params, path,
                               jnp.asarray(new_arr, jnp.asarray(arr).dtype))

    return env.with_params(params), defaults, randomized


def randomize_batch(env: Env, param_dict, base_seed: int, n: int):
    """n independently perturbed param pytrees, stacked on a leading axis
    (feed to vmapped/sharded episode evaluation)."""
    perturbed = [randomize_dynamics(env, param_dict, base_seed + i * 12345)[0]
                 .params for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *perturbed)

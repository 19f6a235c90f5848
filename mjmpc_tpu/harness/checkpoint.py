"""Solver-state checkpoint/resume.

The reference has no mid-run checkpointing (SURVEY.md §5); its nearest
artifacts are trajectory pickles + per-sweep JSON. Here any solver state
(mean/cov/particles/Q params/PRNG key — an arbitrary pytree of arrays)
round-trips through a single .npz plus a structure manifest, so an MPC
run, sweep cell, or training loop can resume exactly.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_solver_state(path: str, state: Any, metadata: dict = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    manifest = dict(treedef=str(treedef), n_leaves=len(leaves),
                    metadata=metadata or {})
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=2)


def load_solver_state(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (an example state pytree)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    with open(_manifest_path(path)) as f:
        manifest = json.load(f)
    if manifest["n_leaves"] != n:
        raise ValueError(
            f"checkpoint has {manifest['n_leaves']} leaves, expected {n}")
    leaves = [jnp.asarray(npz[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _manifest_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".manifest.json"

"""Articulated rigid-body dynamics engine (the reference's mujoco_py role,
re-built as pure JAX; SURVEY.md §2.9)."""
from . import chain
from .chain import (
    ChainModel,
    bias_forces,
    build_chain,
    capsule_geom,
    combine_geoms,
    forward_kinematics,
    kinetic_energy,
    mass_matrix,
    point_force_to_generalized,
    potential_energy,
    site_position,
    sphere_geom,
    step,
)

__all__ = [
    "chain", "ChainModel", "forward_kinematics", "site_position",
    "mass_matrix", "kinetic_energy", "bias_forces", "potential_energy",
    "point_force_to_generalized", "step",
    "sphere_geom", "capsule_geom", "combine_geoms", "build_chain",
]

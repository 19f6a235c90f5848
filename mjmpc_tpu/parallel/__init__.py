"""Device-mesh parallelism: the reference's SubprocVecEnv layer as SPMD.

See SURVEY.md §2.5 / §5 for the mapping from multiprocessing pipes to
mesh collectives.
"""
from .mesh import (
    EPISODES_AXIS,
    PARTICLES_AXIS,
    episode_sharding,
    initialize_multihost,
    make_mesh,
    pad_particles,
    particle_sharding,
    replicated,
)
from .sharded import (
    build_batch_episode_fn,
    build_sharded_episode_fn,
    build_sharded_solve_fn,
)

__all__ = [
    "EPISODES_AXIS", "PARTICLES_AXIS", "make_mesh", "particle_sharding",
    "episode_sharding", "replicated", "pad_particles", "initialize_multihost",
    "build_sharded_solve_fn", "build_sharded_episode_fn",
    "build_batch_episode_fn",
]

"""The harness must consume the REFERENCE's own config files unmodified
(harness/config.py contract): every *.yml under the reference's
examples/configs/ either loads as an experiment config (env resolves,
every controller section builds a solver, a 1-step episode runs) or
applies as a dynamics-randomization spec. Skipped when the reference
checkout is not mounted."""
import dataclasses
import glob
import os

import pytest

from mjmpc_tpu import envs, solvers
from mjmpc_tpu.harness import config as cfg
from mjmpc_tpu.harness.episode import run_episodes

_REF = "/root/reference/examples/configs"

# dyn-randomize specs (no env_name key) -> the env they parameterize
_DYN_ENV = {
    "classic_control/cartpole_dyn_randomize.yml": "cartpole-v0",
    "dyn_randomize_configs/hand/hammer-v0.yml": "hammer-v0",
    "dyn_randomize_configs/hand/pen-v0.yml": "pen-v0",
    "dyn_randomize_configs/panda/tray_glass-v1.yml": "panda_tray_glass-v1",
    "dyn_randomize_configs/sawyer/peg_insertion-v0.yml":
        "sawyer_peg_insertion-v0",
    "dyn_randomize_configs/sawyer/peg_insertion-v1.yml":
        "sawyer_peg_insertion-v1",
    "dyn_randomize_configs/sawyer/pusher-v0.yml": "sawyer_pusher-v0",
}

# closed-loop config sections that are NOT open-loop controller names
_CL_SECTIONS = {"actor_params", "critic_params"}


def _all_yml():
    if not os.path.isdir(_REF):
        return []
    return sorted(os.path.relpath(p, _REF) for p in
                  glob.glob(os.path.join(_REF, "**", "*.yml"),
                            recursive=True))


def _is_dyn(rel):
    return rel in _DYN_ENV


_EXPERIMENT = [r for r in _all_yml() if not _is_dyn(r)]
_DYN = [r for r in _all_yml() if _is_dyn(r)]


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference checkout not mounted")
def test_full_reference_matrix_is_enumerated():
    # the reference ships 28 yml files: 21 experiment + 7 dyn-randomize
    assert len(_EXPERIMENT) + len(_DYN) == 28
    assert len(_DYN) == 7


@pytest.mark.parametrize("rel", _EXPERIMENT)
def test_reference_experiment_config(rel):
    exp = cfg.load_config(os.path.join(_REF, rel))
    env = envs.make(exp["env_name"])

    sections = [k for k in exp
                if k in solvers.REGISTRY and isinstance(exp[k], dict)]
    assert sections, f"{rel} has no recognizable controller section"

    built = {}
    for name in sections:
        solver = cfg.make_solver_for_env(exp, name, env)
        # worker-pool folding: num_cpu x particles_per_cpu
        sec = exp[name]
        if "num_cpu" in sec and "particles_per_cpu" in sec:
            ncpu = cfg._scalarize("num_cpu", sec["num_cpu"])
            ppc = cfg._scalarize("particles_per_cpu",
                                 sec["particles_per_cpu"])
            assert solver.num_particles == int(ncpu) * int(ppc)
        built[name] = solver

    # 1-step episode on the FIRST controller, shrunk to CI scale (the
    # config's own horizon/particle counts are asserted above; running
    # them full-size on the CPU mesh is a benchmark, not a load test)
    solver = built[sections[0]]
    small = dict(horizon=4, num_particles=8)
    small = {k: v for k, v in small.items()
             if hasattr(solver, k)}
    solver = dataclasses.replace(solver, **small)

    sim_env = None
    if "sim_env_name" in exp and exp["sim_env_name"] != exp["env_name"]:
        sim_env = envs.make(exp["sim_env_name"])
    out = run_episodes(solver, env, n_episodes=1, episode_length=1,
                       base_seed=exp.get("seed", 0), sim_env=sim_env)
    assert out["rewards"].shape == (1, 1)


@pytest.mark.parametrize("rel", _DYN)
def test_reference_dyn_randomize_config(rel):
    import yaml

    with open(os.path.join(_REF, rel)) as f:
        spec = yaml.safe_load(f)
    env = envs.make(_DYN_ENV[rel])
    rand_env, defaults, randomized = envs.randomize_dynamics(
        env, spec, base_seed=123)
    assert set(defaults) == set(spec)
    # every non-zero axis actually moved the parameter
    for field, names in spec.items():
        for name, dist in names.items():
            if randomized[field][name] is None:
                assert float(dist[0]) == 0.0 and float(dist[1]) == 0.0
                continue
            if float(dist[0]) != 0.0 or float(dist[1]) != 0.0:
                import numpy as np
                assert not np.allclose(randomized[field][name],
                                       defaults[field][name])

"""Closed-loop MPC driver (reference examples/example_mpc_cl.py).

Builds the linear-Gaussian actor + one of the four value-function critics
from the config's actor_params/critic_params sections
(example_mpc_cl.py:84-96) and runs the closed-loop controller (reinforce)
with the baseline fit inside every on-device solve. Tracks the per-episode
baseline fit error the reference logs (example_mpc_cl.py:153).

Usage:
    python -m mjmpc_tpu.harness.run_mpc_cl --config cfg.yml \
        [--controller reinforce] [--save_dir /tmp]
"""
from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import numpy as np

from .. import envs, solvers
from ..utils import get_logger, timeit
from . import config as cfg
from .episode import build_episode_fn


def build_cl_solver(exp_params, controller_name, env):
    params = cfg.solver_params_from_config(exp_params, controller_name, env)
    actor = exp_params.get("actor_params", {})
    critic = exp_params.get("critic_params", {})
    if actor.get("actor_type", "linear_gaussian") != "linear_gaussian":
        raise ValueError("only linear_gaussian actor is supported "
                         "(reference example_mpc_cl.py:84-90)")
    init_log_std = float(actor.get("init_log_std", 0.0))
    params.setdefault("init_cov", float(np.exp(2.0 * init_log_std)))
    # critic_type names match value_functions.REGISTRY directly
    params["baseline_type"] = critic.get("critic_type")
    return solvers.make_solver(controller_name, **params)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Closed-loop MPC driver")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--controller", type=str, default="reinforce")
    parser.add_argument("--save_dir", type=str, default="/tmp")
    args = parser.parse_args(argv)

    exp_params = cfg.load_config(args.config)
    env = envs.make(exp_params["env_name"])
    date_time = datetime.now().strftime("%m_%d_%Y_%H_%M_%S")

    results = {}
    for controller_name in args.controller.split(","):
        controller_name = controller_name.strip()
        log_dir = os.path.join(args.save_dir, exp_params["env_name"],
                               date_time, controller_name + "_cl")
        os.makedirs(log_dir, exist_ok=True)
        logger = get_logger(
            f"{controller_name}_cl_{exp_params['env_name']}", log_dir)

        solver = build_cl_solver(exp_params, controller_name, env)
        episode = build_episode_fn(solver, env,
                                   exp_params["max_ep_length"])
        run = jax.jit(lambda key: episode(env.params, env.params, key))

        n_episodes = exp_params["n_episodes"]
        base_seed = exp_params["seed"]
        ep_rewards = np.zeros(n_episodes)
        fit_errors = np.zeros(n_episodes)
        timeit.start("cl_" + controller_name)
        for i in range(n_episodes):
            out, final_state = run(
                jax.random.PRNGKey(base_seed + i * 12345))
            ep_rewards[i] = float(np.asarray(out["reward"]).sum())
            fit_errors[i] = float(getattr(final_state, "fit_error", 0.0))
            logger.info("episode %d reward %.3f baseline fit err %.4f",
                        i, ep_rewards[i], fit_errors[i])
        timeit.stop("cl_" + controller_name)

        logger.record_tabular("EpisodeReward", ep_rewards.tolist())
        logger.record_tabular("AverageReward", float(ep_rewards.mean()))
        logger.record_tabular("StdReward", float(ep_rewards.std()))
        logger.record_tabular("AvgBaselineFitError",
                              float(fit_errors.mean()))
        logger.record_tabular("NumEpisodes", n_episodes)
        logger.dump_tabular()
        logger.info("\n%s", timeit.report())
        results[controller_name] = dict(ep_rewards=ep_rewards,
                                        fit_errors=fit_errors)
    return results


if __name__ == "__main__":
    main()

#!/bin/bash
# Serial on-chip queue: tunes (door/relocate/hammer-dmd), learned-Q demo,
# softq diagnosis. ONE process at a time (CLAUDE.md gotcha).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 4000 python -m mjmpc_tpu.harness.jobs --config configs/tune/door-v0.yml --controller mppi --save_dir measurements/r05/tune
timeout 4000 python -m mjmpc_tpu.harness.jobs --config configs/tune/relocate-v0.yml --controller mppi --save_dir measurements/r05/tune
timeout 4000 python -m mjmpc_tpu.harness.jobs --config configs/tune/hammer-v0.yml --controller dmd --save_dir measurements/r05/tune
timeout 5400 python -m mjmpc_tpu.harness.sacq_eval --env reacher_7dof-v0 --train_steps 7500 --episode_length 75 --horizon 8 --num_particles 512 --episodes 5 --updates_per_step 4 --td_lam 0.9
timeout 1800 python -m mjmpc_tpu.harness.softq_diag --steps 75
timeout 1800 python -m mjmpc_tpu.harness.softq_diag --steps 75 --whiten

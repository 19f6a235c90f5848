#!/bin/bash
# Serial on-chip queue: sweep rows for the controller blocks added to
# the hand configs in r05 (reference block parity). ONE process at a
# time (CLAUDE.md gotcha).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/hammer-v0.yml --controller cem --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/relocate-v0.yml --controller cem --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/door-v0.yml --controller dmd --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/relocate-v0.yml --controller dmd --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/hammer-v0.yml --controller random_shooting --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/relocate-v0.yml --controller random_shooting --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/door-v0.yml --controller random_shooting --save_dir measurements/r05/newblocks
timeout 2400 python -m mjmpc_tpu.harness.jobs --config configs/hand/door-v0.yml --controller pfmpc --save_dir measurements/r05/newblocks

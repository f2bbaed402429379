#!/usr/bin/env bash
# Multi-host TPU launch (the reference's sbatch.sh equivalent; reference:
# sbatch-4.sh / sbatch-256.sh). Run THIS SAME command on every host of the
# TPU slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):
#
#   scripts/launch-multihost.sh configs/config-4.yaml [extra overrides...]
#
# jax.distributed.initialize() (enabled by mesh.multihost=true) picks up the
# TPU pod coordinator automatically; batches are sharded per host by
# jax.process_index()/process_count() and gradients all-reduce over ICI.
set -euo pipefail
CONFIG="${1:-configs/config.yaml}"
shift || true
exec python train.py --config "$CONFIG" mesh.multihost=true "$@"

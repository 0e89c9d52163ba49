#!/usr/bin/env bash
# Multi-host training launch on a Cloud TPU pod slice — the TPU counterpart
# of the reference's single-GPU Slurm launcher (scripts/train/train.sbatch).
#
# Runs the SAME train CLI on every pod worker; `jax: {distributed: true}` in
# the config (utils/config.py::apply_jax_settings) calls
# jax.distributed.initialize() per host (args auto-detect on Cloud TPU),
# after which the trainer's default mesh spans all chips and TrainLoader
# feeds each host its disjoint slice of every global batch
# (data/loader.py lockstep-SPMD semantics).
#
# Usage:
#   scripts/tpu/train_pod.sh <tpu-name> <zone> <config.yaml> [--mode tss_spe ...]
#
# The config must be readable at the same path on every worker (bake it into
# the image, or scp it first). Batch size is GLOBAL and must divide by the
# number of hosts.
set -euo pipefail

TPU_NAME=${1:?tpu-vm name}
ZONE=${2:?gcp zone}
CONFIG=${3:?config yaml path (on the workers)}
shift 3

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
  --worker=all --command \
  "cd \$(dirname ${CONFIG}) && python -m tss_dprnn_tpu.cli.train \
     --config ${CONFIG} --set jax.distributed=true $*"

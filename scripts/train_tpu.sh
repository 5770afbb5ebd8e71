#!/bin/bash
# Multi-host TPU training launcher (equivalent of the reference's SLURM
# train.sh).  Run the same command on every host of the slice; JAX picks up
# the TPU topology via jax.distributed (auto-initialized on Cloud TPU VMs).
#
# Usage (per host, e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):
#   bash scripts/train_tpu.sh configs/mdlm.yaml data.path=/data/encodings
set -euo pipefail

CONFIG="${1:?usage: train_tpu.sh <config.yaml> [overrides...]}"
shift

export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
exec python -m esmdiff_tpu.cli.train --config "${CONFIG}" "$@"

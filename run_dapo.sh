#!/usr/bin/env bash
# Launch training (reference run_dapo.sh parity). On TPU there is no
# accelerate/DeepSpeed/NCCL layer: one process drives the whole mesh via
# SPMD, so the NCCL watchdog env and --num_processes topology disappear.
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

export JAX_PLATFORMS="${JAX_PLATFORMS:-}"      # default: auto-detect TPU
CONFIG="${CONFIG:-configs/lapha.yaml}"

exec python run_dapo.py --config "$CONFIG" "$@"

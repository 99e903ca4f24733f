#!/usr/bin/env bash
# Wrapper for the checkpoint splitter (reference helpers/split_valuehead.sh):
#   SRC=<orbax-ckpt-or-hf-wrapper-dir> CONFIG_DIR=<hf-dir> OUT=<policy-dir> ./split_valuehead.sh
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
exec python scripts/split_valuehead.py \
  --src "${SRC:?set SRC}" \
  ${CONFIG_DIR:+--config-dir "$CONFIG_DIR"} \
  --out "${OUT:?set OUT}"

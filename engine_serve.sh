#!/usr/bin/env bash
# Start the generation server (reference vllm_start.sh parity). Writes the
# server address file the way the reference does (vllmServer_addr.txt).
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"
MODEL="${MODEL:?set MODEL to the HF model dir}"
HOST="${HOST:-0.0.0.0}"
PORT="${PORT:-8000}"
MAX_MODEL_LEN="${MAX_MODEL_LEN:-4096}"
echo "http://${HOST}:${PORT}" > vllmServer_addr.txt
exec python -m lapha_tpu.engine.server --model "$MODEL" --host "$HOST" \
  --port "$PORT" --max-model-len "$MAX_MODEL_LEN"

#!/usr/bin/env bash
# Supervisor (reference train.sh parity): starts the tool RPC server and the
# trainer in separate process groups, polls cmd.txt every 5s for
# stop/restart, kills both groups on either's death, STOP mode awaits
# 'restart'. There is no vLLM server process to babysit — generation is
# in-process on the mesh.
set -uo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

CMD_FILE="${CMD_FILE:-cmd.txt}"
TOOL_PORT="${TOOL_PORT:-8001}"
LOG_DIR="${LOG_DIR:-out/supervisor}"
# poll / TERM->KILL intervals (reference uses 5s for both; overridable so
# tests/test_supervisor.py can drive the state machine in sub-second time)
POLL_S="${POLL_S:-5}"
KILL_WAIT_S="${KILL_WAIT_S:-5}"
# the supervised commands (overridable for the same reason)
TOOL_CMD="${TOOL_CMD:-python -m lapha_tpu.tools.server --port $TOOL_PORT}"
TRAINER_CMD="${TRAINER_CMD:-bash run_dapo.sh}"
mkdir -p "$LOG_DIR"
: > "$CMD_FILE"

tool_pgid=""
trainer_pgid=""

start_tool_server() {
  setsid bash -c "$TOOL_CMD" > "$LOG_DIR/tool_server.log" 2>&1 &
  tool_pgid=$!
  echo "[supervisor] tool server pgid=$tool_pgid"
}

start_trainer() {
  setsid bash -c "$TRAINER_CMD" > "$LOG_DIR/trainer.log" 2>&1 &
  trainer_pgid=$!
  echo "[supervisor] trainer pgid=$trainer_pgid"
}

kill_group() {
  local pgid="$1"
  [[ -z "$pgid" ]] && return 0
  kill -TERM -- "-$pgid" 2>/dev/null || true
  sleep "$KILL_WAIT_S"
  kill -KILL -- "-$pgid" 2>/dev/null || true
}

stop_all() {
  kill_group "$trainer_pgid"; trainer_pgid=""
  kill_group "$tool_pgid"; tool_pgid=""
}

trap 'stop_all; exit 0' INT TERM

start_tool_server
start_trainer

state="RUN"
while true; do
  sleep "$POLL_S"
  cmd="$(cat "$CMD_FILE" 2>/dev/null | tr -d '[:space:]')"
  if [[ "$cmd" == "stop" ]]; then
    echo "[supervisor] stop requested"
    stop_all
    state="STOP"
    : > "$CMD_FILE"
  elif [[ "$cmd" == "restart" ]]; then
    echo "[supervisor] restart requested"
    stop_all
    start_tool_server
    start_trainer
    state="RUN"
    : > "$CMD_FILE"
  fi

  if [[ "$state" == "RUN" ]]; then
    if ! kill -0 "$trainer_pgid" 2>/dev/null; then
      echo "[supervisor] trainer died -> killing all, entering STOP (write 'restart' to $CMD_FILE)"
      stop_all
      state="STOP"
    fi
  fi
done

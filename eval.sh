#!/usr/bin/env bash
# eval.sh — Orchestrate rollout and scoring (reference-compatible env surface).
# Usage:
#   ./eval.sh            # all datasets
#   ./eval.sh aime25     # single dataset
# Env knobs (policy):
#   TOKENIZER_PATH, MAX_NEW_TOKENS, TEMPERATURE, TOP_P, TOP_K, REPETITION_PENALTY, MIN_P
#   ENGINE=tpu (native AR; "vllm" maps to it; "jet" = native block-diffusion
#     engine — SDAR_MASK_TOKEN_ID required, SDAR_BLOCK_LENGTH /
#     SDAR_DENOISING_STEPS / SDAR_REMASKING_STRATEGY / SDAR_DYNAMIC_THRESHOLD)
# Env knobs (ReAct):
#   REACT_DEPTH=6 (breadth hard-capped to 1 for ReActAgent)
# Env knobs (MCTS/value):
#   MODE=value, REACT_BREADTH=6, VALUE_MODEL or (VALUE_BASE + VALUE_HEAD),
#   MAX_MODEL_LEN, MCTS_NUM_SIM/C_PUCT/V_PRIOR/VALUE_TRUST/PRUNE_PER/
#   MAX_EXPANDS/NUM_POS_SIM/PASSK_THRESHOLD
# Judge: USE_LLM_JUDGE, JUDGE_TOKENIZER_PATH, JUDGE_ENGINE, JUDGE_MODEL_PATH

set -euo pipefail
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$ROOT"

mkdir -p eval/rollouts eval/results eval/logs

export ENGINE="${ENGINE:-tpu}"
export BASE_URL="${BASE_URL:-}"
export TOKENIZER_PATH="${TOKENIZER_PATH:?set TOKENIZER_PATH to the policy model dir}"

export USE_LLM_JUDGE="${USE_LLM_JUDGE:-0}"
export JUDGE_TOKENIZER_PATH="${JUDGE_TOKENIZER_PATH:-$TOKENIZER_PATH}"
export JUDGE_ENGINE="${JUDGE_ENGINE:-$ENGINE}"
export JUDGE_BASE_URL="${JUDGE_BASE_URL:-$BASE_URL}"

export MAX_NEW_TOKENS="${MAX_NEW_TOKENS:-1024}"
export TEMPERATURE="${TEMPERATURE:-0.3}"
export TOP_P="${TOP_P:-0.8}"
export TOP_K="${TOP_K:-20}"
export REPETITION_PENALTY="${REPETITION_PENALTY:-1.05}"
export MIN_P="${MIN_P:-0.0}"

export REACT_DEPTH="${REACT_DEPTH:-6}"
export REACT_BREADTH="${REACT_BREADTH:-6}"
export PASSATK_K="${PASSATK_K:-16}"

export MODE="${MODE:-value}"

export VALUE_MODEL="${VALUE_MODEL:-}"
export VALUE_BASE="${VALUE_BASE:-$TOKENIZER_PATH}"
export VALUE_HEAD="${VALUE_HEAD:-}"
export VALUE_DEVICE="${VALUE_DEVICE:-tpu}"
export VALUE_DTYPE="${VALUE_DTYPE:-auto}"
export MAX_MODEL_LEN="${MAX_MODEL_LEN:-4096}"

export MCTS_NUM_SIM="${MCTS_NUM_SIM:-128}"
export MCTS_C_PUCT="${MCTS_C_PUCT:-1.0}"
export MCTS_V_PRIOR="${MCTS_V_PRIOR:-0.0}"
export MCTS_VALUE_TRUST="${MCTS_VALUE_TRUST:-1.0}"
export MCTS_PRUNE_PER="${MCTS_PRUNE_PER:-129}"
export MCTS_MAX_EXPANDS="${MCTS_MAX_EXPANDS:-decay}"
export MCTS_NUM_POS_SIM="${MCTS_NUM_POS_SIM:-1}"
export MCTS_PASSK_THRESHOLD="${MCTS_PASSK_THRESHOLD:-1.0}"

DATA_DIR_AIME24="${DATA_DIR_AIME24:-data/aime-24.jsonl}"
DATA_DIR_AIME25="${DATA_DIR_AIME25:-data/aime-25.jsonl}"
DATA_DIR_MATH="${DATA_DIR_MATH:-data/math-500.jsonl}"
DATA_DIR_GAOKAO2023="${DATA_DIR_GAOKAO2023:-data/gaokao-23.jsonl}"
DATA_DIR_OLYMPIAD="${DATA_DIR_OLYMPIAD:-data/olympiad.jsonl}"
export DATA_DIR_AIME24 DATA_DIR_AIME25 DATA_DIR_MATH DATA_DIR_GAOKAO2023 DATA_DIR_OLYMPIAD

TARGET="${1:-all}"
DATASETS=("aime24" "aime25" "math" "gaokao2023" "olympiadbench")
if [[ "$TARGET" != "all" ]]; then
  DATASETS=("$TARGET")
fi

python_bin="${PYTHON:-python}"

rollout_one() {
  local ds="$1"
  local data_path=""
  case "$ds" in
    aime24)        data_path="$DATA_DIR_AIME24" ;;
    aime25)        data_path="$DATA_DIR_AIME25" ;;
    math)          data_path="$DATA_DIR_MATH" ;;
    gaokao2023)    data_path="$DATA_DIR_GAOKAO2023" ;;
    olympiadbench) data_path="$DATA_DIR_OLYMPIAD" ;;
    *) echo "Unknown dataset: $ds" >&2; exit 1 ;;
  esac

  local out_path="eval/rollouts/${ds}.pred.jsonl"
  local log="eval/logs/${ds}.rollout.log"
  echo "[rollout] $ds -> $out_path"
  set +e
  local mode_to_use="${MODE:-value}"
  local common=(
    --data "$data_path" --out "$out_path" --dataset-name "$ds"
    --tokenizer-path "$TOKENIZER_PATH" --engine "$ENGINE"
    --max-new-tokens "$MAX_NEW_TOKENS" --temperature "$TEMPERATURE"
    --top-p "$TOP_P" --top-k "$TOP_K"
    --repetition-penalty "$REPETITION_PENALTY" --min-p "$MIN_P"
  )
  if [[ "$mode_to_use" == "value" ]]; then
    "$python_bin" -m lapha_tpu.evalsuite.rollout_jsonl "${common[@]}" \
      --mode value --depth "$REACT_DEPTH" --breadth "$REACT_BREADTH" \
      --k "$PASSATK_K" \
      --value-base "$VALUE_BASE" \
      ${VALUE_HEAD:+--value-head "$VALUE_HEAD"} \
      ${VALUE_MODEL:+--value-model "$VALUE_MODEL"} \
      --value-device "$VALUE_DEVICE" --value-dtype "$VALUE_DTYPE" \
      --max-model-len "$MAX_MODEL_LEN" \
      --mcts-num-sim "$MCTS_NUM_SIM" --mcts-c-puct "$MCTS_C_PUCT" \
      --mcts-v-prior "$MCTS_V_PRIOR" --mcts-value-trust "$MCTS_VALUE_TRUST" \
      --mcts-prune-per "$MCTS_PRUNE_PER" --mcts-max-expands "$MCTS_MAX_EXPANDS" \
      --mcts-num-pos-sim "$MCTS_NUM_POS_SIM" \
      --mcts-passk-threshold "$MCTS_PASSK_THRESHOLD" \
      >"$log" 2>&1
  elif [[ "$mode_to_use" == "react" ]]; then
    "$python_bin" -m lapha_tpu.evalsuite.rollout_jsonl "${common[@]}" \
      --mode react --depth "$REACT_DEPTH" --breadth 1 \
      --k "$PASSATK_K" >"$log" 2>&1
  else
    "$python_bin" -m lapha_tpu.evalsuite.rollout_jsonl "${common[@]}" \
      --mode single --k "$PASSATK_K" >"$log" 2>&1
  fi
  local rc=$?
  set -e
  if [[ $rc -ne 0 ]]; then
    echo "[rollout] FAILED: $ds. Tail of $log:"
    tail -n 120 "$log"
    exit $rc
  fi
}

for ds in "${DATASETS[@]}"; do
  rollout_one "$ds"
done

"$python_bin" -u eval_math.py --dataset "$TARGET" --k "$PASSATK_K"

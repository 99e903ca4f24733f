#!/bin/bash
# Round-4 TPU bench queue (ROADMAP session-2/3): run SEQUENTIALLY, one TPU
# job at a time (axon tunnel contention — verify skill). Each step is
# timeout-bounded so a wedged tunnel cannot hold the queue; partial
# compiles bank in the persistent cache and complete on retry.
# Usage: bash scripts/run_tpu_queue.sh [logdir]
set -u
LOG=${1:-/root/repo/bench_out}
mkdir -p "$LOG"
cd /root/repo

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "$name exit=$?" | tee -a "$LOG/queue.log"
  tail -5 "$LOG/$name.log" | grep -v -E "WARNING|I0000|oneDNN|cudart" | tee -a "$LOG/queue.log"
}

# 1. sinks decode A/B at an alternating-window+sink shape (verdict #2
#    "measured decode delta"): ragged sink fold vs dense sink softmax
run sinks_decode_ab 3600 env AB_SINKS=1 AB_WINDOW=128 AB_PATTERN=alt \
  python scripts/bench_attention_ab.py

# 2. sink+window prefill A/B (flash sink fold vs dense)
run sinks_prefill_ab 2400 env PF_SINKS=1 PF_WINDOW=128 PF_PATTERN=alt \
  python scripts/bench_prefill.py

# 3. MLA 4k prefill: flash (v padded to qk_head_dim) vs dense (verdict #3)
run mla_prefill_ab 2400 env PF_MODEL=mla python scripts/bench_prefill.py

# 4. headline re-runs (verdict #9 honesty loop)
run bench_15b 2400 python bench.py
run bench_7b_int4 3600 env BENCH_PRESET=7b BENCH_QUANT=int4 python bench.py
run bench_mla 2400 env BENCH_PRESET=mla python bench.py

# 5. remat-policy lever, single chip at a HALVED depth where the saved
#    activations fit (the 28-layer/4k shape needs the FSDP mesh):
#    full vs save_qkv at NL=14, 4k context, sgd isolates attention cost
run train_nl14_full 3600 env NL=14 OPT=sgd REMAT=full ATTN=pallas \
  python scripts/bench_train.py
run train_nl14_saveqkv 3600 env NL=14 OPT=sgd REMAT=save_qkv ATTN=pallas \
  python scripts/bench_train.py

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG/queue.log"

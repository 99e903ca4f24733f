#!/usr/bin/env python
"""End-to-end MCTS search throughput: sims/sec + rollout tok/s.

Runs a REAL value-guided search (engine + ValueFunction + latent bank +
clustering) on the Qwen2.5-1.5B architecture with random weights and the
offline fixture tokenizer — the complete search stack of
BASELINE.md's second north-star metric (sims/sec at depth 6 × breadth 6).

Usage: python scripts/bench_search.py  (env: SEARCH_NUM_SIM, SEARCH_DEPTH,
SEARCH_BREADTH, SEARCH_LEAVES, SEARCH_MAX_NEW, BENCH_PRESET=tiny|1p5b)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import lapha_tpu

lapha_tpu.apply_platform_env()
lapha_tpu.enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from lapha_tpu.engine import Engine, SamplingParams
    from lapha_tpu.models import Qwen2Config, qwen2, value_model
    from lapha_tpu.search import LatentBank, MCTSAgent
    from lapha_tpu.search.value_fn import ValueFunction
    from model_fixtures import build_tiny_model_dir

    platform = jax.devices()[0].platform
    preset = os.getenv("BENCH_PRESET") or ("1p5b" if platform != "cpu" else "tiny")

    # offline tokenizer with a chat template (weights in the dir are unused)
    tok_dir = "/tmp/lapha_bench_tok"
    if not os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
        build_tiny_model_dir(tok_dir, vocab=8000)
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tok_dir)

    if preset == "1p5b":
        cfg = Qwen2Config(vocab_size=8192, hidden_size=1536, intermediate_size=8960,
                          num_hidden_layers=28, num_attention_heads=12,
                          num_key_value_heads=2, max_position_embeddings=4096,
                          rope_theta=1e6, dtype=jnp.bfloat16)
    else:
        cfg = Qwen2Config.tiny(vocab_size=8192)

    depth = int(os.getenv("SEARCH_DEPTH", "6"))
    breadth = int(os.getenv("SEARCH_BREADTH", "6"))
    num_sim = int(os.getenv("SEARCH_NUM_SIM", "24"))
    leaves = int(os.getenv("SEARCH_LEAVES", "4"))
    max_new = int(os.getenv("SEARCH_MAX_NEW", "128"))

    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    collect = os.getenv("SEARCH_FUSED_VALUE", "1") in ("1", "true")
    # int8 KV by default on non-tiny presets: the measured-best serving
    # config (BASELINE.md KV A/B); SEARCH_KV_QUANT=bf16 for the bf16 run
    kv_quant = (None if os.getenv("SEARCH_KV_QUANT") in ("bf16", "none")
                else (os.getenv("SEARCH_KV_QUANT") or
                      ("int8" if preset != "tiny" else None)))
    engine = Engine(params, cfg, tokenizer, max_model_len=2048,
                    max_batch=breadth * leaves, decode_chunk=32, seed=0,
                    collect_h0=collect, kv_quant=kv_quant)
    value_fn = ValueFunction(params, head, cfg, max_model_len=2048)

    class BenchAgent(MCTSAgent):
        TOOLS = {}
        TOOLS_DESCRIPTION = ""
        SYSTEM_TEMPLATE = "Solve step by step. Limit {step_limit} steps."
        USER_TEMPLATE = "{support_material_str}\nQ: {question}"

    def run_search(question):
        agent = BenchAgent(
            tokenizer=tokenizer, depth=depth, breadth=breadth,
            output_dir="/tmp/lapha_bench_search", llm=engine,
            max_model_len=2048,
            sampling_params=SamplingParams(temperature=0.8, top_p=0.95, top_k=20,
                                           max_tokens=max_new),
            value_fn=value_fn, reward_fns=[lambda c, gt: 0.0],
            num_sim=num_sim, num_pos_sim=10**9, prune_per=8,
            leaves_per_sim=leaves, hid_bank=LatentBank(),
        )
        chains = agent.search(question, ground_truth="42")
        toks = sum(len(st.get("completion_ids") or []) for ch in chains
                   for st in ch)
        sims = len(agent._all_nodes) // max(1, breadth)
        return sims, toks

    run_search("warmup question about arithmetic")  # compile warmup

    t0 = time.perf_counter()
    total_sims = total_toks = 0
    for i in range(2):
        s, t = run_search(f"bench question {i}: compute something stepwise")
        total_sims += s
        total_toks += t
    dt = time.perf_counter() - t0

    stats = engine.prefix_cache.stats() if engine.prefix_cache else {}
    print(json.dumps({
        "metric": "mcts_sims_per_sec",
        "value": round(total_sims / dt, 3),
        "unit": "sims/s",
        "rollout_tok_per_sec": round(total_toks / dt, 1),
        "prefix_cache": stats,
        "shape": {"depth": depth, "breadth": breadth, "num_sim": num_sim,
                  "leaves_per_sim": leaves, "max_new": max_new},
    }))


if __name__ == "__main__":
    main()

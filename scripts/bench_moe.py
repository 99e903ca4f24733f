#!/usr/bin/env python
"""MoE serving throughput: Qwen1.5-MoE-A2.7B-shape engine rollout bench.

Same methodology as bench.py (random weights, MCTS-shaped parent×breadth
requests, warmup round then timed rounds) on the sparse-FFN architecture
(E=60 experts, top-4 + shared expert — models/qwen2.py num_experts>0,
ops/moe.py). Decode at batch B touches up to min(E, B·top_k) experts per
layer, so MoE decode is expert-weight-bandwidth-bound: the interesting
number is how far the impl stays from (touched expert bytes)/HBM-BW.

Usage: python scripts/bench_moe.py
Env: MOE_IMPL=auto|dispatch|dense|gather, BENCH_PRESET=tiny|a2.7b,
BENCH_MAX_TOKENS, BENCH_PROMPT_LEN, BENCH_BREADTH, BENCH_PARENTS,
BENCH_ROUNDS. Prints one JSON line like bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import lapha_tpu

lapha_tpu.apply_platform_env()
lapha_tpu.enable_compilation_cache()


class IdTok:
    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [int(w) for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


def main():
    import jax
    import jax.numpy as jnp

    from lapha_tpu.engine import Engine, SamplingParams
    from lapha_tpu.models import Qwen2Config, qwen2

    platform = jax.devices()[0].platform
    preset = os.getenv("BENCH_PRESET") or ("a2.7b" if platform != "cpu" else "tiny")

    if preset == "a2.7b":
        # Qwen1.5-MoE-A2.7B architecture (H2048, 60 experts top-4). The
        # full 24-layer model is 14.3B params = 28.6 GB bf16 — it does NOT
        # fit one 16 GB v5e (measured: compile-stage OOM, 28.76G needed),
        # it's a multi-chip EP model. For the single-chip dispatch-vs-dense
        # impl A/B the per-LAYER expert math is what matters, so default to
        # an 8-layer stack of the exact A2.7B layer shape (~5.4 GB weights)
        # and let BENCH_LAYERS override on bigger chips.
        n_layers = int(os.getenv("BENCH_LAYERS", "8" if platform != "cpu" else "24"))
        # the dispatch-vs-dense A/B is about expert-FFN math; the real 152k
        # vocab only adds ~2 GB embed/lm_head + a GB-scale prefill logits
        # buffer, so default it down on 16 GB chips
        n_vocab = int(os.getenv("BENCH_VOCAB", "32768" if platform != "cpu" else "151936"))
        cfg = Qwen2Config(
            vocab_size=n_vocab, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=n_layers, num_attention_heads=16, num_key_value_heads=16,
            max_position_embeddings=8192, rope_theta=1e6,
            num_experts=60, num_experts_per_tok=4, moe_intermediate_size=1408,
            shared_expert_intermediate_size=5632, norm_topk_prob=False,
            tie_word_embeddings=False, dtype=jnp.bfloat16,
            moe_impl=os.getenv("MOE_IMPL", "auto"),
        )
    else:
        cfg = Qwen2Config.tiny(
            vocab_size=2048, num_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=32, shared_expert_intermediate_size=48,
            tie_word_embeddings=False,
            moe_impl=os.getenv("MOE_IMPL", "auto"))

    prompt_len = int(os.getenv("BENCH_PROMPT_LEN", "256" if preset != "tiny" else "64"))
    max_tokens = int(os.getenv("BENCH_MAX_TOKENS", "128" if preset != "tiny" else "32"))
    breadth = int(os.getenv("BENCH_BREADTH", "6"))
    parents = int(os.getenv("BENCH_PARENTS", "8"))
    rounds = int(os.getenv("BENCH_ROUNDS", "3"))

    params = qwen2.init_params(cfg, jax.random.key(0))
    eng = Engine(
        params, cfg, IdTok(),
        max_model_len=prompt_len + max_tokens + 128,
        max_batch=parents * breadth, decode_chunk=32,
        pad_multiple=128, batch_bucket=1,
        eos_token_ids=[], seed=0,
    )

    rng = np.random.default_rng(0)
    sp = SamplingParams(n=breadth, temperature=0.8, top_p=0.95, top_k=20,
                        max_tokens=max_tokens, seed=1)

    def one_round(seed):
        prompts = [" ".join(str(i) for i in rng.integers(2, cfg.vocab_size, prompt_len))
                   for _ in range(parents)]
        outs = eng.generate(prompts, sp)
        return sum(len(o.token_ids) for r in outs for o in r.outputs)

    one_round(0)  # warmup/compile
    t0 = time.perf_counter()
    total = 0
    for r in range(rounds):
        total += one_round(r + 1)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "moe_rollout_tokens_per_sec_per_chip",
        "value": round(total / dt, 2),
        "unit": "tok/s",
        "preset": preset,
        "layers": cfg.num_hidden_layers,
        "moe_impl": cfg.moe_impl,
    }))


if __name__ == "__main__":
    main()

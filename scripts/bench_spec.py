#!/usr/bin/env python
"""Speculative-decoding (PLD) A/B at the rollout bench shape.

Measures, on the 1.5B architecture at the BASELINE.md shape (8 parents x
breadth 6 = B=48, prompt 512, 256 new tokens):

1. baseline: normal decode, greedy (rep_pen=1.0) — random-weight greedy
   degenerates into short cycles, the PLD-favorable regime (an upper bound
   on realistic acceptance; real math rollouts sit between this and the
   adversarial case);
2. spec-favorable: same stream with spec_decode="pld" — tok/s uplift =
   accepted drafts (greedy prefix agreement reported; see the note at the
   parity block below);
3. spec-adversarial: sampled temp 0.8 on random weights — n-gram lookup
   over near-uniform random tokens ~never hits, so this bounds the
   verify-step OVERHEAD (the K+1-token forward vs 1-token);

and reports tokens_per_iteration for each so break-even acceptance
(overhead ratio) is explicit.

Usage: python scripts/bench_spec.py   (TPU). Env: BENCH_PRESET=tiny|1p5b,
SPEC_K (default 3), BENCH_* as bench.py.
"""

from __future__ import annotations

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
    preset = os.getenv("BENCH_PRESET") or ("1p5b" if platform != "cpu" else "tiny")
    if preset == "1p5b":
        cfg = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
            max_position_embeddings=8192, rope_theta=1e6,
        )
    else:
        cfg = Qwen2Config.tiny(vocab_size=2048)

    prompt_len = int(os.getenv("BENCH_PROMPT_LEN", "512" if preset != "tiny" else "64"))
    max_tokens = int(os.getenv("BENCH_MAX_TOKENS", "256" if preset != "tiny" else "48"))
    breadth = int(os.getenv("BENCH_BREADTH", "6"))
    parents = int(os.getenv("BENCH_PARENTS", "8"))
    rounds = int(os.getenv("BENCH_ROUNDS", "2"))
    K = int(os.getenv("SPEC_K", "3"))

    params = qwen2.init_params(cfg, jax.random.key(0))
    mk = lambda **kw: Engine(
        params, cfg, IdTok(), max_model_len=prompt_len + max_tokens + 128,
        max_batch=parents * breadth, decode_chunk=32, pad_multiple=128,
        batch_bucket=1, eos_token_ids=[], seed=0, **kw)

    rng = np.random.default_rng(0)
    prompts = [" ".join(str(i) for i in rng.integers(2, cfg.vocab_size, prompt_len))
               for _ in range(parents)]
    sp_greedy = SamplingParams(n=breadth, temperature=0.0, max_tokens=max_tokens,
                               repetition_penalty=1.0, seed=1)
    sp_sample = SamplingParams(n=breadth, temperature=0.8, top_p=0.95, top_k=20,
                               max_tokens=max_tokens, seed=1)

    def run(eng, sp):
        # TWO warmups: the first call misses the prefix store (compiles the
        # miss-prefill program), the second HITS it (compiles the hit-path
        # write-prefix/suffix programs) — without it the first timed round
        # absorbs the hit-path compile and depresses tok/s by 2-3x
        # (measured; the round-3 "greedy anomaly" was exactly this)
        eng.generate(prompts, sp)
        eng.generate(prompts, sp)
        t0 = time.perf_counter()
        total = 0
        for _ in range(rounds):
            outs = eng.generate(prompts, sp)
            total += sum(len(o.token_ids) for r in outs for o in r.outputs)
        return total / (time.perf_counter() - t0), outs

    base = mk()
    spec = mk(spec_decode="pld", spec_k=K)

    res = {}
    tps, outs_base = run(base, sp_greedy)
    res["baseline_greedy_toks"] = round(tps, 1)
    tps, outs_spec = run(spec, sp_greedy)
    res["spec_greedy_toks"] = round(tps, 1)
    res["spec_greedy_stats"] = spec.last_spec_stats
    # greedy parity: bit-identical on deterministic backends (the CPU test
    # suite asserts it); on TPU the K+1-token verify einsum's logits differ
    # from the 1-token einsum at float-ulp level (different MXU tiling —
    # same class of difference as any batch-shape change), so argmax
    # near-ties can flip and streams diverge from the flip point on.
    # Report the agreement up to first divergence per row.
    agree, total = 0, 0
    for r, o in zip(outs_base, outs_spec):
        for a, b in zip(r.outputs, o.outputs):
            pre = 0
            for x, y in zip(a.token_ids, b.token_ids):
                if x != y:
                    break
                pre += 1
            agree += pre
            total += len(a.token_ids)
    res["greedy_prefix_agreement"] = round(agree / max(1, total), 4)

    tps, _ = run(base, sp_sample)
    res["baseline_sampled_toks"] = round(tps, 1)
    tps, _ = run(spec, sp_sample)
    res["spec_sampled_toks"] = round(tps, 1)
    res["spec_sampled_stats"] = spec.last_spec_stats

    if os.getenv("BENCH_INT8", "1") != "0":
        # int8-KV variants: dense-int8 won the persistent-cache attention
        # A/B outright (BASELINE.md), so the production config is
        # kv_quant="int8" — measure spec on top of it
        del base, spec
        base8 = mk(kv_quant="int8")
        spec8 = mk(kv_quant="int8", spec_decode="pld", spec_k=K)
        tps, _ = run(base8, sp_greedy)
        res["baseline_int8_greedy_toks"] = round(tps, 1)
        tps, _ = run(spec8, sp_greedy)
        res["spec_int8_greedy_toks"] = round(tps, 1)
        res["spec_int8_greedy_stats"] = spec8.last_spec_stats
        tps, _ = run(base8, sp_sample)
        res["baseline_int8_sampled_toks"] = round(tps, 1)
        tps, _ = run(spec8, sp_sample)
        res["spec_int8_sampled_toks"] = round(tps, 1)
        res["spec_int8_sampled_stats"] = spec8.last_spec_stats

    res["K"] = K
    res["shape"] = {"B": parents * breadth, "prompt": prompt_len,
                    "new": max_tokens}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

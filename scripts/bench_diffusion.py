#!/usr/bin/env python
"""A/B: block-diffusion generation vs AR decode (same model, same budget).

Measures the MECHANICS of engine/diffusion.py, not model quality: random
weights give arbitrary confidences, so the dynamic strategy's reveal
behavior is meaningless here — instead the static strategy pins the
denoise schedule to exactly `steps` passes + 1 commit per block, making
tokens/forward a constant (Tb / (steps+1)) and the measurement a pure
throughput comparison of the two loops. A trained SDAR checkpoint decoding
at ~1-2 dynamic passes/block lands between the steps=1 and steps=2 rows.

Rows: AR baseline (Engine), diffusion at steps in {1, 2, 4} with
Tb = SDAR's default block 4. Decode is weight-stream-bound at these batch
sizes, so a T=4-row forward costs roughly one T=1 forward and the
steps=1 row should approach 2x AR tokens/s (4 tokens / 2 forwards).

Env: BENCH_PRESET=tiny|1p5b (default 1p5b on TPU), DF_PROMPT_LEN (512),
DF_MAX_TOKENS (256), DF_BATCH (16), DF_ROUNDS (3), DF_BLOCK (4),
DF_STEPS ("1,2,4").
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


class IdTok:
    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [int(w) for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


def main():
    import jax

    if os.getenv("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import lapha_tpu

    lapha_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from lapha_tpu.engine import DiffusionEngine, Engine, SamplingParams
    from lapha_tpu.models import Qwen2Config, qwen2

    platform = jax.devices()[0].platform
    preset = os.getenv("BENCH_PRESET") or ("1p5b" if platform != "cpu" else "tiny")
    if preset == "1p5b":
        cfg = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, max_position_embeddings=4096,
            rope_theta=1e6, dtype=jnp.bfloat16)
    else:
        cfg = Qwen2Config.tiny(vocab_size=2048)

    prompt_len = int(os.getenv("DF_PROMPT_LEN", "512" if preset != "tiny" else "32"))
    max_tokens = int(os.getenv("DF_MAX_TOKENS", "256" if preset != "tiny" else "32"))
    batch = int(os.getenv("DF_BATCH", "16" if preset != "tiny" else "4"))
    rounds = int(os.getenv("DF_ROUNDS", "3"))
    Tb = int(os.getenv("DF_BLOCK", "4"))
    steps_list = [int(s) for s in os.getenv("DF_STEPS", "1,2,4").split(",")]
    mask_id = cfg.vocab_size - 1

    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)

    def prompts():
        return [" ".join(str(x) for x in rng.integers(2, cfg.vocab_size - 2,
                                                      size=prompt_len))
                for _ in range(batch)]

    sp = SamplingParams(n=1, temperature=0.8, top_p=0.95, top_k=20,
                        max_tokens=max_tokens, seed=1)
    common = dict(max_model_len=prompt_len + max_tokens + 128,
                  max_batch=batch, pad_multiple=128, batch_bucket=1,
                  eos_token_ids=[], seed=0)

    def run(eng, label):
        eng.generate(prompts(), sp)  # compile + warm
        t0 = time.time()
        n_tok = 0
        for _ in range(rounds):
            outs = eng.generate(prompts(), sp)
            n_tok += sum(len(o.token_ids) for ro in outs for o in ro.outputs)
        dt = time.time() - t0
        stats = getattr(eng, "last_diffusion_stats", None)
        print(f"{label}: {n_tok / dt:.1f} tok/s ({n_tok} tok / {dt:.2f}s)"
              + (f" tokens/forward={stats['tokens_per_forward']}" if stats
                 else ""), flush=True)
        return n_tok / dt

    ar = run(Engine(params, cfg, IdTok(), **common), "AR")
    results = {"ar_tok_s": round(ar, 1)}
    for steps in steps_list:
        eng = DiffusionEngine(
            params, cfg, IdTok(), mask_token_id=mask_id, block_length=Tb,
            denoising_steps=steps,
            remasking_strategy="low_confidence_static", **common)
        v = run(eng, f"diffusion Tb={Tb} steps={steps}")
        results[f"diffusion_s{steps}_tok_s"] = round(v, 1)

    # continuous batching at B > max_batch (round-5: diffusion composes
    # with the scheduler): 2x the batch routed through auto_continuous —
    # the persistent batch advances one committed block per chunk while
    # requests stream through max_batch rows
    if os.getenv("DF_CONTINUOUS", "1") != "0":
        steps_c = steps_list[0]
        eng = DiffusionEngine(
            params, cfg, IdTok(), mask_token_id=mask_id, block_length=Tb,
            denoising_steps=steps_c, auto_continuous=True,
            remasking_strategy="low_confidence_static", **common)
        big = prompts() + prompts()  # 2*batch > max_batch -> scheduler
        eng.generate(big[:batch], sp)  # warm the block program
        t0 = time.time()
        outs = eng.generate(big, sp)
        dt = time.time() - t0
        n_tok = sum(len(o.token_ids) for ro in outs for o in ro.outputs)
        if eng._auto_sched is not None:
            eng._auto_sched.stop()
        v = n_tok / dt
        print(f"diffusion continuous B={2 * batch}>max_batch={batch} "
              f"steps={steps_c}: {v:.1f} tok/s ({n_tok} tok / {dt:.2f}s)",
              flush=True)
        results["diffusion_continuous_tok_s"] = round(v, 1)

    print(json.dumps({"metric": "diffusion_ab", "preset": preset,
                      "batch": batch, "block": Tb, **results}))


if __name__ == "__main__":
    main()

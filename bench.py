#!/usr/bin/env python
"""Benchmark: MCTS-style rollout throughput (tokens/sec/chip).

Measures the generation engine on the BASELINE.md north-star shape: breadth-6
expansion batches (one parent prompt -> 6 samples sharing prefill KV) with a
~1.5B-parameter Qwen2 architecture at bf16 (random weights — throughput does
not depend on weight values). Prints ONE JSON line:

  {"metric": "rollout_tokens_per_sec_per_chip", "value": N,
   "unit": "tok/s", "vs_baseline": N / 2000.0}

vs_baseline uses 2000 tok/s as the reference point: a single A100 running
vLLM 0.11 on Qwen2.5-Math-1.5B bf16 at the reference's OWN rollout batch
(B=6: one leaf x breadth-6 per MCTS round, agent.py:664-673). Derivation in
BASELINE.md ("The denominator"): 3.1 GB weights / 2.04 TB/s HBM x 6 rows =
3.9k tok/s ideal, x0.5-0.6 small-batch serving efficiency => ~2k. The repo
publishes no numbers and no GPU exists here, so this is derived, not
measured.

Env knobs: BENCH_PRESET=tiny|1p5b (default 1p5b on TPU, tiny on CPU),
BENCH_MAX_TOKENS, BENCH_PROMPT_LEN, BENCH_BREADTH, BENCH_ROUNDS.

BENCH_MESH=DxM makes the mesh a bench dimension: params shard over
make_mesh(D, M) (FSDP over `data`, TP over `model` — the dryrun's TP
serving path) and the same engine rounds run sharded. One command
measures multi-device decode on the virtual CPU mesh today
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
BENCH_MESH=1x8 BENCH_PRESET=tiny) and on real hardware the day a
multi-chip tunnel appears (BENCH_MESH=1x4 BENCH_PRESET=7b on a v5p
slice). Not composable with BENCH_QUANT (quantized leaves have no TP
PARAM_RULES yet).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_TOKENS_PER_SEC = 2000.0


class IdTok:
    """Tokenizer stub: prompts are space-separated raw token ids."""

    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [int(w) for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


def main():
    import jax

    if os.getenv("JAX_PLATFORMS"):
        # the axon sitecustomize re-forces its platform; env alone is not enough
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import lapha_tpu

    lapha_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from lapha_tpu.engine import Engine, SamplingParams
    from lapha_tpu.models import Qwen2Config, qwen2

    platform = jax.devices()[0].platform
    preset = os.getenv("BENCH_PRESET") or ("1p5b" if platform != "cpu" else "tiny")

    if preset == "1p5b":
        # Qwen2.5-1.5B architecture (28 layers, H1536, 12 heads / 2 kv)
        cfg = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
            max_position_embeddings=4096, rope_theta=1e6, dtype=jnp.bfloat16,
        )
    elif preset == "7b":
        cfg = Qwen2Config(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
            max_position_embeddings=4096, rope_theta=1e6, dtype=jnp.bfloat16,
        )
    elif preset == "14b":
        # Qwen2.5-14B architecture: bf16 (29.6 GB) and even int8 (15.3 GB)
        # exceed one 16 GB v5e — this preset exists for BENCH_QUANT=int4
        # (group-128 packed projections ~7.4 GB + int8 embed/lm_head)
        cfg = Qwen2Config(
            vocab_size=152064, hidden_size=5120, intermediate_size=13824,
            num_hidden_layers=48, num_attention_heads=40, num_key_value_heads=8,
            head_dim=128, max_position_embeddings=4096, rope_theta=1e6,
            dtype=jnp.bfloat16,
        )
    elif preset == "mla":
        # DeepSeek-V2-Lite-proportioned DENSE body (~2.2B, 4.4 GB bf16 —
        # fits one v5e): H=2048, 27 layers, 16 heads of Multi-head Latent
        # Attention (kv_lora 512 + rope 64). Measures the absorbed
        # latent-cache decode path (models/deepseek.decode_step): cache
        # traffic is S x 576 per layer-step REGARDLESS of head count
        # (an MHA-16 equivalent would read 16x(192+128) = 5120/token).
        from lapha_tpu.models import deepseek

        cfg = deepseek.DeepseekConfig(
            vocab_size=102400, hidden_size=2048, intermediate_size=10944,
            num_hidden_layers=27, num_attention_heads=16,
            q_lora_rank=0, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128, n_routed_experts=0,
            max_position_embeddings=4096, rope_theta=10000.0,
            dtype=jnp.bfloat16,
        )
    else:
        cfg = Qwen2Config.tiny(vocab_size=2048)

    prompt_len = int(os.getenv("BENCH_PROMPT_LEN", "512" if preset != "tiny" else "64"))
    max_tokens = int(os.getenv("BENCH_MAX_TOKENS", "256" if preset != "tiny" else "32"))
    breadth = int(os.getenv("BENCH_BREADTH", "6"))
    parents = int(os.getenv("BENCH_PARENTS", "8"))
    rounds = int(os.getenv("BENCH_ROUNDS", "3"))

    if preset == "mla":
        from lapha_tpu.models import deepseek

        params = deepseek.init_params(cfg, jax.random.key(0))
    elif os.getenv("BENCH_QUANT") in ("int8", "int4"):
        # device-side quantized init: never holds bf16 weights anywhere.
        # int4 = group-128 RTN projections (AWQ storage layout) + int8
        # embed/lm_head — halves the dominant weight stream again.
        from lapha_tpu.models.quant import init_params_quantized

        params = init_params_quantized(
            cfg, seed=0, bits=4 if os.getenv("BENCH_QUANT") == "int4" else 8)
    else:
        params = qwen2.init_params(cfg, jax.random.key(0))
    eng = Engine(
        params, cfg, IdTok(),
        max_model_len=prompt_len + max_tokens + 128,
        max_batch=parents * breadth, decode_chunk=32,
        pad_multiple=128, batch_bucket=1,
        eos_token_ids=[],  # force full-length decode for stable measurement
        seed=0,
        # Measured-best serving config (BASELINE.md decode-floor + KV A/B):
        # per-vector int8 KV is +7% on this harness (6429 vs 6008 tok/s at
        # B=48) and is the config the continuous scheduler already selects
        # (dense-int8 won its attention-path A/B outright). The Engine
        # DEFAULT stays bf16 (parity-by-default; int8 KV is an opt-in knob,
        # PARITY.md) — the bench measures the framework's best supported
        # config. BENCH_KV_QUANT=bf16 reproduces the bf16 number.
        kv_quant=(None if os.getenv("BENCH_KV_QUANT") in ("bf16", "none")
                  else (os.getenv("BENCH_KV_QUANT") or
                        ("int8" if preset != "tiny" else None))),
    )

    mesh = None
    if os.getenv("BENCH_MESH"):
        if os.getenv("BENCH_QUANT"):
            raise SystemExit("BENCH_MESH does not compose with BENCH_QUANT")
        from lapha_tpu.parallel import make_mesh, shard_params

        d, m = (int(x) for x in os.environ["BENCH_MESH"].lower().split("x"))
        mesh = make_mesh(d, m)
        eng.update_params(shard_params(params, mesh))

    rng = np.random.default_rng(0)
    sp = SamplingParams(n=breadth, temperature=0.8, top_p=0.95, top_k=20,
                        max_tokens=max_tokens, seed=1)

    def one_round(seed):
        prompts = [" ".join(str(i) for i in rng.integers(2, cfg.vocab_size, prompt_len))
                   for _ in range(parents)]
        outs = eng.generate(prompts, sp)
        return sum(len(o.token_ids) for r in outs for o in r.outputs)

    import contextlib

    with (mesh if mesh is not None else contextlib.nullcontext()):
        # warmup (compile)
        one_round(0)

        t0 = time.perf_counter()
        total_tokens = 0
        for r in range(rounds):
            total_tokens += one_round(r + 1)
        dt = time.perf_counter() - t0

    tok_per_sec = total_tokens / dt
    print(json.dumps({
        "metric": "rollout_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_sec / REF_TOKENS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()

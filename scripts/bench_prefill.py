#!/usr/bin/env python
"""Prefill attention-impl A/B: flash (Pallas) vs dense at 4k context.

Times the FULL model prefill forward (qwen2.forward, no cache) at the
engine's long-prompt shape, crossed over attn_impl in {dense, flash} and
the model-structure knobs the round-3 families added:

  PF_SINKS=1     gpt_oss learned attention sinks (flash folds exp(s-m)
                 into the running denominator; dense uses _sink_softmax)
  PF_WINDOW=W    uniform sliding window (banded flash skips out-of-band
                 K blocks statically)
  PF_PATTERN=alt alternating sliding/full layer_windows (gpt_oss stack;
                 flash picks banded/full per layer via lax.cond)
  PF_MODEL=mla   DeepSeek MLA body (V2-Lite-proportioned 2.2B): flash
                 rides the kernel with V padded to qk_head_dim (the HF
                 flash trick) vs the dense quadratic path

Methodology (verify-skill): N forwards chained in one jit with a token
data dependency (argmax of the last row feeds token 0 of the next batch),
one host sync, 2 timed reps after the compile warmup, min taken. Random
weights on device. Usage:
  PF_SINKS=1 PF_WINDOW=128 PF_PATTERN=alt python scripts/bench_prefill.py
Env: PF_B (8), PF_T (4096), PF_REPS (4), PF_IMPLS (dense,flash), NL (28).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import lapha_tpu

lapha_tpu.apply_platform_env()
lapha_tpu.enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from lapha_tpu.models import Qwen2Config, qwen2


@functools.partial(jax.jit, static_argnames=("cfg", "N", "fwd"))
def run_forwards(params, ids, mask, *, cfg, N, fwd=qwen2.forward):
    # compute_logits=False: real prefill never materializes (B, T, V)
    # logits (12.5 GB f32 at B=8/T=4k — OOMs the 16 GB chip; the engine
    # samples from the LAST position only). The rep->rep data dependency
    # comes from the final hidden row instead — identical for both arms.
    def body(i, st):
        ids, acc = st
        out = fwd(params, cfg, ids, attention_mask=mask,
                  compute_logits=False, return_hidden=True)
        hidden = out[1]
        nxt = (jnp.argmax(hidden[:, -1, :].astype(jnp.float32), -1)
               % cfg.vocab_size).astype(ids.dtype)  # (B,)
        ids = ids.at[:, 0].set(nxt)  # data dependency rep -> rep
        return ids, acc + hidden[0, 0, 0].astype(jnp.float32)

    st = jax.lax.fori_loop(0, N, body, (ids, jnp.float32(0.0)))
    return st[1]


def main():
    tiny = os.getenv("PF_TINY") == "1"
    assert tiny or jax.devices()[0].platform != "cpu", \
        "prefill A/B is a hardware measurement (PF_TINY=1 for a CPU smoke)"
    B = int(os.getenv("PF_B", "2" if tiny else "8"))
    T = int(os.getenv("PF_T", "256" if tiny else "4096"))
    N = int(os.getenv("PF_REPS", "2" if tiny else "4"))
    mla = os.getenv("PF_MODEL") == "mla"
    if mla:
        from lapha_tpu.models import deepseek

        fwd = deepseek.forward
        if tiny:
            cfg = deepseek.DeepseekConfig(
                vocab_size=512, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4, q_lora_rank=0,
                kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
                v_head_dim=16, n_routed_experts=0,
                max_position_embeddings=T, dtype=jnp.float32)
        else:
            cfg = deepseek.DeepseekConfig(  # the bench.py mla preset shape
                vocab_size=102400, hidden_size=2048, intermediate_size=10944,
                num_hidden_layers=int(os.getenv("NL", "27")),
                num_attention_heads=16, q_lora_rank=0, kv_lora_rank=512,
                qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
                n_routed_experts=0, max_position_embeddings=T,
                rope_theta=10000.0, dtype=jnp.bfloat16)
    elif tiny:
        fwd = qwen2.forward
        cfg = Qwen2Config.tiny(max_position_embeddings=T, dtype=jnp.float32)
    else:
        fwd = qwen2.forward
        cfg = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=int(os.getenv("NL", "28")),
            num_attention_heads=12, num_key_value_heads=2,
            max_position_embeddings=T, rope_theta=1e6, dtype=jnp.bfloat16)
    W = int(os.getenv("PF_WINDOW", "0"))
    assert not (mla and (W or os.getenv("PF_SINKS"))), \
        "PF_MODEL=mla does not take window/sink knobs"
    if W and os.getenv("PF_PATTERN") == "alt":
        cfg = dataclasses.replace(cfg, layer_windows=tuple(
            W if i % 2 == 0 else 0 for i in range(cfg.num_hidden_layers)))
    elif W:
        cfg = dataclasses.replace(cfg, sliding_window=W)
    if os.getenv("PF_SINKS") == "1":
        assert not mla
        cfg = dataclasses.replace(cfg, attn_sinks=True)
    if mla:
        from lapha_tpu.models import deepseek

        params = deepseek.init_params(cfg, jax.random.key(0))
    else:
        params = qwen2.init_params(cfg, jax.random.key(0))
        if cfg.attn_sinks:
            params["layers"]["attn"]["sinks"] = jax.random.normal(
                jax.random.key(42),
                (cfg.num_hidden_layers, cfg.num_attention_heads),
                jnp.float32)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    impls = (os.getenv("PF_IMPLS") or
             ("dense,flash" if not tiny else "dense")).split(",")
    out = {}
    for impl in impls:
        c = dataclasses.replace(
            cfg, attn_impl={"dense": "dense", "flash": "pallas"}[impl])
        run_forwards(params, ids, mask, cfg=c, N=N, fwd=fwd)  # compile+warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run_forwards(params, ids, mask, cfg=c, N=N, fwd=fwd))
            best = min(best, (time.perf_counter() - t0) / N)
        out[impl] = round(best * 1e3, 2)
        print(f"{impl}: {out[impl]} ms/prefill "
              f"({B * T / best / 1e3:.0f} ktok/s)", flush=True)
    print(json.dumps({"shape": {"B": B, "T": T, "NL": cfg.num_hidden_layers,
                                "window": W,
                                "pattern": os.getenv("PF_PATTERN", "uniform"),
                                "model": "mla" if mla else "qwen2",
                                "sinks": bool(getattr(cfg, "attn_sinks",
                                                      False))},
                      "ms_per_prefill": out}), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decode attention-path A/B at the scheduler's persistent-cache shape.

Times the FULL 1.5B decode step (qwen2.decode_step: all 28 layers, weights
+ cache writes + attention) at S=4096 / B=48 / prompt lens ~500 — the shape
where `ContinuousEngine` must choose between the dense masked-read path and
the ragged Pallas kernel (engine/scheduler.py attention-path decision),
crossed with bf16 vs int8 KV caches and, for the ragged kernel, block_rows
4/8/16 (kernel v2's multi-row programs amortize the per-program fixed cost
that made v1 lose to dense-int8 — BASELINE.md records the v1 numbers:
dense bf16 31.3 / ragged-v1 bf16 28.0 / dense int8 19.5 / ragged-v1 int8
27.9 ms/step).

Methodology (verify-skill learnings): N decode steps chained inside ONE jit
via lax.fori_loop with a data dependency (argmax of each step's logits
feeds the next token), caches donated so XLA updates in place, one host
sync per measurement (float() of a scalar), 2 timed reps after the compile
warmup, min taken. Random weights/caches generated ON device.

Usage: python scripts/bench_attention_ab.py   (TPU; ~10 min of compiles
first run, seconds after via the persistent compilation cache)
Env: AB_STEPS (default 32), AB_CONFIGS (comma list to subset, e.g.
"dense:bf16,ragged8:int8"), AB_S, AB_B. AB_WINDOW=W overlays a
gemma3-style 5-local:1-global layer_windows stack (window W) on the same
1.5B geometry — measures the BANDED ragged path (window-clipped DMA
ranges, O(W) traffic on 5/6 of the layers) against dense full-S reads.
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
import lapha_tpu.ops.ragged_decode_attention as rda

_ORIG_RAGGED = rda.ragged_decode_attention


def make_caches(cfg, S, B, quant: bool, seed: int):
    # GB-scale buffers: generate at the FINAL dtype (an f32 intermediate
    # for the (L,B,nkv,S,dh) panels is 11 GB by itself -> instant OOM)
    L = cfg.num_hidden_layers
    nkv, dh = cfg.num_key_value_heads, cfg.head_dim_
    ks = jax.random.split(jax.random.key(seed), 4)
    shape = (L, B, nkv, S, dh)
    if quant:
        def rand_i8(key):
            # bits() at uint8 can materialize a full-size uint32 buffer
            # (5.6 GB here) -> generate quarter-size u32 and bitcast
            u32 = jax.random.bits(key, shape[:-1] + (dh // 4,), jnp.uint32)
            return jax.lax.bitcast_convert_type(
                u32, jnp.uint8).reshape(shape).astype(jnp.int8)

        ck = rand_i8(ks[0])
        cv = rand_i8(ks[1])
        scl = (jax.random.uniform(ks[2], (L, B, nkv, S), jnp.float32, 0.005, 0.02),
               jax.random.uniform(ks[3], (L, B, nkv, S), jnp.float32, 0.005, 0.02))
        return ck, cv, scl
    half = jnp.asarray(0.5, cfg.dtype)
    ck = jax.random.normal(ks[0], shape, cfg.dtype) * half
    cv = jax.random.normal(ks[1], shape, cfg.dtype) * half
    return ck, cv, None


@functools.partial(jax.jit, static_argnames=("cfg", "N", "ragged"),
                   donate_argnums=(1, 2, 3))
def run_steps(params, ck, cv, scl, tok, pos, slot0, lens, dstart, *, cfg, N,
              ragged):
    def body(i, st):
        tok, pos, slot, ck, cv, scl, acc = st
        if scl is not None:
            logits, _, ck, cv, scl = qwen2.decode_step(
                params, cfg, tok, pos, ck, cv, slot, lens, dstart,
                ragged=ragged, cache_scale=scl)
        else:
            logits, _, ck, cv = qwen2.decode_step(
                params, cfg, tok, pos, ck, cv, slot, lens, dstart,
                ragged=ragged)
        # data dependency step->step so XLA cannot dedupe/reorder the chain
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        return tok, pos + 1, slot + 1, ck, cv, scl, acc + logits[0, 0]

    st = jax.lax.fori_loop(
        0, N, body, (tok, pos, slot0, ck, cv, scl, jnp.float32(0.0)))
    # return the caches so the donated inputs can alias outputs (otherwise
    # XLA keeps both live and the program needs 2x cache memory)
    return st[-1], st[3], st[4], st[5]


def main():
    tiny = os.getenv("AB_TINY") == "1"  # CPU harness smoke (dense paths only)
    assert tiny or jax.devices()[0].platform != "cpu", \
        "A/B is a hardware measurement (AB_TINY=1 for a CPU harness smoke)"
    S = int(os.getenv("AB_S", "512" if tiny else "4096"))
    B = int(os.getenv("AB_B", "8" if tiny else "48"))
    N = int(os.getenv("AB_STEPS", "4" if tiny else "32"))
    if tiny:
        cfg = Qwen2Config.tiny(max_position_embeddings=S, dtype=jnp.float32)
    else:
        cfg = Qwen2Config(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
            max_position_embeddings=S, rope_theta=1e6, dtype=jnp.bfloat16,
        )
    W = int(os.getenv("AB_WINDOW", "0"))
    if W:
        # AB_PATTERN=gemma (default): every 6th layer global, rest windowed
        # (gemma3). AB_PATTERN=alt: alternating sliding/full (gpt_oss).
        pat = os.getenv("AB_PATTERN", "gemma")
        cfg = dataclasses.replace(cfg, layer_windows=tuple(
            (0 if (i + 1) % 6 == 0 else W) if pat == "gemma"
            else (W if i % 2 == 0 else 0)
            for i in range(cfg.num_hidden_layers)))
    if os.getenv("AB_SINKS") == "1":
        # gpt_oss learned per-head sinks: measures the m0=sink/l0=1 ragged
        # fold vs _sink_softmax on the dense path (VERDICT round-3 weak #1:
        # sink models used to force dense everywhere)
        cfg = dataclasses.replace(cfg, attn_sinks=True)
    params = qwen2.init_params(cfg, jax.random.key(0))
    if cfg.attn_sinks:
        params["layers"]["attn"]["sinks"] = jax.random.normal(
            jax.random.key(42),
            (cfg.num_hidden_layers, cfg.num_attention_heads),
            jnp.float32)

    rng = np.random.default_rng(0)
    lmax = min(400, S // 4)
    lens = jnp.asarray(rng.integers(lmax, lmax + S // 16, B), jnp.int32)
    # scheduler geometry: decode columns live past the prompt slab (S//2),
    # per-row dstart deliberately NOT chunk-aligned (post-compaction rows)
    dstart = jnp.asarray(S // 2 + rng.integers(0, min(37, S // 16), B), jnp.int32)
    # ~600 decode cols already occupied (mid-generation; same regime as the
    # v1 A/B recorded in BASELINE.md), clamped so slot0+N stays inside S
    docc = min(600, S // 2 - N - 8)
    slot0 = jnp.asarray(S // 2 + docc, jnp.int32)
    pos0 = lens + docc
    tok0 = jnp.asarray(rng.integers(2, cfg.vocab_size, B), jnp.int32)

    configs = [
        ("dense", "bf16", None), ("dense", "int8", None),
        ("ragged4", "bf16", 4), ("ragged8", "bf16", 8), ("ragged16", "bf16", 16),
        ("ragged4", "int8", 4), ("ragged8", "int8", 8), ("ragged16", "int8", 16),
    ]
    subset = os.getenv("AB_CONFIGS")
    if subset:
        want = set(subset.split(","))
        configs = [c for c in configs if f"{c[0]}:{c[1]}" in want]

    if os.getenv("AB_SUBPROC", "1") == "1" and len(configs) > 1:
        # One config per subprocess: on the remote-TPU platform a finished
        # config's device buffers are not reliably reclaimed in-process
        # (measured: config 1 runs, configs 2..8 RESOURCE_EXHAUSTED), and a
        # crash/hang in one variant must not kill the sweep. The persistent
        # compilation cache makes per-process recompiles cheap.
        import subprocess

        results = {}
        for name, kv, _ in configs:
            env = dict(os.environ, AB_CONFIGS=f"{name}:{kv}", AB_SUBPROC="0")
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               capture_output=True, text=True, env=env,
                               timeout=3600)
            parsed = None
            for line in reversed(r.stdout.splitlines()):
                if line.startswith("{"):
                    parsed = json.loads(line)
                    break
            label = f"{name}:{kv}"
            if parsed and label in parsed.get("ms_per_step", {}):
                results[label] = parsed["ms_per_step"][label]
            else:
                tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
                results[label] = "SUBPROC-FAIL: " + " | ".join(tail)[:200]
            print(f"{label:>14}: {results[label]}", flush=True)
        print(json.dumps({"shape": {"S": S, "B": B, "steps": N},
                          "ms_per_step": results}), flush=True)
        return

    results = {}
    for i, (name, kv, block_rows) in enumerate(configs):
        ragged = name.startswith("ragged")
        if i > 0:
            # block_rows enters via monkeypatch, NOT run_steps' jit cache
            # key (static args are cfg/N/ragged only): without this, later
            # ragged configs silently re-execute the first config's
            # compiled program and their rows are mislabeled copies
            jax.clear_caches()
        if block_rows is not None:
            rda.ragged_decode_attention = functools.partial(
                _ORIG_RAGGED, block_rows=block_rows)
        else:
            rda.ragged_decode_attention = _ORIG_RAGGED
        quant = kv == "int8"
        label = f"{name}:{kv}"
        try:
            t0 = time.perf_counter()
            caches = make_caches(cfg, S, B, quant, seed=1)
            out = run_steps(params, *caches, tok0, pos0, slot0, lens,
                            dstart, cfg=cfg, N=N, ragged=ragged)
            _ = float(out[0])
            del out, caches
            t_compile = time.perf_counter() - t0
            times = []
            for rep in range(2):
                caches = make_caches(cfg, S, B, quant, seed=2 + rep)
                _ = float(jnp.sum(caches[0][0, 0, 0, 0]))  # sync cache gen
                t0 = time.perf_counter()
                out = run_steps(params, *caches, tok0, pos0, slot0, lens,
                                dstart, cfg=cfg, N=N, ragged=ragged)
                _ = float(out[0])
                times.append(time.perf_counter() - t0)
                del out, caches
            ms = min(times) / N * 1e3
            results[label] = round(ms, 2)
            print(f"{label:>14}: {ms:7.2f} ms/step  (compile+warm "
                  f"{t_compile:.0f}s, reps {[round(t/N*1e3,2) for t in times]})",
                  flush=True)
        except Exception as e:  # keep going: one bad config ≠ dead A/B
            results[label] = f"ERROR: {type(e).__name__}: {e}"[:200]
            print(f"{label:>14}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            rda.ragged_decode_attention = _ORIG_RAGGED

    print(json.dumps({"shape": {"S": S, "B": B, "steps": N},
                      "ms_per_step": results}), flush=True)


if __name__ == "__main__":
    main()

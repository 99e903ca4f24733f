#!/usr/bin/env python
"""Op-level profile of the GRPO+value training step (train-MFU chase).

BASELINE.md: full-1.5B 4k-context training with the Pallas flash kernel
runs at 7.45 s/step (4.4k tok/s) with OPT=sgd — roughly 25-35% MFU
depending on how remat recompute is counted. This script traces N update
steps (same harness as bench_train) and aggregates XLA op durations so
the step cost is attributed to NAMED op classes: flash fwd kernel, flash
bwd kernel, matmul fusions, remat recompute, optimizer update.

Usage: python scripts/profile_train.py          (TPU)
Env: same knobs as bench_train (NL/BB/LP/LC/OPT/ATTN) plus
PT_STEPS (default 2), PT_TRACE_DIR (/tmp/train_trace), PT_TOP (40).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import lapha_tpu

lapha_tpu.apply_platform_env()
lapha_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from profile_decode import aggregate_trace  # noqa: E402
from lapha_tpu.models import Qwen2Config, qwen2, value_model  # noqa: E402
from lapha_tpu.parallel import make_mesh, shard_params  # noqa: E402
from lapha_tpu.train import losses  # noqa: E402


def main():
    assert jax.devices()[0].platform != "cpu", "profile is a TPU measurement"
    impl = os.getenv("ATTN", "pallas")
    nsteps = int(os.getenv("PT_STEPS", "2"))
    trace_dir = os.getenv("PT_TRACE_DIR", "/tmp/train_trace")
    top = int(os.getenv("PT_TOP", "40"))

    cfg = Qwen2Config(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_hidden_layers=int(os.getenv("NL", "28")), num_attention_heads=12,
        num_key_value_heads=2, max_position_embeddings=8192, rope_theta=1e6,
        dtype=jnp.bfloat16)
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    mesh = make_mesh(None, 1)
    params = shard_params(params, mesh)
    if os.getenv("OPT", "sgd") == "sgd":  # sgd default: isolates fwd/bwd cost
        optimizer = optax.sgd(1e-6)
    else:
        optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-6))

    rng = np.random.default_rng(0)
    B = int(os.getenv("BB", "8"))
    Lp, Lc = int(os.getenv("LP", "3072")), int(os.getenv("LC", "1024"))
    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, Lp).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, Lc).tolist())
               for _ in range(B)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1,
                                 max_prompt_length=Lp, pad_multiple=128,
                                 batch_multiple=1)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = batch["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng.uniform(size=Bb).astype(np.float32))

    update = losses.make_update_fn(cfg, optimizer, loss_kwargs=dict(
        temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
        importance_level="token", value_w=1.0, beta=0.0,
        max_completion_length=Lc,
        remat=os.getenv("REMAT", "1") in ("1", "true"), attn_impl=impl))
    o = optimizer.init((params, head))
    with mesh:
        t0 = time.perf_counter()
        p, h, o, m = update(params, head, o, batch, None)
        _ = float(np.asarray(m["loss"]))
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        p, h, o, m = update(p, h, o, batch, None)
        _ = float(np.asarray(m["loss"]))
        t_steady = time.perf_counter() - t0
        print(f"steady: {t_steady:.2f} s/step (compile+warm {t_compile:.0f}s)",
              flush=True)

        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            for _ in range(nsteps):
                p, h, o, m = update(p, h, o, batch, None)
            _ = float(np.asarray(m["loss"]))
            t_traced = (time.perf_counter() - t0) / nsteps
    print(f"traced: {t_traced:.2f} s/step", flush=True)

    rows, kind = aggregate_trace(trace_dir, top)
    if rows is None:
        print("TRACE-PARSE-FAIL:", kind, flush=True)
        return
    print(f"--- top ops by total duration ({kind} events, {nsteps} steps) ---",
          flush=True)
    for r in rows:
        print(f"{r['total_ms']:>10.3f} ms  x{r['calls']:<6} {r['name'][:110]}",
              flush=True)
    ntok = int(np.asarray(batch["attn"]).sum())
    print(json.dumps({"shape": {"B": B, "Lp": Lp, "Lc": Lc,
                                "layers": cfg.num_hidden_layers,
                                "attn": impl, "steps": nsteps},
                      "s_per_step_steady": round(t_steady, 2),
                      "tok_per_s": round(ntok / t_steady, 1),
                      "event_kind": kind, "top_ops": rows[:20]}), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Op-level profile of the sync engine's decode step (floor chase).

BASELINE.md: steady decode = 7.4 ms/step at B=48 / S=896 / 1.5B bf16 vs a
~5.9 ms composite HBM floor; the remainder was attributed to "per-layer
small-op latency" by phase timers. This script captures a jax.profiler
trace of N chained decode steps (same harness as bench_attention_ab:
argmax-chained fori_loop, donated caches, one host sync) and aggregates
the XLA op durations so the remainder is attributed to NAMED ops —
which fusions / copies / reduces to collapse next.

Usage: python scripts/profile_decode.py        (TPU)
Env: PD_S (default 896), PD_B (48), PD_STEPS (32), PD_KV (bf16|int8),
PD_TRACE_DIR (default /tmp/decode_trace), PD_TOP (40).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import lapha_tpu

lapha_tpu.apply_platform_env()
lapha_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench_attention_ab import make_caches, run_steps  # noqa: E402
from lapha_tpu.models import Qwen2Config, qwen2  # noqa: E402


def aggregate_trace(trace_dir: str, top: int):
    """Sum event durations per op name from the newest .trace.json.gz.

    Device rows (pids whose process name mentions TPU / 'XLA Ops') are
    preferred; if none exist (host-only trace on this platform) everything
    with a duration is aggregated and the caller should read names
    accordingly."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return None, "no trace files under " + trace_dir
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if re.search(r"TPU|/device|XLA", n or "", re.I)}
    use_all = not device_pids
    total = defaultdict(float)
    count = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if not use_all and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        total[name] += ev["dur"]
        count[name] += 1
    rows = sorted(total.items(), key=lambda kv: -kv[1])[:top]
    return [{"name": n, "total_ms": round(d / 1e3, 3), "calls": count[n]}
            for n, d in rows], ("host-only" if use_all else "device")


def main():
    assert jax.devices()[0].platform != "cpu", "profile is a TPU measurement"
    S = int(os.getenv("PD_S", "896"))
    B = int(os.getenv("PD_B", "48"))
    N = int(os.getenv("PD_STEPS", "32"))
    kv = os.getenv("PD_KV", "bf16")
    wq = os.getenv("PD_QUANT")  # int8 | int4 weight quantization (bench.py)
    trace_dir = os.getenv("PD_TRACE_DIR", "/tmp/decode_trace")
    top = int(os.getenv("PD_TOP", "40"))

    cfg = Qwen2Config(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
        max_position_embeddings=S, rope_theta=1e6, dtype=jnp.bfloat16,
    )
    if wq in ("int8", "int4"):
        from lapha_tpu.models.quant import init_params_quantized

        params = init_params_quantized(cfg, seed=0,
                                       bits=4 if wq == "int4" else 8)
    else:
        params = qwen2.init_params(cfg, jax.random.key(0))

    # sync-engine geometry: uniform prompt length, dstart == lens (no
    # continuous-batching holes), decode columns immediately after the
    # prompt — the exact shape behind BASELINE.md's 7.4 ms/step figure
    rng = np.random.default_rng(0)
    Lp = min(512, S - N - 8)
    lens = jnp.full((B,), Lp, jnp.int32)
    dstart = lens
    docc = max(0, min(S - Lp - N - 4, 320))  # mid-generation occupancy
    slot0 = jnp.asarray(Lp + docc, jnp.int32)
    pos0 = lens + docc
    tok0 = jnp.asarray(rng.integers(2, cfg.vocab_size, B), jnp.int32)

    def one(seed):
        caches = make_caches(cfg, S, B, kv == "int8", seed=seed)
        _ = float(jnp.sum(caches[0][0, 0, 0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        out = run_steps(params, *caches, tok0, pos0, slot0, lens, dstart,
                        cfg=cfg, N=N, ragged=False)
        _ = float(out[0])
        dt = time.perf_counter() - t0
        del out, caches
        return dt

    t_compile = one(1)  # compile + warm
    t_steady = one(2)
    print(f"steady: {t_steady / N * 1e3:.2f} ms/step "
          f"(compile+warm {t_compile:.0f}s)", flush=True)

    with jax.profiler.trace(trace_dir):
        t_traced = one(3)
    print(f"traced run: {t_traced / N * 1e3:.2f} ms/step", flush=True)

    rows, kind = aggregate_trace(trace_dir, top)
    if rows is None:
        print("TRACE-PARSE-FAIL:", kind, flush=True)
        return
    print(f"--- top ops by total duration ({kind} events, {N} steps) ---",
          flush=True)
    for r in rows:
        print(f"{r['total_ms']:>10.3f} ms  x{r['calls']:<6} {r['name'][:110]}",
              flush=True)
    print(json.dumps({"shape": {"S": S, "B": B, "steps": N, "kv": kv},
                      "ms_per_step_steady": round(t_steady / N * 1e3, 2),
                      "event_kind": kind, "top_ops": rows[:20]}), flush=True)


if __name__ == "__main__":
    main()

"""Continuous batching: cross-request admission into a running decode batch."""

import threading
import time

import jax
import numpy as np
import pytest

from lapha_tpu.engine import ContinuousEngine, Engine, SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    eng = Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    ce = ContinuousEngine(eng, prompt_slab=128, chunk=4)
    ce.start()
    yield eng, ce
    ce.stop()


def test_greedy_matches_sync_engine(setup):
    eng, ce = setup
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    prompts = ["hello there general", "another prompt entirely different"]
    ref = [r.outputs[0].token_ids for r in eng.generate(prompts, sp)]
    got = [r.outputs[0].token_ids for r in ce.generate(prompts, sp)]
    assert got == ref


def test_n_samples_and_schema(setup):
    _, ce = setup
    sp = SamplingParams(n=3, temperature=0.7, max_tokens=6, seed=5)
    out = ce.generate(["sample me plenty"], sp)[0]
    assert len(out.outputs) == 3
    for o in out.outputs:
        assert len(o.token_ids) == len(o.token_logprobs) <= 6
        assert np.isfinite(o.cumulative_logprob)


def test_late_request_does_not_wait_for_long_one(setup):
    """Request B (budget 6), submitted mid-decode of A (budget 96), must
    complete long before A does — the continuous-batching acceptance test
    (VERDICT round-1 item 5)."""
    _, ce = setup
    spA = SamplingParams(n=1, temperature=0.9, max_tokens=96, seed=1)
    spB = SamplingParams(n=1, temperature=0.9, max_tokens=6, seed=2)

    futA = ce.submit("a very long running request", spA)
    # wait until A is actually decoding
    t0 = time.time()
    while ce.steps_executed == 0 and time.time() - t0 < 60:
        time.sleep(0.01)
    assert not futA.done()
    futB = ce.submit("tiny one", spB)
    outB = futB.result(timeout=120)
    done_A_when_B_finished = futA.done()
    outA = futA.result(timeout=120)
    assert len(outB.outputs[0].token_ids) == 6
    assert len(outA.outputs[0].token_ids) == 96
    assert not done_A_when_B_finished, "B should finish while A still runs"


def test_many_concurrent_requests(setup):
    """More requests than rows: later ones queue and still complete."""
    _, ce = setup
    sp = SamplingParams(n=1, temperature=0.5, max_tokens=5, seed=9)
    futs = [ce.submit(f"prompt number {i} with some words", sp) for i in range(20)]
    outs = [f.result(timeout=300) for f in futs]
    assert all(len(o.outputs[0].token_ids) == 5 for o in outs)


def test_compaction_reclaims_columns():
    """When column space blocks an admission, compaction folds active rows'
    decode tokens into their prefixes and the request admits mid-wave
    instead of waiting for the drain — greedy outputs stay exact."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(5))
    eng = Engine(params, cfg, ByteTok(), max_model_len=96, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    # slab 32 -> only 64 decode columns; A consumes 40 of them
    ce = ContinuousEngine(eng, prompt_slab=32, chunk=4)
    ce.start()
    try:
        spA = SamplingParams(n=1, temperature=0.0, max_tokens=60)
        spB = SamplingParams(n=1, temperature=0.0, max_tokens=40)
        futA = ce.submit("long A", spA)
        t0 = time.time()
        # let A burn >24 columns so B (40 cols) no longer fits: col > 56
        while ce.steps_executed < 30 and time.time() - t0 < 60:
            time.sleep(0.01)
        futB = ce.submit("short b", spB)  # col ~62: 62+40 > 96 -> compaction
        outB = futB.result(timeout=120)
        outA = futA.result(timeout=120)
        assert len(outA.outputs[0].token_ids) == 60
        assert len(outB.outputs[0].token_ids) == 40
        assert getattr(ce, "compactions", 0) >= 1, "compaction never triggered"
        # exactness: same greedy tokens as the sync engine
        sp = SamplingParams(n=1, temperature=0.0, max_tokens=40)
        ref = eng.generate(["short b"], sp)[0].outputs[0].token_ids
        assert outB.outputs[0].token_ids == ref
    finally:
        ce.stop()


def test_moe_model_through_scheduler():
    """Continuous batching with a sparse-MoE model: the scheduler's decode
    path runs qwen2.decode_step's MoE branch; greedy == sync engine."""
    cfg = Qwen2Config.tiny(vocab_size=300, num_experts=4, num_experts_per_tok=2,
                           moe_intermediate_size=32,
                           shared_expert_intermediate_size=48,
                           tie_word_embeddings=False)
    params = qwen2.init_params(cfg, jax.random.key(11))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    ce = ContinuousEngine(eng, prompt_slab=64, chunk=4)
    ce.start()
    try:
        sp = SamplingParams(n=1, temperature=0.0, max_tokens=6)
        prompts = ["moe scheduling", "expert routing request"]
        ref = [r.outputs[0].token_ids for r in eng.generate(prompts, sp)]
        got = [r.outputs[0].token_ids for r in ce.generate(prompts, sp)]
        assert got == ref
    finally:
        ce.stop()


def test_auto_continuous_overlaps_waves():
    """Engine(auto_continuous=True): a batch larger than one device wave
    routes through the internal scheduler and OVERLAPS what the sync path
    serializes — measured in device decode steps: continuous executes
    fewer total steps than the sum of per-wave maxima (rows finishing
    early are replaced mid-stream; VERDICT r2 weak #6 / vLLM continuous
    batching over a whole eval set)."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(9))
    rng = np.random.default_rng(5)
    prompts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 12))
               for _ in range(12)]

    # probe greedy streams (no EOS) and pick an EOS token that appears
    # EARLY in some streams and late/never in others -> skewed lengths
    probe = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                   decode_chunk=8, pad_multiple=16, batch_bucket=1,
                   eos_token_ids=[], prefix_cache_bytes=0)
    sp0 = SamplingParams(n=1, temperature=0.0, max_tokens=32)
    streams = [r.outputs[0].token_ids
               for r in probe.generate(prompts, sp0)]
    # choose an EOS SET that stops ~half the rows early (tiny random
    # models rarely share tokens across rows, so one token is not enough):
    # greedily add each row's position-~8 token until 6 rows stop early
    def lengths_for(eos_set):
        return [next((i + 1 for i, t in enumerate(s) if t in eos_set), len(s))
                for s in streams]

    eos_set: set = set()
    for s in streams:
        if sum(l < 32 for l in lengths_for(eos_set)) >= 8:
            break
        eos_set.add(s[7])
    # order prompts so every sync wave of 4 contains one LONG row (the
    # wave then costs its slowest row): the packing the sync path cannot
    # avoid and continuous batching dissolves
    L = lengths_for(eos_set)
    by_len = sorted(range(12), key=lambda i: -L[i])
    order = []
    for w in range(3):
        order.append(by_len[w])              # one long row per wave
        order.extend(by_len[3:][w * 3:w * 3 + 3])  # three short rows
    prompts = [prompts[i] for i in order]
    streams = [streams[i] for i in order]

    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=sorted(eos_set), prefix_cache_bytes=0,
                 auto_continuous=True)
    outs = eng.generate(prompts, sp0)
    assert eng._auto_sched is not None, "batch did not route to the scheduler"
    d_cont = eng._auto_sched.steps_executed

    lengths = [len(r.outputs[0].token_ids) for r in outs]
    assert len(set(lengths)) > 1, f"need skewed lengths, got {lengths}"
    # the sync path decodes ceil(P/max_batch) waves, each costing its
    # slowest row (while_loop exits when ALL wave rows finish)
    d_sync = sum(max(lengths[lo:lo + 4]) for lo in range(0, 12, 4))
    assert d_cont < d_sync, (d_cont, d_sync, lengths)

    # correctness: routed outputs match the sync engine's greedy streams
    ref = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=sorted(eos_set), prefix_cache_bytes=0)
    for r, o in zip(ref.generate(prompts, sp0), outs):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids

    # small batches stay on the sync path (no extra scheduler traffic)
    before = eng._auto_sched.steps_executed
    eng.generate(prompts[:2], sp0)
    assert eng._auto_sched.steps_executed == before


def test_auto_continuous_falls_back_when_semantics_would_change():
    """Routing must be semantics-preserving (review findings): requests the
    scheduler would ALTER — n beyond its rows, budgets beyond its decode
    region — fall back to sync waves instead of raising / silently
    truncating."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(9))
    eng = Engine(params, cfg, ByteTok(), max_model_len=96, max_batch=4,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0,
                 auto_continuous=True)
    prompts = [f"pp {i}" for i in range(6)]

    # n > scheduler rows: the sync path builds one oversized wave; routing
    # would raise in submit -> must fall back (and succeed)
    sp_wide = SamplingParams(n=8, temperature=0.0, max_tokens=4)
    outs = eng.generate(prompts[:2], sp_wide)
    assert all(len(r.outputs) == 8 for r in outs)

    # budget beyond the scheduler's decode region (S=96, slab=48 -> 48
    # decode cols): the sync path sizes its cache to Lp + max_tokens and
    # emits the full budget; routing would clamp to 48 -> must fall back
    sp_long = SamplingParams(n=1, temperature=0.0, max_tokens=80)
    outs = eng.generate(prompts, sp_long)
    lens = [len(r.outputs[0].token_ids) for r in outs]
    assert all(l == 80 for l in lens), lens


def test_sliding_window_model_through_scheduler_with_compaction():
    """Sliding-window banding survives KV compaction: relocated decode
    tokens continue the prompt's positions contiguously, so decode_step's
    slot==position (prefix) / contiguous-up-to-col (decode) window terms
    stay exact. Greedy through the scheduler (compaction forced) must equal
    the sync engine (itself HF-parity-tested in test_qwen2.py)."""
    import dataclasses

    cfg = dataclasses.replace(Qwen2Config.tiny(vocab_size=300),
                              sliding_window=6)
    params = qwen2.init_params(cfg, jax.random.key(9))
    eng = Engine(params, cfg, ByteTok(), max_model_len=96, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    ce = ContinuousEngine(eng, prompt_slab=32, chunk=4)
    ce.start()
    try:
        spA = SamplingParams(n=1, temperature=0.0, max_tokens=60)
        spB = SamplingParams(n=1, temperature=0.0, max_tokens=40)
        futA = ce.submit("long A", spA)
        t0 = time.time()
        while ce.steps_executed < 30 and time.time() - t0 < 60:
            time.sleep(0.01)
        futB = ce.submit("short b", spB)
        outB = futB.result(timeout=120)
        outA = futA.result(timeout=120)
        assert getattr(ce, "compactions", 0) >= 1, "compaction never triggered"
        refA = eng.generate(["long A"], spA)[0].outputs[0].token_ids
        refB = eng.generate(["short b"], spB)[0].outputs[0].token_ids
        assert outA.outputs[0].token_ids == refA
        assert outB.outputs[0].token_ids == refB
    finally:
        ce.stop()


def test_gemma_style_mixed_window_model_through_scheduler():
    """A gemma-style heterogeneous stack (alternating sliding/full layers,
    sandwich norms, softcaps, GeGLU) decodes through the continuous
    scheduler with compaction forced, matching the sync engine greedy."""
    import dataclasses

    cfg = dataclasses.replace(
        Qwen2Config.tiny(vocab_size=300, num_hidden_layers=2),
        layer_windows=(6, 0), sandwich_norms=True, hidden_act="gelu_pytorch_tanh",
        embed_normalizer=True, query_pre_attn_scalar=24.0,
        attn_softcap=50.0, final_softcap=30.0)
    params = qwen2.init_params(cfg, jax.random.key(12))
    eng = Engine(params, cfg, ByteTok(), max_model_len=96, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    ce = ContinuousEngine(eng, prompt_slab=32, chunk=4)
    ce.start()
    try:
        spA = SamplingParams(n=1, temperature=0.0, max_tokens=60)
        spB = SamplingParams(n=1, temperature=0.0, max_tokens=40)
        futA = ce.submit("long A", spA)
        t0 = time.time()
        while ce.steps_executed < 30 and time.time() - t0 < 60:
            time.sleep(0.01)
        futB = ce.submit("short b", spB)
        outB = futB.result(timeout=120)
        outA = futA.result(timeout=120)
        assert getattr(ce, "compactions", 0) >= 1, "compaction never triggered"
        refA = eng.generate(["long A"], spA)[0].outputs[0].token_ids
        refB = eng.generate(["short b"], spB)[0].outputs[0].token_ids
        assert outA.outputs[0].token_ids == refA
        assert outB.outputs[0].token_ids == refB
    finally:
        ce.stop()


def test_deepseek_mla_through_scheduler():
    """A DeepSeek MLA model (latent MQA-shaped cache via the engine's
    model dispatch) decodes through the continuous scheduler with
    mid-stream admission and compaction, matching the sync engine."""
    from lapha_tpu.models import deepseek

    cfg = deepseek.DeepseekConfig(
        vocab_size=300, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, q_lora_rank=24,
        kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16, n_routed_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=24, n_shared_experts=1,
        first_k_dense_replace=1, scoring_func="sigmoid",
        topk_method="noaux_tc", n_group=4, topk_group=2,
        norm_topk_prob=True, dtype=jax.numpy.float32)
    params = deepseek.init_params(cfg, jax.random.key(14))
    eng = Engine(params, cfg, ByteTok(), max_model_len=96, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    ce = ContinuousEngine(eng, prompt_slab=32, chunk=4)
    ce.start()
    try:
        spA = SamplingParams(n=1, temperature=0.0, max_tokens=60)
        spB = SamplingParams(n=1, temperature=0.0, max_tokens=40)
        futA = ce.submit("long A", spA)
        t0 = time.time()
        while ce.steps_executed < 30 and time.time() - t0 < 60:
            time.sleep(0.01)
        futB = ce.submit("short b", spB)   # admitted mid-stream
        outB = futB.result(timeout=120)
        outA = futA.result(timeout=120)
        refA = eng.generate(["long A"], spA)[0].outputs[0].token_ids
        refB = eng.generate(["short b"], spB)[0].outputs[0].token_ids
        assert outA.outputs[0].token_ids == refA
        assert outB.outputs[0].token_ids == refB
    finally:
        ce.stop()

"""Block-diffusion generation (engine/diffusion.py — the native SDAR path
the reference's ENGINE=jet adapts an external JetEngine runtime for,
reference eval/adapters.py:159-379)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import DiffusionEngine, SamplingParams
from lapha_tpu.evalsuite.adapters import GenParams
from lapha_tpu.models import Qwen2Config, qwen2

MASK = 299  # reserved id in the 300-vocab tiny config (ByteTok uses 1..256)


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, skip_special_tokens=True, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    return params, cfg


def make_engine(tiny, **kw):
    params, cfg = tiny
    kw.setdefault("eos_token_ids", [])
    kw.setdefault("max_model_len", 128)
    kw.setdefault("max_batch", 8)
    kw.setdefault("pad_multiple", 32)
    kw.setdefault("batch_bucket", 2)
    return DiffusionEngine(params, cfg, ByteTok(), mask_token_id=MASK, **kw)


# ------------------------------------------------------- block_bidir mask
def test_block_bidir_mask_semantics(tiny):
    """Causal cached forward is INSENSITIVE to later in-block tokens;
    block_bidir makes earlier positions see them; neither reads invalid
    cache slots."""
    params, cfg = tiny
    S = 32
    ids = jnp.asarray([[5, 6, 7, 8]])
    kvv = jnp.arange(S)[None, :] < 4

    def logits_at0(block_bidir, last_tok, cache_fill=0.0):
        ck, cv = qwen2.init_kv_cache(cfg, 1, S)
        ck = ck + cache_fill  # garbage in invalid slots must never matter
        cv = cv + cache_fill
        x = ids.at[0, 3].set(last_tok)
        lg, _, _ = qwen2.forward(params, cfg, x, kv_cache=(ck, cv),
                                 cache_pos=0, kv_valid=kvv,
                                 block_bidir=block_bidir)
        return np.asarray(lg[0, 0])

    causal_a = logits_at0(False, 8)
    causal_b = logits_at0(False, 99)
    np.testing.assert_array_equal(causal_a, causal_b)

    bidir_a = logits_at0(True, 8)
    bidir_b = logits_at0(True, 99)
    assert np.abs(bidir_a - bidir_b).max() > 0  # position 0 sees position 3

    np.testing.assert_array_equal(bidir_a, logits_at0(True, 8, cache_fill=7.0))


# ----------------------------------------------------- manual replay parity
def manual_diffusion(params, cfg, ids, *, max_new, Tb, steps, mask_id,
                     eos_set):
    """Straight-line greedy replay of the SDAR loop ("sequential"
    strategy) with EXACT-length slots (no Lp padding, no while_loop, no
    slot-uniform batch machinery) — an independent implementation of the
    same semantics the engine's single-dispatch loop must reproduce."""
    L = len(ids)
    nblocks = math.ceil(max_new / Tb)
    S = L + nblocks * Tb
    k_reveal = max(1, math.ceil(Tb / steps))
    ck, cv = qwen2.init_kv_cache(cfg, 1, S)
    kvv = jnp.arange(S)[None, :] < L
    _, _, (ck, cv) = qwen2.forward(params, cfg, jnp.asarray([ids]),
                                   kv_cache=(ck, cv), cache_pos=0,
                                   kv_valid=kvv)
    out = []
    for b in range(nblocks):
        cp = L + b * Tb
        blk = [mask_id] * Tb
        masked = [True] * Tb
        pos = jnp.asarray([[cp + t for t in range(Tb)]])
        kvv = jnp.arange(S)[None, :] < cp + Tb
        while any(masked):
            lg, _, (ck, cv) = qwen2.forward(
                params, cfg, jnp.asarray([blk]), positions=pos,
                kv_cache=(ck, cv), cache_pos=cp, kv_valid=kvv,
                block_bidir=True)
            lg = np.array(lg[0], np.float32)  # writable copy
            lg[:, mask_id] = -np.inf
            cand = lg.argmax(-1)
            for i in [i for i in range(Tb) if masked[i]][:k_reveal]:
                blk[i] = int(cand[i])
                masked[i] = False
        # commit forward: rewrite the block's K/V from the clean tokens
        _, _, (ck, cv) = qwen2.forward(
            params, cfg, jnp.asarray([blk]), positions=pos,
            kv_cache=(ck, cv), cache_pos=cp, kv_valid=kvv, block_bidir=True)
        out.extend(blk)
        if any(t in eos_set for t in blk):
            break
    final = []
    for t in out[:max_new]:
        final.append(t)
        if t in eos_set:
            break
    return final


def test_diffusion_matches_manual_replay(tiny):
    params, cfg = tiny
    eng = make_engine(tiny, block_length=4, denoising_steps=4,
                      remasking_strategy="sequential", eos_token_ids=[0])
    for prompt in ("hello world", "abc"):
        got = eng.generate([prompt], SamplingParams(
            n=1, temperature=0.0, max_tokens=8))[0].outputs[0].token_ids
        want = manual_diffusion(
            params, cfg, eng.tokenizer(prompt)["input_ids"],
            max_new=8, Tb=4, steps=4, mask_id=MASK, eos_set={0})
        assert got == want, (prompt, got, want)


def test_diffusion_batch_matches_single(tiny):
    """Ragged batch (different prompt lengths, different Lp padding) must
    emit the same greedy streams as each prompt alone."""
    eng = make_engine(tiny, block_length=4, denoising_steps=2)
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    prompts = ["hello world, this is long enough", "hi"]
    batched = [r.outputs[0].token_ids for r in eng.generate(prompts, sp)]
    single = [eng.generate([p], sp)[0].outputs[0].token_ids for p in prompts]
    assert batched == single


# ------------------------------------------------------- strategy behavior
def test_forward_counts_per_strategy(tiny):
    """forwards = nblocks * (denoise passes + 1 commit); the dynamic
    strategy at threshold 0 reveals whole blocks in one pass (the
    tokens/forward > 1 regime)."""
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)  # 2 blocks of 4

    eng = make_engine(tiny, block_length=4, denoising_steps=4,
                      remasking_strategy="sequential")
    eng.generate(["hello"], sp)
    assert eng.last_diffusion_stats["forwards"] == 2 * (4 + 1)
    assert eng.last_diffusion_stats["tokens"] == 8

    eng = make_engine(tiny, block_length=4, denoising_steps=1,
                      remasking_strategy="low_confidence_static")
    eng.generate(["hello"], sp)
    assert eng.last_diffusion_stats["forwards"] == 2 * (1 + 1)

    eng = make_engine(tiny, block_length=4, denoising_steps=4,
                      remasking_strategy="low_confidence_dynamic",
                      dynamic_threshold=0.0)
    eng.generate(["hello"], sp)
    assert eng.last_diffusion_stats["forwards"] == 2 * (1 + 1)
    assert eng.last_diffusion_stats["tokens_per_forward"] == 2.0

    # threshold above 1: only the forced top-1 reveals per pass
    eng = make_engine(tiny, block_length=4, denoising_steps=8,
                      remasking_strategy="low_confidence_dynamic",
                      dynamic_threshold=1.1)
    eng.generate(["hello"], sp)
    assert eng.last_diffusion_stats["forwards"] == 2 * (4 + 1)


def test_greedy_threshold_one_confidence(tiny):
    """Greedy rows have confidence exactly 1.0 (temperature clamp makes the
    processed distribution one-hot), so dynamic reveals everything in one
    pass even at a 0.99 threshold."""
    eng = make_engine(tiny, block_length=4, denoising_steps=4,
                      remasking_strategy="low_confidence_dynamic",
                      dynamic_threshold=0.99)
    eng.generate(["hello"], SamplingParams(n=1, temperature=0.0, max_tokens=4))
    assert eng.last_diffusion_stats["forwards"] == 2


def test_sampled_determinism_and_mask_suppression(tiny):
    eng = make_engine(tiny, block_length=4, denoising_steps=2)
    sp = SamplingParams(n=2, temperature=1.0, max_tokens=8, seed=11)
    a = [o.token_ids for o in eng.generate(["hi"], sp)[0].outputs]
    b = [o.token_ids for o in eng.generate(["hi"], sp)[0].outputs]
    assert a == b
    assert all(MASK not in ids for ids in a)
    assert a[0] != a[1]  # distinct per-sample streams


def test_eos_truncation_and_finish_reason(tiny):
    """Engine stops dispatching blocks once every row committed an EOS and
    truncates host-side at the first EOS."""
    params, cfg = tiny
    eng = make_engine(tiny, block_length=4, denoising_steps=1)
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=16)
    full = eng.generate(["hello"], sp)[0].outputs[0]
    assert full.finish_reason == "length" and len(full.token_ids) == 16

    # make some emitted token the EOS: pick one from the untruncated stream
    eos = full.token_ids[5]
    eng2 = make_engine(tiny, block_length=4, denoising_steps=1,
                       eos_token_ids=[eos])
    out = eng2.generate(["hello"], sp)[0].outputs[0]
    assert out.finish_reason == "stop"
    assert out.token_ids == full.token_ids[:6]
    # blocks after the EOS block were never dispatched
    assert eng2.last_diffusion_stats["forwards"] <= eng.last_diffusion_stats["forwards"]


def test_per_request_dynamic_threshold(tiny):
    """GenParams.dynamic_threshold overrides the engine default."""
    eng = make_engine(tiny, block_length=4, denoising_steps=4,
                      remasking_strategy="low_confidence_dynamic",
                      dynamic_threshold=1.1)
    sp = GenParams(n=1, temperature=0.0, max_tokens=4, dynamic_threshold=0.0)
    eng.generate(["hello"], sp)
    assert eng.last_diffusion_stats["forwards"] == 2  # one pass + commit


# ------------------------------------------------------------------ guards
def test_diffusion_guards(tiny):
    params, cfg = tiny
    with pytest.raises(ValueError, match="collect h0"):
        make_engine(tiny, collect_h0=True)
    with pytest.raises(ValueError, match="kv_quant"):
        make_engine(tiny, kv_quant="int8")
    with pytest.raises(ValueError, match="spec_decode|seq_mesh"):
        make_engine(tiny, spec_decode="pld")
    with pytest.raises(ValueError, match="remasking_strategy"):
        make_engine(tiny, remasking_strategy="nope")
    with pytest.raises(ValueError, match="vocab"):
        DiffusionEngine(params, cfg, ByteTok(), mask_token_id=300)


def test_jet_adapter_builds_diffusion_engine(tmp_path, monkeypatch):
    from lapha_tpu.evalsuite.adapters import build_engine_adapter
    from tests.model_fixtures import build_tiny_model_dir

    d = build_tiny_model_dir(str(tmp_path / "m"))
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(d)
    monkeypatch.setenv("SDAR_MASK_TOKEN_ID", "7")
    monkeypatch.setenv("SDAR_BLOCK_LENGTH", "2")
    eng = build_engine_adapter("jet", tokenizer=tok, model_path=d,
                               max_model_len=128, max_batch=4)
    assert isinstance(eng, DiffusionEngine)
    assert eng.mask_token_id == 7 and eng.block_length == 2
    out = eng.generate(["hello"], GenParams(n=1, temperature=0.0,
                                            max_tokens=4))[0]
    assert len(out.outputs[0].token_ids) >= 1


# --------------------------------------------- continuous batching (round 5)
def test_diffusion_through_scheduler_greedy_matches_sync(tiny):
    """ContinuousEngine over a DiffusionEngine: greedy block-diffusion
    through the persistent batch must equal the sync loop token-for-token
    (same prefill, same absolute positions, same commit invariant)."""
    from lapha_tpu.engine import ContinuousEngine

    eng = make_engine(tiny, block_length=4, denoising_steps=4)
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=12)
    prompts = ["hello there general", "a different prompt entirely"]
    ref = [r.outputs[0].token_ids for r in eng.generate(prompts, sp)]
    ce = ContinuousEngine(eng, prompt_slab=64)
    assert ce.diffusion and ce.chunk == 4 and not ce.ragged
    ce.start()
    try:
        got = [r.outputs[0].token_ids for r in ce.generate(prompts, sp)]
    finally:
        ce.stop()
    assert got == ref
    assert all(len(t) == 12 for t in got)


def test_diffusion_scheduler_late_request_interleaves(tiny):
    """A short request submitted mid-wave of a long one finishes first —
    the continuous-batching property, now for block-diffusion."""
    import time

    from lapha_tpu.engine import ContinuousEngine

    eng = make_engine(tiny, block_length=4, denoising_steps=2)
    ce = ContinuousEngine(eng, prompt_slab=64)
    ce.start()
    try:
        t0 = time.time()
        fa = ce.submit("long running request", SamplingParams(
            n=1, temperature=0.0, max_tokens=48))
        time.sleep(0.3)
        fb = ce.submit("short", SamplingParams(
            n=1, temperature=0.0, max_tokens=4))
        rb = fb.result(timeout=120)
        tb = time.time() - t0
        ra = fa.result(timeout=120)
        ta = time.time() - t0
    finally:
        ce.stop()
    assert len(rb.outputs[0].token_ids) == 4
    assert len(ra.outputs[0].token_ids) == 48
    assert tb < ta


def test_diffusion_scheduler_budget_trims_mid_block(tiny):
    """max_tokens that is NOT a block multiple: the row emits whole
    blocks on-device but the host trims to the requested budget."""
    from lapha_tpu.engine import ContinuousEngine

    eng = make_engine(tiny, block_length=4, denoising_steps=2)
    ce = ContinuousEngine(eng, prompt_slab=64)
    ce.start()
    try:
        out = ce.generate(["trim me"], SamplingParams(
            n=1, temperature=0.0, max_tokens=6))[0]
    finally:
        ce.stop()
    assert len(out.outputs[0].token_ids) == 6
    assert out.outputs[0].finish_reason == "length"
    # sync path agrees on the shared prefix
    ref = eng.generate(["trim me"], SamplingParams(
        n=1, temperature=0.0, max_tokens=6))[0]
    assert out.outputs[0].token_ids == ref.outputs[0].token_ids


def test_diffusion_auto_continuous_oversized_batch(tiny):
    """auto_continuous now composes with diffusion: a batch larger than
    max_batch routes through the internal scheduler and matches the
    sync waves output greedily."""
    eng_sync = make_engine(tiny, block_length=4, denoising_steps=2,
                           max_batch=2)
    eng_auto = make_engine(tiny, block_length=4, denoising_steps=2,
                           max_batch=2, auto_continuous=True)
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    prompts = ["first prompt", "second one", "third entry", "and a fourth"]
    ref = [r.outputs[0].token_ids for r in eng_sync.generate(prompts, sp)]
    try:
        got = [r.outputs[0].token_ids for r in eng_auto.generate(prompts, sp)]
    finally:
        if eng_auto._auto_sched is not None:
            eng_auto._auto_sched.stop()
    assert got == ref

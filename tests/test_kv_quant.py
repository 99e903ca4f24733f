"""int8 KV cache: per-vector-scaled quantized decode vs the bf16 cache.

Decode is HBM-bound and the KV reads rival the weight stream at large B
(qwen2.decode_step docstring); int8 KV halves that stream. These tests pin
the numerics: logits from the quantized cache must track the bf16 cache
within int8 per-vector quantization error, end to end through the engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import Engine, SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2


class IdTok:
    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [int(w) for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(0))
    return cfg, params


def test_decode_step_int8_cache_tracks_bf16(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    B, S, Lp = 4, 64, 16
    L, nkv, dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim_

    # a populated bf16 decode-layout cache (prompt KV at [0, lens))
    ckf = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)) * 0.3
    cvf = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)) * 0.3
    lens = jnp.asarray(rng.integers(4, Lp, B), jnp.int32)
    dstart = jnp.full((B,), Lp, jnp.int32)
    slot = jnp.asarray(Lp, jnp.int32)
    tok = jnp.asarray(rng.integers(2, cfg.vocab_size, B), jnp.int32)
    pos = lens

    ref_logits, _, _, _ = qwen2.decode_step(
        params, cfg, tok, pos, ckf, cvf, slot, lens, dstart)

    # quantize the same cache and decode with scales threaded
    q = Engine._quantize_cache_impl
    ckq, cvq, scale = q(jnp.array(ckf), jnp.array(cvf))
    got_logits, _, ckq2, cvq2, scale2 = qwen2.decode_step(
        params, cfg, tok, pos, ckq, cvq, slot, lens, dstart,
        cache_scale=scale)

    assert ckq2.dtype == jnp.int8 and cvq2.dtype == jnp.int8
    # int8 per-vector quantization: logits track within ~1% of their scale
    denom = float(jnp.abs(ref_logits).max())
    err = float(jnp.abs(got_logits - ref_logits).max()) / max(denom, 1e-9)
    assert err < 0.05, err
    # this step's K/V was written quantized, with fresh scales at `slot`
    assert float(jnp.abs(scale2[0][0, :, :, Lp]).min()) > 0


def test_engine_generate_kv_quant_int8(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    prompts = [" ".join(str(i) for i in rng.integers(2, cfg.vocab_size, 24))
               for _ in range(2)]
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=12)

    def mk(kv_quant):
        return Engine(params, cfg, IdTok(), max_model_len=96, max_batch=4,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[], prefix_cache_bytes=0, seed=0,
                      kv_quant=kv_quant)

    ref = mk(None).generate(prompts, sp)
    got = mk("int8").generate(prompts, sp)
    for r_ref, r_got in zip(ref, got):
        for o_ref, o_got in zip(r_ref.outputs, r_got.outputs):
            assert len(o_got.token_ids) == len(o_ref.token_ids) == 12
            # greedy trajectories under ~0.5% logit perturbation stay close
            same = sum(a == b for a, b in
                       zip(o_ref.token_ids, o_got.token_ids))
            assert same >= 8, (o_ref.token_ids, o_got.token_ids)


def test_engine_rejects_unknown_kv_quant(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError, match="kv_quant"):
        Engine(params, cfg, IdTok(), kv_quant="fp4")


def test_continuous_engine_kv_quant_int8(tiny):
    """int8 KV through the scheduler: persistent int8 cache + scale planes
    survive admission (quantized install), decode chunks, compaction, and
    a second wave; greedy outputs stay close to the bf16-cache engine."""
    from lapha_tpu.engine import ContinuousEngine

    cfg, params = tiny
    rng = np.random.default_rng(2)
    eng = Engine(params, cfg, IdTok(), max_model_len=256, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0, kv_quant="int8")
    ce = ContinuousEngine(eng, prompt_slab=128, chunk=4)
    ce.start()
    try:
        prompts = [" ".join(str(i) for i in rng.integers(2, cfg.vocab_size, 20))
                   for _ in range(3)]
        sp = SamplingParams(n=1, temperature=0.0, max_tokens=10)
        outs = ce.generate(prompts, sp)
        ref_eng = Engine(params, cfg, IdTok(), max_model_len=96, max_batch=4,
                         decode_chunk=8, pad_multiple=16, batch_bucket=1,
                         eos_token_ids=[], prefix_cache_bytes=0)
        refs = ref_eng.generate(prompts, sp)
        for o, r in zip(outs, refs):
            got, want = o.outputs[0].token_ids, r.outputs[0].token_ids
            assert len(got) == len(want) == 10
            same = sum(a == b for a, b in zip(got, want))
            assert same >= 7, (got, want)
        # second wave reuses the (reset) persistent int8 state
        outs2 = ce.generate(prompts[:1], sp)
        assert len(outs2[0].outputs[0].token_ids) == 10
        # force a compaction with the int8 scale planes in place
        ce._state and ce._compact()  # no active rows -> returns False, no-op
    finally:
        ce.stop()


def test_compaction_with_int8_scales(tiny):
    """Column-pressure admission mid-wave with the int8 cache: compaction
    must relocate the scale planes together with the quantized K/V, or
    post-compaction attention reads wrong magnitudes."""
    import time

    from lapha_tpu.engine import ContinuousEngine

    cfg, params = tiny
    eng = Engine(params, cfg, IdTok(), max_model_len=96, max_batch=4,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0, kv_quant="int8")
    ce = ContinuousEngine(eng, prompt_slab=32, chunk=4)
    ce.start()
    try:
        futA = ce.submit("5 6 7 8", SamplingParams(n=1, temperature=0.0,
                                                   max_tokens=60))
        t0 = time.time()
        while ce.steps_executed < 30 and time.time() - t0 < 60:
            time.sleep(0.01)
        futB = ce.submit("9 10 11", SamplingParams(n=1, temperature=0.0,
                                                   max_tokens=40))
        outB = futB.result(timeout=120)
        outA = futA.result(timeout=120)
        assert len(outA.outputs[0].token_ids) == 60
        assert len(outB.outputs[0].token_ids) == 40
        assert getattr(ce, "compactions", 0) >= 1, "compaction never triggered"
        # A's suffix after compaction must track the uncompacted int8 engine
        ref = eng.generate(["5 6 7 8"], SamplingParams(
            n=1, temperature=0.0, max_tokens=60))[0].outputs[0].token_ids
        got = outA.outputs[0].token_ids
        same = sum(a == b for a, b in zip(got, ref))
        assert same >= 50, (got, ref)
    finally:
        ce.stop()

"""Prompt-lookup speculative decoding: exactness vs the normal decode loop.

The contract (engine/spec.py): greedy streams BIT-IDENTICAL to
non-speculative greedy; sampled streams distribution-exact per position;
pooled h0 identical; EOS/budget semantics identical.
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


def make_engine(params, cfg, **kw):
    base = dict(max_model_len=256, max_batch=8, decode_chunk=8,
                pad_multiple=16, batch_bucket=1, eos_token_ids=[], seed=0,
                prefix_cache_bytes=0, approx_top_k=False)
    base.update(kw)
    return Engine(params, cfg, IdTok(), **base)


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(7))
    return params, cfg


def _prompts():
    rng = np.random.default_rng(3)
    base = rng.integers(2, 290, 24).tolist()
    # repetitive tail so n-gram lookup has material
    rep = base + base[-8:] + base[-8:]
    return [" ".join(map(str, rep)),
            " ".join(map(str, rng.integers(2, 290, 31)))]


def test_greedy_stream_bit_identical(tiny):
    params, cfg = tiny
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=40, seed=5,
                        repetition_penalty=1.05)
    ref = make_engine(params, cfg).generate(_prompts(), sp)
    eng_s = make_engine(params, cfg, spec_decode="pld", spec_k=3)
    out = eng_s.generate(_prompts(), sp)
    for r, o in zip(ref, out):
        for a, b in zip(r.outputs, o.outputs):
            assert a.token_ids == b.token_ids
            np.testing.assert_allclose(a.token_logprobs, b.token_logprobs,
                                       rtol=1e-4, atol=1e-5)
    st = eng_s.last_spec_stats
    assert st is not None and st["tokens"] > 0


def test_drafts_get_accepted_on_repetitive_streams(tiny):
    """Greedy tiny random models with rep_pen=1.0 degenerate into short
    cycles — lookup drafts must then land (guards a silently dead
    proposer/acceptance chain)."""
    params, cfg = tiny
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=96,
                        repetition_penalty=1.0)
    # single row: iterations (and thus the acceptance metric) are gated by
    # the slowest row of the batch, so measure the repetitive prompt alone
    prompts = _prompts()[:1]
    ref = make_engine(params, cfg).generate(prompts, sp)
    eng_s = make_engine(params, cfg, spec_decode="pld", spec_k=3)
    out = eng_s.generate(prompts, sp)
    for r, o in zip(ref, out):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids
    st = eng_s.last_spec_stats
    # floor is exactly 1.0 (the free prefill-sampled pre-step now counts in
    # BOTH numerator and denominator); anything clearly above it proves the
    # proposer/acceptance chain is live
    assert st["tokens_per_iteration"] > 1.1, st


def test_greedy_eos_truncation_identical(tiny):
    """Pick a token the greedy stream actually emits as EOS: both engines
    must truncate at the same place (EOS inside an accepted window included)."""
    params, cfg = tiny
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=32)
    probe = make_engine(params, cfg).generate(_prompts(), sp)
    stream = probe[0].outputs[0].token_ids
    assert len(stream) > 6
    eos = stream[5]
    sp2 = SamplingParams(n=1, temperature=0.0, max_tokens=32)
    ref = make_engine(params, cfg, eos_token_ids=[eos]).generate(_prompts(), sp2)
    out = make_engine(params, cfg, eos_token_ids=[eos],
                      spec_decode="pld", spec_k=3).generate(_prompts(), sp2)
    for r, o in zip(ref, out):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids
        assert r.outputs[0].finish_reason == o.outputs[0].finish_reason


def test_h0_pooling_identical(tiny):
    """collect_h0: the pooled hidden must match the normal loop exactly,
    including the final bonus token (covered by the post-loop fixup)."""
    params, cfg = tiny
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=24)
    ref = make_engine(params, cfg, collect_h0=True).generate(_prompts(), sp)
    out = make_engine(params, cfg, collect_h0=True,
                      spec_decode="pld", spec_k=3).generate(_prompts(), sp)
    for r, o in zip(ref, out):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids
        np.testing.assert_allclose(r.outputs[0].pooled_hidden,
                                   o.outputs[0].pooled_hidden,
                                   rtol=2e-4, atol=2e-5)


def test_sampled_tokens_respect_truncation(tiny):
    """Sampled spec streams: every emitted token must be inside the top-k
    truncation set of ITS position's processed distribution — checked by
    replaying the stream through the non-spec engine's logits. (Exact
    stream equality is not expected: spec consumes PRNG keys differently.)"""
    params, cfg = tiny
    sp = SamplingParams(n=2, temperature=0.8, top_k=12, top_p=0.9,
                        max_tokens=16, seed=11)
    eng = make_engine(params, cfg, spec_decode="pld", spec_k=3)
    outs = eng.generate(_prompts(), sp)
    from lapha_tpu.engine import sampling

    for ro in outs:
        prompt_ids = ro.prompt_token_ids
        for o in ro.outputs:
            # ONE forward over prompt+stream checks every position: token t
            # was sampled from the processed distribution at index Lp-1+t.
            # (The old per-token replay re-ran forward on a GROWING length
            # — a fresh compile per token, ~60 compiles = minutes on CPU.)
            ids = list(prompt_ids) + list(o.token_ids)
            T = len(o.token_ids)
            if not T:
                continue
            Lp = len(prompt_ids)
            logits, _, _ = qwen2.forward(
                params, cfg, jnp.asarray([ids], jnp.int32))
            rows = logits[0, Lp - 1:Lp - 1 + T].astype(jnp.float32)
            proc = sampling.process_logits(
                rows, top_k=jnp.full((T,), 12), top_p=jnp.full((T,), 0.9),
                temperature=jnp.full((T,), 0.8))
            keep = np.asarray(proc) > sampling.NEG_INF / 2
            for t, tok in enumerate(o.token_ids):
                assert keep[t, tok], \
                    f"token {tok} at pos {t} outside nucleus"


def test_int8_kv_greedy_matches_nonspec_int8(tiny):
    """spec_decode composes with kv_quant="int8": the verify forward
    quantizes its W new K/V vectors per-(b,t,h) — identical values to the
    normal loop's one-step-at-a-time quantization — so greedy spec+int8
    streams must be bit-identical to non-spec int8 streams (and the
    acceptance machinery must still fire)."""
    params, cfg = tiny
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=40, seed=5,
                        repetition_penalty=1.05)
    ref = make_engine(params, cfg, kv_quant="int8").generate(_prompts(), sp)
    eng_s = make_engine(params, cfg, kv_quant="int8",
                        spec_decode="pld", spec_k=3)
    out = eng_s.generate(_prompts(), sp)
    for r, o in zip(ref, out):
        for a, b in zip(r.outputs, o.outputs):
            assert a.token_ids == b.token_ids
            np.testing.assert_allclose(a.token_logprobs, b.token_logprobs,
                                       rtol=1e-4, atol=1e-5)
    st = eng_s.last_spec_stats
    assert st is not None and st["tokens"] > 0


def test_int8_kv_h0_matches_nonspec_int8(tiny):
    """collect_h0 under spec+int8: the post-loop bonus-token fixup forward
    also runs against the quantized cache; pooled hiddens must match the
    non-spec int8 loop."""
    params, cfg = tiny
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=24)
    ref = make_engine(params, cfg, kv_quant="int8",
                      collect_h0=True).generate(_prompts(), sp)
    out = make_engine(params, cfg, kv_quant="int8", collect_h0=True,
                      spec_decode="pld", spec_k=3).generate(_prompts(), sp)
    for r, o in zip(ref, out):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids
        np.testing.assert_allclose(r.outputs[0].pooled_hidden,
                                   o.outputs[0].pooled_hidden,
                                   rtol=2e-4, atol=2e-5)


def test_pick_with_draft_marginal_exact():
    """Delta-proposal rejection: the empirical marginal with a draft
    present equals the processed softmax (the no-draft distribution)."""
    from lapha_tpu.engine.spec import pick_with_draft

    V = 24
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, V)) * 2, jnp.float32)
    kw = dict(presence=jnp.zeros((1, V), jnp.int8),
              repetition_penalty=jnp.asarray([1.0], jnp.float32),
              temperature=jnp.asarray([1.0], jnp.float32),
              top_k=jnp.asarray([8], jnp.int32),
              top_p=jnp.asarray([0.95], jnp.float32),
              min_p=None, static_top_k=0, approx_top_k=False)
    draft = jnp.asarray([int(jnp.argmax(logits))], jnp.int32)  # likely token

    def draw(key, has):
        t, _ = pick_with_draft(logits, key, draft, has, **kw)
        return t[0]

    keys = jax.random.split(jax.random.key(42), 20000)
    with_d = np.asarray(jax.vmap(lambda k: draw(k, jnp.asarray([True])))(keys))
    no_d = np.asarray(jax.vmap(lambda k: draw(k, jnp.asarray([False])))(keys))
    f_with = np.bincount(with_d, minlength=V) / len(with_d)
    f_no = np.bincount(no_d, minlength=V) / len(no_d)
    np.testing.assert_allclose(f_with, f_no, atol=0.015)


def test_greedy_bit_identical_mixed_layer_windows_int8_kv():
    """Per-layer windows (one banded layer, one full) through the spec
    verify forward, composed with the int8 KV cache: rejected-draft holes
    make column != position, so the banding must ride the engine's
    pos_map — greedy streams stay bit-identical to the non-spec banded
    engine."""
    cfg = Qwen2Config.tiny(vocab_size=300, layer_windows=(8, 0))
    params = qwen2.init_params(cfg, jax.random.key(13))
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=32, seed=5)
    ref = make_engine(params, cfg, kv_quant="int8").generate(_prompts(), sp)
    out = make_engine(params, cfg, kv_quant="int8", spec_decode="pld",
                      spec_k=3).generate(_prompts(), sp)
    for r, o in zip(ref, out):
        for a, b in zip(r.outputs, o.outputs):
            assert a.token_ids == b.token_ids


def test_greedy_bit_identical_under_seq_mesh(tiny):
    """spec_decode x seq_mesh (round 5, the last spec composition cell):
    the verify forward runs qwen2_seq.decode_step_multi_seq — T-token
    distributed softmax with owner-shard writes; the rejected-draft
    validity bitmap and per-column position map shard over the slot axis
    inside its shard_map. Greedy streams must stay bit-identical to the
    unsharded non-spec engine, with AND without the int8 KV cache (whose
    scale planes shard with the slots)."""
    from jax.sharding import Mesh

    params, cfg = tiny
    mesh = Mesh(np.array(jax.devices()[:8]), ("sequence",))
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=16)
    for q in (None, "int8"):
        ref = make_engine(params, cfg, kv_quant=q).generate(_prompts(), sp)
        eng = make_engine(params, cfg, kv_quant=q, seq_mesh=mesh,
                          spec_decode="pld", spec_k=3)
        out = eng.generate(_prompts(), sp)
        for r, o in zip(ref, out):
            for a, b in zip(r.outputs, o.outputs):
                assert a.token_ids == b.token_ids, q
    assert eng.last_spec_stats["tokens_per_iteration"] >= 1.0


def test_decode_step_multi_seq_structure_matrix():
    """decode_step_multi_seq == decode_step_multi on sharded-awkward
    inputs: a bitmap with decode-region holes, a position map with
    reused-prefix offsets, a spec block spanning a shard boundary —
    across the two layer structures that exercise every seq-threaded
    knob (per-layer windows + sinks + o-proj bias; gemma sandwich norms
    + softcaps + dual-theta rope), each in bf16 and int8-KV."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sequence",))
    for kw in (dict(layer_windows=(8, 0), attn_sinks=True, o_proj_bias=True),
               dict(sandwich_norms=True, attn_softcap=30.0,
                    final_softcap=20.0, layer_windows=(8, 0),
                    rope_local_theta=5000.0)):
        from lapha_tpu.models import qwen2_seq

        cfg = Qwen2Config.tiny(vocab_size=128, **kw)
        params = qwen2.init_params(cfg, jax.random.key(3))
        B, T, S = 2, 4, 32
        L, nkv, dh = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                      cfg.head_dim_)
        toks = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
        lens = jnp.asarray([10, 7], jnp.int32)
        slot = jnp.asarray(14, jnp.int32)  # block [14,18) spans shards 1|2
        vm = (jnp.arange(S)[None, :] < lens[:, None]).at[:, 12].set(True)
        positions = (lens + jnp.asarray([3, 2]))[:, None] + jnp.arange(T)[None]
        posm = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        posm = posm.at[0, 12].set(11).at[1, 12].set(8)
        ck = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)) * 0.3,
                         jnp.float32)
        cv = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)) * 0.3,
                         jnp.float32)
        ref = qwen2.decode_step_multi(params, cfg, toks, positions, ck, cv,
                                      slot, vm, pos_map=posm)
        got = qwen2_seq.decode_step_multi_seq(
            params, cfg, toks, positions, ck, cv, slot, vm, pos_map=posm,
            mesh=mesh)
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                                   rtol=1e-5, atol=1e-5)
        ks = jnp.abs(jnp.asarray(rng.normal(size=(L, B, nkv, S)),
                                 jnp.float32)) * 0.01 + 0.001
        vs = jnp.abs(jnp.asarray(rng.normal(size=(L, B, nkv, S)),
                                 jnp.float32)) * 0.01 + 0.001
        ck8 = jnp.asarray(rng.integers(-127, 127, (L, B, nkv, S, dh)),
                          jnp.int8)
        cv8 = jnp.asarray(rng.integers(-127, 127, (L, B, nkv, S, dh)),
                          jnp.int8)
        ref8 = qwen2.decode_step_multi(params, cfg, toks, positions, ck8,
                                       cv8, slot, vm, cache_scale=(ks, vs),
                                       pos_map=posm)
        got8 = qwen2_seq.decode_step_multi_seq(
            params, cfg, toks, positions, ck8, cv8, slot, vm,
            cache_scale=(ks, vs), pos_map=posm, mesh=mesh)
        np.testing.assert_allclose(np.asarray(ref8[0]), np.asarray(got8[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ref8[4][0]),
                                   np.asarray(got8[4][0]),
                                   rtol=1e-6, atol=1e-6)


def test_greedy_bit_identical_olmo2_and_starcoder2_styles():
    """Spec-decode verify forward supports the olmo2 (post-norms-only,
    full-width qk norms) and starcoder2 (biased LayerNorm, plain FFN,
    o-proj bias) layer structures — greedy streams stay bit-identical to
    the non-spec engine on a deterministic backend."""
    for kw in (dict(post_norms_only=True, qk_norm_full=True,
                    tie_word_embeddings=False, attention_bias=False),
               dict(norm_style="layernorm", mlp_style="plain",
                    o_proj_bias=True)):
        cfg = Qwen2Config.tiny(vocab_size=300, **kw)
        params = qwen2.init_params(cfg, jax.random.key(11))
        sp = SamplingParams(n=1, temperature=0.0, max_tokens=24, seed=5)
        ref = make_engine(params, cfg).generate(_prompts(), sp)
        out = make_engine(params, cfg, spec_decode="pld",
                          spec_k=3).generate(_prompts(), sp)
        for r, o in zip(ref, out):
            for a, b in zip(r.outputs, o.outputs):
                assert a.token_ids == b.token_ids, kw

"""Generation engine: sampling pipeline units + end-to-end generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import Engine, FakeEngine, SamplingParams, build_engine_adapter
from lapha_tpu.engine import sampling

rng = np.random.default_rng(7)


# --------------------------------------------------------------- sampling units

def test_top_k_masks_all_but_k():
    logits = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    out = sampling.process_logits(logits, top_k=jnp.asarray([5, -1]))
    kept0 = int(jnp.sum(out[0] > sampling.NEG_INF / 2))
    kept1 = int(jnp.sum(out[1] > sampling.NEG_INF / 2))
    assert kept0 == 5
    assert kept1 == 64  # -1 disables


def test_top_p_keeps_nucleus():
    # peaked distribution: top-1 has prob > 0.9
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = sampling.process_logits(logits, top_p=jnp.asarray([0.5]))
    kept = int(jnp.sum(out > sampling.NEG_INF / 2))
    assert kept == 1
    out2 = sampling.process_logits(logits, top_p=jnp.asarray([1.0]))
    assert int(jnp.sum(out2 > sampling.NEG_INF / 2)) == 4


def test_top_p_always_keeps_one():
    logits = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    out = sampling.process_logits(logits, top_p=jnp.asarray([0.0]))
    assert int(jnp.sum(out > sampling.NEG_INF / 2)) >= 1


def test_min_p_filters_relative_to_max():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = sampling.process_logits(logits, min_p=jnp.asarray([0.5]))  # keep p >= 0.25
    kept = np.asarray(out > sampling.NEG_INF / 2)[0]
    assert kept.tolist() == [True, True, False, False]


def test_repetition_penalty_vllm_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    presence = jnp.asarray([[1, 1, 0]])
    out = sampling.apply_repetition_penalty(logits, presence, jnp.asarray([2.0]))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


def test_greedy_at_temperature_zero():
    logits = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    tok, lp = sampling.sample(
        logits, jax.random.key(0),
        temperature=jnp.zeros(4),
    )
    np.testing.assert_array_equal(tok, jnp.argmax(logits, axis=-1))
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_sampling_respects_top_k1():
    logits = jnp.asarray(rng.normal(size=(8, 100)).astype(np.float32))
    tok, _ = sampling.sample(
        logits, jax.random.key(1),
        temperature=jnp.ones(8), top_k=jnp.full(8, 1, jnp.int32),
    )
    np.testing.assert_array_equal(tok, jnp.argmax(logits, axis=-1))


def test_sample_distribution_matches_softmax():
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]])).repeat(2000, axis=0)
    tok, _ = sampling.sample(logits, jax.random.key(2), temperature=jnp.ones(2000))
    freq = np.bincount(np.asarray(tok), minlength=3) / 2000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.05)


# --------------------------------------------------------------- fake engine

class _WordTok:
    """Minimal whitespace tokenizer for FakeEngine tests."""

    eos_token_id = 1

    def __call__(self, text, add_special_tokens=False, **kw):
        return {"input_ids": [hash(w) % 1000 + 2 for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(i) for i in ids)


def test_fake_engine_scripted():
    eng = FakeEngine(_WordTok(), script=[("magic", ["yes sir", "no sir"])])
    out = eng.generate(["some magic prompt"], SamplingParams(n=2))
    assert len(out) == 1 and len(out[0].outputs) == 2
    assert out[0].outputs[0].cumulative_logprob > out[0].outputs[1].cumulative_logprob
    out2 = eng.generate(["other"], SamplingParams(n=3))
    assert len(out2[0].outputs) == 3


def test_build_engine_adapter_fake():
    eng = build_engine_adapter("fake", tokenizer=_WordTok())
    assert isinstance(eng, FakeEngine)
    with pytest.raises(ValueError):
        build_engine_adapter("nope")


# --------------------------------------------------------------- real engine e2e

@pytest.fixture(scope="module")
def tiny_engine():
    """Engine over a tiny random model with a byte-level 'tokenizer'."""
    from lapha_tpu.models import Qwen2Config, qwen2

    class ByteTok:
        eos_token_id = 0  # never produced by ascii text
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

        def decode(self, ids, skip_special_tokens=True, **kw):
            return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    eng = Engine(
        params, cfg, ByteTok(),
        max_model_len=128, max_batch=8, decode_chunk=8,
        pad_multiple=32, batch_bucket=2, eos_token_ids=[0], seed=0,
    )
    return eng, params, cfg


def test_engine_greedy_matches_manual_decode(tiny_engine):
    from lapha_tpu.models import qwen2

    eng, params, cfg = tiny_engine
    prompt = "hello world"
    out = eng.generate([prompt], SamplingParams(n=1, temperature=0.0, max_tokens=8))[0]
    got = out.outputs[0].token_ids

    # manual reference: full forward argmax loop (no cache)
    ids = list(eng.tokenizer(prompt)["input_ids"])
    for _ in range(8):
        logits, _, _ = qwen2.forward(params, cfg, jnp.asarray([ids]))
        nxt = int(jnp.argmax(logits[0, -1]))
        ids.append(nxt)
        if nxt == 0:
            break
    want = ids[len(eng.tokenizer(prompt)["input_ids"]):]
    assert got == want


def test_engine_n_samples_and_logprobs(tiny_engine):
    eng, _, _ = tiny_engine
    out = eng.generate(["abc def"], SamplingParams(n=4, temperature=1.0, max_tokens=6, seed=11))[0]
    assert len(out.outputs) == 4
    for o in out.outputs:
        assert len(o.token_ids) >= 1
        assert len(o.token_logprobs) == len(o.token_ids)
        assert np.isfinite(o.cumulative_logprob)
        assert abs(o.cumulative_logprob - sum(o.token_logprobs)) < 1e-4
    # with temperature 1 the four samples should not all be identical
    texts = {tuple(o.token_ids) for o in out.outputs}
    assert len(texts) > 1


def test_engine_multi_prompt_batch(tiny_engine):
    eng, _, _ = tiny_engine
    prompts = ["one", "two two", "three three three"]
    outs = eng.generate(prompts, SamplingParams(n=2, temperature=0.7, max_tokens=5, seed=3))
    assert len(outs) == 3
    assert all(len(o.outputs) == 2 for o in outs)
    # prompt echo preserved order
    assert [o.prompt for o in outs] == prompts


def test_engine_deterministic_greedy_across_batsizes(tiny_engine):
    """Greedy output must not depend on batching/padding."""
    eng, _, _ = tiny_engine
    a = eng.generate(["xyz abc"], SamplingParams(n=1, temperature=0.0, max_tokens=6))[0]
    b = eng.generate(["xyz abc", "completely different prompt here"],
                     SamplingParams(n=1, temperature=0.0, max_tokens=6))[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_engine_max_tokens_respected(tiny_engine):
    eng, _, _ = tiny_engine
    out = eng.generate(["qq"], SamplingParams(n=1, temperature=0.0, max_tokens=3))[0]
    assert len(out.outputs[0].token_ids) <= 3
    assert out.outputs[0].finish_reason in ("stop", "length")


def test_engine_update_params_changes_output(tiny_engine):
    from lapha_tpu.models import qwen2 as q

    eng, params, cfg = tiny_engine
    base = eng.generate(["mm nn"], SamplingParams(n=1, temperature=0.0, max_tokens=4))[0]
    new_params = q.init_params(cfg, jax.random.key(99))
    eng.update_params(new_params)
    try:
        changed = eng.generate(["mm nn"], SamplingParams(n=1, temperature=0.0, max_tokens=4))[0]
        assert changed.outputs[0].token_ids != base.outputs[0].token_ids
    finally:
        eng.update_params(params)

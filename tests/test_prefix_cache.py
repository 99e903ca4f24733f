"""Prefix-cache KV reuse: correctness vs cold prefill + store semantics."""

import jax
import numpy as np
import pytest

from lapha_tpu.engine import Engine, SamplingParams
from lapha_tpu.engine.prefix_cache import PrefixCacheStore
from lapha_tpu.models import Qwen2Config, qwen2


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


@pytest.fixture(scope="module")
def engines():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))

    def mk(cache_bytes):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8)

    return mk(0), mk(100_000_000)


def test_store_put_lookup_lru():
    s = PrefixCacheStore(max_bytes=10**9, min_reuse=2)
    k = np.zeros((2, 5, 2, 4), np.float32)
    s.put([1, 2, 3, 4, 5], (k, k))
    hit = s.longest_prefix([1, 2, 3, 4, 5, 6, 7])
    assert hit is not None
    _, _, plen, _h = hit
    assert plen == 5
    assert s.longest_prefix([9, 9, 9]) is None
    # max_use caps reuse (partial exact-match path)
    _, _, plen2, h2 = s.longest_prefix([1, 2, 3, 4, 5], max_use=4)
    assert plen2 == 4 and h2 is None
    # partial path disabled -> miss
    assert s.longest_prefix([1, 2, 3, 4, 5], max_use=4, allow_partial=False) is None


def test_store_eviction_under_budget():
    s = PrefixCacheStore(max_bytes=2 * 2 * 4 * 2 * 4 * 5 + 10, min_reuse=2)
    k = np.zeros((2, 4, 2, 4), np.float32)  # one entry = 2*4*2*4*4*2 = 512B
    for i in range(10):
        s.put([i, i + 1, i + 2, i + 3], (k, k))
    assert s.nbytes <= s.max_bytes
    assert len(s) < 10  # evicted


def test_min_reuse_threshold():
    s = PrefixCacheStore(max_bytes=10**9, min_reuse=50)
    k = np.zeros((2, 10, 2, 4), np.float32)
    s.put(list(range(10)), (k, k))
    assert s.longest_prefix(list(range(10)) + [99]) is None  # below min_reuse


def test_greedy_same_with_and_without_cache(engines):
    cold, warm = engines
    parent = "shared long prefix text that forms a parent context here. "
    child = parent + "and now the child continues"
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)

    # cold engine: no cache at all
    ref_parent = cold.generate([parent], sp)[0].outputs[0].token_ids
    ref_child = cold.generate([child], sp)[0].outputs[0].token_ids

    # warm engine: first call seeds the store, second call reuses the prefix
    got_parent = warm.generate([parent], sp)[0].outputs[0].token_ids
    stats0 = warm.prefix_cache.stats()
    got_child = warm.generate([child], sp)[0].outputs[0].token_ids
    stats1 = warm.prefix_cache.stats()

    assert got_parent == ref_parent
    assert got_child == ref_child
    assert stats1["hits"] > stats0["hits"], "prefix was not reused"
    assert stats1["tokens_reused"] > 0


def test_logprobs_close_with_cache(engines):
    cold, warm = engines
    warm.prefix_cache.clear()
    parent = "some other parent prompt with enough tokens to cache properly. "
    child = parent + "suffix goes here"
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=6)
    warm.generate([parent], sp)
    a = cold.generate([child], sp)[0].outputs[0]
    b = warm.generate([child], sp)[0].outputs[0]
    assert a.token_ids == b.token_ids
    np.testing.assert_allclose(a.token_logprobs, b.token_logprobs, rtol=2e-2, atol=2e-2)


def test_update_params_invalidates_cache(engines):
    _, warm = engines
    warm.prefix_cache.clear()
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=4)
    warm.generate(["a prompt long enough to be stored in cache"], sp)
    assert len(warm.prefix_cache) > 0
    warm.update_params(warm.params)
    assert len(warm.prefix_cache) == 0


def test_mcts_style_tree_reuse(engines):
    """Deep chains: each level extends the previous; hits should accumulate."""
    _, warm = engines
    warm.prefix_cache.clear()
    sp = SamplingParams(n=2, temperature=0.5, max_tokens=4, seed=7)
    ctx = "root question about arithmetic and reasoning steps. "
    for depth in range(4):
        warm.generate([ctx], sp)
        ctx = ctx + f"step {depth} produced some reasoning output here. "
    stats = warm.prefix_cache.stats()
    assert stats["hits"] >= 3
    assert stats["tokens_reused"] > 100


def test_small_max_tokens_with_prefix_hit_is_correct(engines):
    """Regression (review finding #1): short max_tokens + prefix hit used to
    clamp the padded suffix write back over the reused prefix KV."""
    cold, warm = engines
    warm.prefix_cache.clear()
    parent = "x" * 96  # 96-token prefix with the byte tokenizer
    child = parent + "abcd"  # 4-token suffix; S = round_up(100+8, 16) << 96+pad
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    ref = cold.generate([child], sp)[0].outputs[0].token_ids
    warm.generate([parent], sp)
    got = warm.generate([child], sp)[0].outputs[0].token_ids
    assert warm.prefix_cache.stats()["hits"] >= 1
    assert got == ref


def test_batched_hit_path_many_prompts(engines):
    """P=10 prompts (> the old P<=8 lookup guard) sharing a seeded prefix:
    all rows take the batched suffix-prefill path and match the cold engine
    greedily, including a mixed batch with one miss row."""
    cold, warm = engines
    warm.prefix_cache.clear()
    parent = "a really long shared stem used by every single child branch. "
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=6)
    warm.generate([parent], sp)  # seed the store
    h0 = warm.prefix_cache.stats()["hits"]

    children = [parent + f"child variant {i}" for i in range(9)]
    children.append("completely unrelated miss prompt that shares nothing")
    ref = [r.outputs[0].token_ids for r in cold.generate(children, sp)]
    got = [r.outputs[0].token_ids for r in warm.generate(children, sp)]
    assert got == ref
    assert warm.prefix_cache.stats()["hits"] >= h0 + 9  # all 9 rows hit


def test_sliding_window_greedy_same_with_and_without_cache():
    """Prefix-hit suffix prefill under a sliding window: the banded
    cache-mode mask (slot==position in the prefix region) must reproduce
    the cold engine's greedy stream exactly, past the window boundary."""
    import dataclasses

    cfg = dataclasses.replace(Qwen2Config.tiny(vocab_size=300),
                              sliding_window=6)
    params = qwen2.init_params(cfg, jax.random.key(11))

    def mk(cache_bytes):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8)

    cold, warm = mk(0), mk(100_000_000)
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=16)
    base = "a shared prefix of decent length"
    prompts = [base + " one", base + " two longer suffix here"]
    ref = [r.outputs[0].token_ids for r in cold.generate(prompts, sp)]
    # seed the store, then hit it
    warm.generate([base + " seed"], sp)
    got = [r.outputs[0].token_ids for r in warm.generate(prompts, sp)]
    assert got == ref


def test_prefix_reuse_under_seq_mesh():
    """Prefix-KV reuse composes with engine-side sequence parallelism:
    the hit batch writes reused prefixes into a slot-sharded cache and the
    suffix forwards through qwen2_seq.suffix_seq (distributed softmax) —
    greedy tokens must match both the cold seq engine and the warm
    unsharded engine (vLLM holds prefix caching + CP simultaneously)."""
    from jax.sharding import Mesh

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(4))
    mesh = Mesh(np.array(jax.devices()[:8]), ("sequence",))

    def mk(cache_bytes, seq_mesh):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8, seq_mesh=seq_mesh)

    parent = "shared long prefix text that forms a parent context here. "
    children = [parent + "child one continues this way",
                parent + "child two goes elsewhere entirely"]
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=8)

    cold_seq = mk(0, mesh)
    ref = [[o.token_ids for o in r.outputs]
           for r in cold_seq.generate(children, sp)]

    warm_flat = mk(100_000_000, None)
    warm_flat.generate([parent], sp)
    ref_flat = [[o.token_ids for o in r.outputs]
                for r in warm_flat.generate(children, sp)]
    assert ref_flat == ref

    warm_seq = mk(100_000_000, mesh)
    warm_seq.generate([parent], sp)
    stats0 = warm_seq.prefix_cache.stats()
    got = [[o.token_ids for o in r.outputs]
           for r in warm_seq.generate(children, sp)]
    stats1 = warm_seq.prefix_cache.stats()
    assert got == ref
    assert stats1["hits"] > stats0["hits"], "prefix was not reused under seq"
    assert stats1["tokens_reused"] > 0


def test_prefix_reuse_under_seq_mesh_windowed():
    """All three compose at once: sliding window x seq_mesh x prefix
    reuse — banded suffix_seq validity vs the cold banded engines."""
    from jax.sharding import Mesh

    cfg = Qwen2Config.tiny(vocab_size=300, sliding_window=16)
    params = qwen2.init_params(cfg, jax.random.key(5))
    mesh = Mesh(np.array(jax.devices()[:8]), ("sequence",))

    def mk(cache_bytes, seq_mesh):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8, seq_mesh=seq_mesh)

    parent = "a rather long shared parent prompt, well past the window. "
    child = parent + "and a suffix that attends back through the band"
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)

    ref = mk(0, None).generate([child], sp)[0].outputs[0].token_ids
    warm_seq = mk(100_000_000, mesh)
    warm_seq.generate([parent], sp)
    got = warm_seq.generate([child], sp)[0].outputs[0].token_ids
    assert got == ref
    assert warm_seq.prefix_cache.stats()["hits"] > 0


def test_prefix_reuse_under_seq_mesh_int8_kv():
    """Quadruple composition: prefix reuse x seq_mesh x int8 KV — reused
    bf16 prefixes quantize at the decode install onto the slot-sharded
    scale planes; greedy tokens match the cold seq int8 engine."""
    from jax.sharding import Mesh

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(6))
    mesh = Mesh(np.array(jax.devices()[:8]), ("sequence",))

    def mk(cache_bytes, seq_mesh):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8, kv_quant="int8",
                      seq_mesh=seq_mesh)

    parent = "a long enough shared parent prompt for the int8 seq case. "
    child = parent + "plus the suffix"
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    ref = mk(0, mesh).generate([child], sp)[0].outputs[0].token_ids
    warm = mk(100_000_000, mesh)
    warm.generate([parent], sp)
    got = warm.generate([child], sp)[0].outputs[0].token_ids
    assert got == ref
    assert warm.prefix_cache.stats()["hits"] > 0


def test_prefix_reuse_under_seq_mesh_gptoss_style():
    """Prefix reuse x seq_mesh x a gpt-oss-style body (learned sinks +
    alternating sliding/full layers + o-proj bias): the reused-suffix
    forward (qwen2_seq.suffix_seq) must fold the sink into its
    distributed softmax and band the windowed layers — greedy tokens
    match the cold seq engine and the warm unsharded engine."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    # 2 layers (one windowed, one full): per-layer coverage is identical
    # and the unrolled suffix/decode programs compile in half the time
    cfg = Qwen2Config.tiny(vocab_size=300,
                           attn_sinks=True, o_proj_bias=True)
    object.__setattr__(cfg, "layer_windows", (8, 0))
    params = qwen2.init_params(cfg, jax.random.key(8))
    params["layers"]["attn"]["sinks"] = jax.random.normal(
        jax.random.key(88), (2, cfg.num_attention_heads), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("sequence",))

    def mk(cache_bytes, seq_mesh):
        return Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=cache_bytes,
                      prefix_cache_min_reuse=8, seq_mesh=seq_mesh)

    parent = "a shared parent context longer than the sliding window is. "
    child = parent + "with a distinctive suffix"
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=8)
    ref = mk(0, mesh).generate([child], sp)[0].outputs[0].token_ids
    warm_flat = mk(100_000_000, None)
    warm_flat.generate([parent], sp)
    assert warm_flat.generate([child], sp)[0].outputs[0].token_ids == ref
    warm = mk(100_000_000, mesh)
    warm.generate([parent], sp)
    got = warm.generate([child], sp)[0].outputs[0].token_ids
    assert got == ref
    assert warm.prefix_cache.stats()["hits"] > 0

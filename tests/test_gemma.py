"""Gemma-2 / Gemma-3 family support.

The reference serves any HF decoder via AutoModelForCausalLM
(/root/reference/trainer/mtpo_trainer.py:643-663); these tests pin our
stacked-pytree implementation of the gemma families against transformers'
eager reference: sandwich norms ((1+w) RMS, post-attn/post-ffn output
norms), GeGLU, sqrt(H) embed scaling, query_pre_attn_scalar, gemma2's
attention/final logit softcapping, heterogeneous sliding/full layer
stacks (cfg.layer_windows), and gemma3's dual-theta rope (local theta on
sliding layers).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, loader, qwen2

rng = np.random.default_rng(11)


@pytest.fixture(scope="module")
def tiny_gemma2_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    d = tmp_path_factory.mktemp("tiny_gemma2")
    hf_cfg = Gemma2Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        sliding_window=8,
        query_pre_attn_scalar=24.0,   # deliberately != head_dim
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(5)
    model = Gemma2ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def tiny_gemma3_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    d = tmp_path_factory.mktemp("tiny_gemma3")
    hf_cfg = Gemma3TextConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        sliding_window=8,
        sliding_window_pattern=2,     # layers 0,2 sliding; 1,3 full
        query_pre_attn_scalar=16.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(7)
    model = Gemma3ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_gemma2_config_parse(tiny_gemma2_dir):
    cfg = loader.load_config(tiny_gemma2_dir)
    assert cfg.sandwich_norms and cfg.embed_normalizer
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    assert cfg.query_pre_attn_scalar == 24.0
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.sliding_window == 0
    assert cfg.layer_windows == (8, 0, 8, 0)  # even layers slide
    assert cfg.max_window_ == 8
    assert abs(cfg.attn_scale_ - 24.0 ** -0.5) < 1e-12
    assert not cfg.qk_norm


def test_gemma3_config_parse(tiny_gemma3_dir):
    cfg = loader.load_config(tiny_gemma3_dir)
    assert cfg.sandwich_norms and cfg.embed_normalizer and cfg.qk_norm
    assert cfg.attn_softcap == 0.0 and cfg.final_softcap == 0.0
    assert cfg.rope_local_theta == 10000.0 and cfg.rope_theta == 1000000.0
    assert cfg.layer_windows == (8, 0, 8, 0)
    assert cfg.max_window_ == 8


def _hf_logits(model_dir, cls_name, ids):
    import torch
    import transformers

    cls = getattr(transformers, cls_name)
    hf = cls.from_pretrained(model_dir, attn_implementation="eager").eval()
    with torch.no_grad():
        return hf(torch.tensor(ids)).logits.numpy()


def test_gemma2_logits_match_hf(tiny_gemma2_dir):
    """T=24 > W=8: banding, softcaps, sandwich norms all live."""
    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)
    assert "pre_feedforward_layernorm" in params["layers"]
    ids = rng.integers(0, 512, size=(2, 24))
    ref = _hf_logits(tiny_gemma2_dir, "Gemma2ForCausalLM", ids)
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)
    # sanity: windows matter — an all-full stack differs at the tail
    cfg_full = dataclasses.replace(cfg, layer_windows=(0, 0, 0, 0))
    full, _, _ = qwen2.forward(params, cfg_full, jnp.asarray(ids))
    assert not np.allclose(np.asarray(full[:, -1]), ref[:, -1], atol=1e-3)


def test_gemma2_logits_match_hf_left_padding(tiny_gemma2_dir):
    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)
    import torch
    from transformers import Gemma2ForCausalLM

    ids = rng.integers(0, 512, size=(2, 20))
    mask = np.ones((2, 20), np.int64)
    mask[0, :6] = 0
    hf = Gemma2ForCausalLM.from_pretrained(
        tiny_gemma2_dir, attn_implementation="eager").eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)
                 ).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids),
                                 attention_mask=jnp.asarray(mask))
    valid = mask > 0
    np.testing.assert_allclose(np.asarray(logits)[valid], ref[valid],
                               rtol=2e-3, atol=2e-3)


def test_gemma3_logits_match_hf(tiny_gemma3_dir):
    """Dual-theta rope: local layers at 10k, global at 1M."""
    params, cfg = loader.load_params(tiny_gemma3_dir, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(2, 24))
    ref = _hf_logits(tiny_gemma3_dir, "Gemma3ForCausalLM", ids)
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)
    # sanity: the local rope actually differs — single-theta is wrong
    cfg_one = dataclasses.replace(cfg, rope_local_theta=0.0)
    one, _, _ = qwen2.forward(params, cfg_one, jnp.asarray(ids))
    assert not np.allclose(np.asarray(one[:, -1]), ref[:, -1], atol=1e-3)


@pytest.mark.parametrize("fixture", ["tiny_gemma2_dir", "tiny_gemma3_dir"])
def test_gemma_decode_matches_forward(fixture, request):
    """Cache-mode suffix prefill + 1-token steps == full forward, with
    per-layer banding live in both modes (T crosses W mid-decode)."""
    model_dir = request.getfixturevalue(fixture)
    params, cfg = loader.load_params(model_dir, dtype=jnp.float32)
    B, T_total, T_prefill = 2, 20, 12
    ids = jnp.asarray(rng.integers(0, 512, size=(B, T_total)))
    full_logits, _, _ = qwen2.forward(params, cfg, ids)

    cache = qwen2.init_kv_cache(cfg, B, 32)
    pre, _, cache = qwen2.forward(
        params, cfg, ids[:, :T_prefill], kv_cache=cache, cache_pos=0,
        positions=jnp.broadcast_to(jnp.arange(T_prefill)[None], (B, T_prefill)))
    np.testing.assert_allclose(np.asarray(pre),
                               np.asarray(full_logits[:, :T_prefill]),
                               rtol=2e-3, atol=2e-3)
    for t in range(T_prefill, T_total):
        step, _, cache = qwen2.forward(
            params, cfg, ids[:, t:t + 1], kv_cache=cache, cache_pos=t,
            positions=jnp.full((B, 1), t))
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=5e-3, atol=5e-3, err_msg=f"t={t}")


def test_gemma2_engine_greedy_matches_hf(tiny_gemma2_dir):
    """Engine prefill + per-layer-banded decode_step greedy == HF greedy
    (decode crosses W=8 on the sliding layers mid-run)."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma2ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)

    class IdTok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [int(w) for w in text.split()]}

        def decode(self, ids, **kw):
            return " ".join(str(int(i)) for i in ids)

    eng = Engine(params, cfg, IdTok(), max_model_len=64, max_batch=2,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    prompt = [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    out = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=12))
    got = out[0].outputs[0].token_ids

    hf = Gemma2ForCausalLM.from_pretrained(
        tiny_gemma2_dir, attn_implementation="eager").eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(12):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_gemma2_export_roundtrip(tiny_gemma2_dir, tmp_path):
    """export_hf folds the +1 back out of the norms; reload matches."""
    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)
    out = str(tmp_path / "exported")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_gemma2_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 16)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(params2, cfg2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)


def _spec_engines(params, cfg):
    from lapha_tpu.engine import Engine

    class IdTok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [int(w) for w in text.split()]}

        def decode(self, ids, **kw):
            return ""

    kw = dict(max_model_len=96, max_batch=2, decode_chunk=4,
              pad_multiple=16, batch_bucket=1, eos_token_ids=[],
              prefix_cache_bytes=0)
    ref = Engine(params, cfg, IdTok(), **kw)
    spec = Engine(params, cfg, IdTok(), spec_decode="pld", spec_k=3, **kw)
    return ref, spec


@pytest.mark.parametrize("which", ["gemma2", "gemma3"])
def test_gemma_spec_greedy_bit_identical(which, tiny_gemma2_dir,
                                         tiny_gemma3_dir):
    """Spec-decode verify forward supports the gemma bodies: gemma2's
    sandwich norms + attn/final softcaps and gemma3's qk norms +
    dual-theta rope, both over heterogeneous sliding/full layer stacks
    (the per-column pos_map bands the windowed layers) — greedy streams
    stay bit-identical to the non-spec engine. The repetitive prompt
    provokes n-gram draft hits so accepted-draft columns are exercised."""
    from lapha_tpu.engine import SamplingParams

    d = tiny_gemma2_dir if which == "gemma2" else tiny_gemma3_dir
    params, cfg = loader.load_params(d, dtype=jnp.float32)
    ref, spec = _spec_engines(params, cfg)
    prompts = ["5 6 7 8 5 6 7 8 5 6", "9 10 11 9 10 11 9 10"]
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=20)
    a = ref.generate(prompts, sp)
    b = spec.generate(prompts, sp)
    for r, o in zip(a, b):
        assert r.outputs[0].token_ids == o.outputs[0].token_ids


def test_gemma2_int8_quantized_decode_runs(tiny_gemma2_dir):
    """Weight-only int8 load + engine greedy still decodes (softcap and
    per-layer banding compose with the quantized projections)."""
    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32,
                                     quantize="int8")

    class IdTok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [int(w) for w in text.split()]}

        def decode(self, ids, **kw):
            return ""

    eng = Engine(params, cfg, IdTok(), max_model_len=64, max_batch=2,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    out = eng.generate(["5 6 7 8"], SamplingParams(n=1, temperature=0.0,
                                                   max_tokens=6))
    assert len(out[0].outputs[0].token_ids) == 6


def test_gemma2_flash_matches_dense(tiny_gemma2_dir):
    """The per-layer lax.cond flash path (banded/full kernels + softcap +
    query scale) == the dense in-body-banded path."""
    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 24)))
    mask = np.ones((2, 24), np.int32)
    mask[0, :5] = 0
    mask = jnp.asarray(mask)
    dense, _, _ = qwen2.forward(
        params, dataclasses.replace(cfg, attn_impl="dense"), ids,
        attention_mask=mask)
    flash, _, _ = qwen2.forward(
        params, dataclasses.replace(cfg, attn_impl="pallas"), ids,
        attention_mask=mask)
    d, f = np.asarray(dense), np.asarray(flash)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(f[valid], d[valid], rtol=2e-3, atol=2e-3)


def test_gemma3_flash_matches_dense(tiny_gemma3_dir):
    params, cfg = loader.load_params(tiny_gemma3_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 24)))
    dense, _, _ = qwen2.forward(
        params, dataclasses.replace(cfg, attn_impl="dense"), ids)
    flash, _, _ = qwen2.forward(
        params, dataclasses.replace(cfg, attn_impl="pallas"), ids)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-3, atol=2e-3)


def test_gemma2_flash_training_grads_finite(tiny_gemma2_dir):
    """jax.grad through the cond-dispatched flash kernels (remat on)."""
    params, cfg = loader.load_params(tiny_gemma2_dir, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, attn_impl="pallas")
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 16)))

    def loss(p):
        logits, _, _ = qwen2.forward(p, cfg, ids, remat=True)
        lp = jax.nn.log_softmax(logits[:, :-1])
        tgt = ids[:, 1:]
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0

"""GPT-OSS family: attention sinks, clamped-GLU MoE, alternating windows.

Model-family widening beyond the reference (which serves only dense
Qwen2.5 via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663):
GPT-OSS-20B/120B-style checkpoints (learned per-head attention sinks
folded into the softmax denominator, biases on every projection, fused
gate_up experts with the clamped gate*sigmoid(1.702*gate) GLU,
topk-then-softmax router with bias, alternating sliding/full layers)
load, match HF logits, and decode through the real Engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, loader, qwen2

rng = np.random.default_rng(31)


@pytest.fixture(scope="module")
def tiny_hf_gptoss_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import GptOssConfig, GptOssForCausalLM

    d = tmp_path_factory.mktemp("tiny_gptoss")
    hf_cfg = GptOssConfig(
        vocab_size=512, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=16,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling=None, rope_theta=150000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = GptOssForCausalLM(hf_cfg).eval()
    # random (not init-zero) sinks and router bias so the differentials
    # actually exercise both mechanisms
    for layer in model.model.layers:
        layer.self_attn.sinks.data = torch.randn(4) * 2.0
        layer.mlp.router.bias.data = torch.randn(4) * 0.5
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_config_from_hf(tiny_hf_gptoss_dir):
    cfg = loader.load_config(tiny_hf_gptoss_dir)
    assert cfg.attn_sinks and cfg.o_proj_bias and cfg.attention_bias
    assert cfg.moe_style == "gptoss"
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.layer_windows == (16, 0)  # alternating sliding/full


def test_logits_match_hf(tiny_hf_gptoss_dir):
    torch = pytest.importorskip("torch")
    from transformers import GptOssForCausalLM

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)
    assert params["layers"]["attn"]["sinks"].shape == (2, 4)
    ids = rng.integers(0, 512, size=(2, 24))  # > window: banding matters
    hf = GptOssForCausalLM.from_pretrained(tiny_hf_gptoss_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_engine_greedy_matches_hf(tiny_hf_gptoss_dir):
    """Decode through the real Engine (sink-aware dense_att, banded
    validity on the sliding layer, o-proj bias) == HF greedy past the
    window."""
    torch = pytest.importorskip("torch")
    from transformers import GptOssForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)

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
    prompt = [int(i) for i in rng.integers(2, 512, 20)]
    steps = 8  # prompt + decode crosses the 16-token window
    got = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=steps)
                       )[0].outputs[0].token_ids
    hf = GptOssForCausalLM.from_pretrained(tiny_hf_gptoss_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(steps):
            nt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_export_roundtrip(tiny_hf_gptoss_dir, tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import GptOssForCausalLM

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)
    out = str(tmp_path / "gptoss_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_gptoss_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = GptOssForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)


def test_sharded_forward_matches(mesh8, tiny_hf_gptoss_dir):
    """EP over the fused expert stacks + TP over heads reproduces
    unsharded logits on the (4x2) mesh."""
    from lapha_tpu.parallel import shard_params

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(4, 12)))
    ref, _, _ = qwen2.forward(params, cfg, ids)
    sharded = shard_params(params, mesh8)
    with mesh8:
        got, _, _ = qwen2.forward(sharded, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_spec_greedy_bit_identical(tiny_hf_gptoss_dir):
    """Spec-decode verify carries the gpt_oss layer structure: per-head
    sinks fold into decode_step_multi's softmax denominator and the
    alternating sliding layers band by position via the engine's pos_map.
    Greedy spec streams == non-spec greedy (itself HF-pinned above),
    decoding past the 16-token window so the band is live."""
    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)

    class IdTok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [int(w) for w in text.split()]}

        def decode(self, ids, **kw):
            return " ".join(str(int(i)) for i in ids)

    def mk(**kw):
        return Engine(params, cfg, IdTok(), max_model_len=128, max_batch=2,
                      decode_chunk=4, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[], prefix_cache_bytes=0, seed=0, **kw)

    base = [int(i) for i in rng.integers(2, 512, 12)]
    prompts = [" ".join(map(str, base + base[-4:] + base[-4:]))]
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=20, seed=5)
    ref = mk().generate(prompts, sp)
    out = mk(spec_decode="pld", spec_k=3).generate(prompts, sp)
    for r, o in zip(ref, out):
        for a, b in zip(r.outputs, o.outputs):
            assert a.token_ids == b.token_ids


def test_moe_impls_agree_gptoss(tiny_hf_gptoss_dir):
    """gather == dense == dispatch-with-headroom under the gptoss router
    and clamped-GLU expert math (same exec-strategy surface as the other
    families; moe_impl threads from the config)."""
    import dataclasses

    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, (2, 12)))
    outs = {}
    for impl in ("gather", "dense", "dispatch"):
        c = dataclasses.replace(cfg, moe_impl=impl, moe_capacity_factor=8.0)
        outs[impl], _, _ = qwen2.forward(params, c, ids)
    np.testing.assert_allclose(np.asarray(outs["gather"]),
                               np.asarray(outs["dense"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outs["dispatch"]),
                               np.asarray(outs["dense"]), rtol=2e-4, atol=2e-4)


def test_sink_softmax_matches_hf_form():
    """_sink_softmax == softmax over [logits, sink] with the sink column
    dropped (the HF eager form)."""
    r = np.random.default_rng(0)
    logits = jnp.asarray(r.normal(size=(2, 3, 5, 7)).astype(np.float32))
    sinks = jnp.asarray(r.normal(size=(1, 3, 1, 1)).astype(np.float32))
    got = qwen2._sink_softmax(logits, sinks)
    full = jnp.concatenate(
        [logits, jnp.broadcast_to(sinks, (2, 3, 5, 1))], axis=-1)
    ref = jax.nn.softmax(full, axis=-1)[..., :-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_forward_pallas_matches_dense(tiny_hf_gptoss_dir):
    """Full gpt_oss stack with attn_impl='pallas': the flash kernels carry
    the sink fold (ops/flash_attention.py sink section) through the
    alternating sliding/full lax.cond dispatch — logits == dense."""
    params, cfg = loader.load_params(tiny_hf_gptoss_dir, dtype=jnp.float32)
    import dataclasses
    cfg_p = dataclasses.replace(cfg, attn_impl="pallas")
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 40)))  # > window
    mask = np.ones((2, 40), np.int32)
    mask[1, :5] = 0  # left padding
    mask = jnp.asarray(mask)
    ld, _, _ = qwen2.forward(params, cfg, ids, attention_mask=mask)
    lp, _, _ = qwen2.forward(params, cfg_p, ids, attention_mask=mask)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(lp)[valid], np.asarray(ld)[valid],
                               rtol=2e-3, atol=2e-3)

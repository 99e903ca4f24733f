"""Qwen2 JAX model: parity vs HF transformers (torch CPU) + cache semantics."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, loader, qwen2

rng = np.random.default_rng(42)


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    """Create and save a tiny random HF Qwen2 model."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM

    d = tmp_path_factory.mktemp("tiny_qwen2")
    hf_cfg = HFQwen2Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def tiny_model(tiny_hf_dir):
    params, cfg = loader.load_params(tiny_hf_dir, dtype=jnp.float32)
    return params, cfg


def test_config_from_hf(tiny_hf_dir):
    cfg = loader.load_config(tiny_hf_dir)
    assert cfg.hidden_size == 64
    assert cfg.num_hidden_layers == 2
    assert cfg.num_key_value_heads == 2
    assert cfg.tie_word_embeddings


def test_logits_match_hf(tiny_hf_dir, tiny_model):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2ForCausalLM

    params, cfg = tiny_model
    ids = rng.integers(0, 512, size=(2, 17))
    hf = Qwen2ForCausalLM.from_pretrained(tiny_hf_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()

    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_logits_match_hf_with_left_padding(tiny_hf_dir, tiny_model):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2ForCausalLM

    params, cfg = tiny_model
    ids = rng.integers(0, 512, size=(1, 12))
    pad = np.zeros((1, 5), dtype=ids.dtype)
    padded = np.concatenate([pad, ids], axis=1)
    mask = np.concatenate([np.zeros((1, 5), np.int64), np.ones((1, 12), np.int64)], axis=1)

    hf = Qwen2ForCausalLM.from_pretrained(tiny_hf_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(padded), attention_mask=torch.tensor(mask)).logits.numpy()

    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(padded), attention_mask=jnp.asarray(mask))
    # compare only on real (unpadded) positions
    np.testing.assert_allclose(np.asarray(logits)[:, 5:], ref[:, 5:], rtol=2e-3, atol=2e-3)


def test_hidden_states_match_hf(tiny_hf_dir, tiny_model):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2ForCausalLM

    params, cfg = tiny_model
    ids = rng.integers(0, 512, size=(2, 9))
    hf = Qwen2ForCausalLM.from_pretrained(tiny_hf_dir).eval()
    with torch.no_grad():
        # the value head pools the final hidden AFTER the output norm
        # (hidden_states[-1] in HF is pre-norm... actually HF's last entry is
        # the post-norm output of the final layer for Qwen2)
        out = hf(torch.tensor(ids), output_hidden_states=True)
        ref_last = out.hidden_states[-1].numpy()

    _, hidden, _ = qwen2.forward(params, cfg, jnp.asarray(ids), return_hidden=True)
    np.testing.assert_allclose(np.asarray(hidden), ref_last, rtol=2e-3, atol=2e-3)


def test_decode_matches_prefill(tiny_model):
    """Prefill T tokens then decode one-by-one must equal full forward."""
    params, cfg = tiny_model
    B, T_total, T_prefill = 2, 12, 8
    ids = jnp.asarray(rng.integers(0, 512, size=(B, T_total)))

    full_logits, _, _ = qwen2.forward(params, cfg, ids)

    cache = qwen2.init_kv_cache(cfg, B, 32)
    pre_logits, _, cache = qwen2.forward(
        params, cfg, ids[:, :T_prefill], kv_cache=cache, cache_pos=0,
        positions=jnp.broadcast_to(jnp.arange(T_prefill)[None], (B, T_prefill)),
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :T_prefill]), rtol=2e-3, atol=2e-3
    )

    for t in range(T_prefill, T_total):
        step_logits, _, cache = qwen2.forward(
            params, cfg, ids[:, t : t + 1], kv_cache=cache, cache_pos=t,
            positions=jnp.full((B, 1), t),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), rtol=5e-3, atol=5e-3
        )


def test_random_init_runs_and_remat_matches():
    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 10)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(params, cfg, ids, remat=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_forward_sharded_on_mesh(tiny_model, mesh8):
    """Same logits when params are TP/FSDP-sharded over the 4x2 mesh."""
    from lapha_tpu.parallel import shard_params

    params, cfg = tiny_model
    ids = jnp.asarray(rng.integers(0, 512, size=(4, 11)))
    ref, _, _ = qwen2.forward(params, cfg, ids)

    sp = shard_params(params, mesh8)
    out = jax.jit(lambda p, i: qwen2.forward(p, cfg, i)[0])(sp, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_export_roundtrip(tiny_hf_dir, tiny_model, tmp_path):
    params, cfg = tiny_model
    out_dir = str(tmp_path / "export")
    loader.export_hf(params, cfg, out_dir, src_config_dir=tiny_hf_dir)
    params2, cfg2 = loader.load_params(out_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 7)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(params2, cfg2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_value_head_artifact_roundtrip(tmp_path):
    from lapha_tpu.models import value_model

    head = value_model.init_value_head(64, jax.random.key(1))
    p = str(tmp_path / "value_head.npz")
    loader.save_value_head(p, head)
    loaded = loader.load_value_head(p, 64)
    np.testing.assert_allclose(loaded["w"], head["w"], rtol=1e-6)
    np.testing.assert_allclose(loaded["b"], head["b"], rtol=1e-6)


def test_value_head_torch_pt_format(tmp_path):
    """Reference ships value_head.pt as a torch state dict — must load."""
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "value_head.pt")
    torch.save({"weight": torch.randn(1, 64), "bias": torch.randn(1)}, p)
    head = loader.load_value_head(p, 64)
    assert head["w"].shape == (64,)
    # wrapper-prefixed format
    p2 = str(tmp_path / "wrapper.pt")
    torch.save({"base_lm.x": torch.zeros(1), "value_head.weight": torch.randn(1, 64),
                "value_head.bias": torch.randn(1)}, p2)
    head2 = loader.load_value_head(p2, 64)
    assert head2["w"].shape == (64,)


def test_unsupported_head_type_rejected():
    from lapha_tpu.models import value_model

    with pytest.raises(ValueError, match="qwen2"):
        value_model.make_value_head("qwen2", 64, jax.random.key(0))


def test_value_head_pt_export_roundtrip(tmp_path):
    """save_value_head('.pt') emits the reference torch convention."""
    from lapha_tpu.models import value_model

    head = value_model.init_value_head(64, jax.random.key(2))
    p = str(tmp_path / "value_head.pt")
    loader.save_value_head(p, head)
    import torch

    sd = torch.load(p, weights_only=False)
    assert sd["weight"].shape == (1, 64)
    back = loader.load_value_head(p, 64)
    np.testing.assert_allclose(back["w"], head["w"], rtol=1e-6)


# --------------------------------------------------------------- llama family

@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    """Tiny random HF Llama model (no q/k/v bias, untied embeddings)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("tiny_llama")
    hf_cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=500000.0,
        tie_word_embeddings=False,
        attention_bias=False,
        torch_dtype="float32",
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_llama_config_from_hf(tiny_llama_dir):
    cfg = loader.load_config(tiny_llama_dir)
    assert not cfg.attention_bias
    assert not cfg.tie_word_embeddings
    assert cfg.rope_theta == 500000.0


def test_llama_logits_match_hf(tiny_llama_dir):
    torch = pytest.importorskip("torch")
    from transformers import LlamaForCausalLM

    params, cfg = loader.load_params(tiny_llama_dir, dtype=jnp.float32)
    # bias slots exist but must be zero (uniform pytree, llama has none)
    assert float(jnp.abs(params["layers"]["attn"]["q_proj"]["b"]).max()) == 0.0
    ids = rng.integers(0, 512, size=(2, 13))
    hf = LlamaForCausalLM.from_pretrained(tiny_llama_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_llama_export_roundtrip(tiny_llama_dir, tmp_path):
    """export_hf on a llama model writes no bias tensors and reloads."""
    params, cfg = loader.load_params(tiny_llama_dir, dtype=jnp.float32)
    out = str(tmp_path / "llama_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_llama_dir)
    from safetensors import safe_open

    with safe_open(out + "/model.safetensors", framework="numpy") as f:
        keys = list(f.keys())
    assert not any(k.endswith("self_attn.q_proj.bias") for k in keys)
    assert "lm_head.weight" in keys
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_mistral_sw_dir(tmp_path_factory):
    """Tiny random HF Mistral with an ACTIVE sliding window (W=8)."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    d = tmp_path_factory.mktemp("tiny_mistral_sw")
    hf_cfg = MistralConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        sliding_window=8,
        torch_dtype="float32",
    )
    torch.manual_seed(3)
    model = MistralForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_mistral_sliding_window_config(tiny_mistral_sw_dir):
    cfg = loader.load_config(tiny_mistral_sw_dir)
    assert cfg.sliding_window == 8


def test_mistral_sliding_window_logits_match_hf(tiny_mistral_sw_dir):
    """T=24 > W=8, so banding is live; logits must match HF eager Mistral."""
    torch = pytest.importorskip("torch")
    from transformers import MistralForCausalLM

    params, cfg = loader.load_params(tiny_mistral_sw_dir, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(2, 24))
    hf = MistralForCausalLM.from_pretrained(
        tiny_mistral_sw_dir, attn_implementation="eager").eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)
    # sanity: a full-attention forward DIFFERS at rows past the window
    cfg_full = dataclasses.replace(cfg, sliding_window=0)
    full, _, _ = qwen2.forward(params, cfg_full, jnp.asarray(ids))
    assert not np.allclose(np.asarray(full[:, -1]), ref[:, -1], atol=1e-3)


def test_mistral_sliding_window_flash_matches_dense(tiny_mistral_sw_dir):
    """The banded flash prefill path == the banded dense path."""
    params, cfg = loader.load_params(tiny_mistral_sw_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 24)))
    mask = np.ones((2, 24), np.int32)
    mask[0, :5] = 0  # left padding on row 0
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


def test_mistral_sliding_window_decode_matches_forward(tiny_mistral_sw_dir):
    """Cache-mode suffix prefill + 1-token steps == full banded forward."""
    params, cfg = loader.load_params(tiny_mistral_sw_dir, dtype=jnp.float32)
    B, T_total, T_prefill = 2, 20, 12
    ids = jnp.asarray(rng.integers(0, 512, size=(B, T_total)))
    full_logits, _, _ = qwen2.forward(params, cfg, ids)

    cache = qwen2.init_kv_cache(cfg, B, 32)
    pre, _, cache = qwen2.forward(
        params, cfg, ids[:, :T_prefill], kv_cache=cache, cache_pos=0,
        positions=jnp.broadcast_to(jnp.arange(T_prefill)[None], (B, T_prefill)),
    )
    np.testing.assert_allclose(np.asarray(pre),
                               np.asarray(full_logits[:, :T_prefill]),
                               rtol=2e-3, atol=2e-3)
    for t in range(T_prefill, T_total):
        step, _, cache = qwen2.forward(
            params, cfg, ids[:, t:t + 1], kv_cache=cache, cache_pos=t,
            positions=jnp.full((B, 1), t),
        )
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=5e-3, atol=5e-3, err_msg=f"t={t}")


def test_mistral_sliding_window_engine_greedy_matches_hf(tiny_mistral_sw_dir):
    """Engine prefill + banded decode_step greedy == HF greedy (12 steps
    from a 12-token prompt with W=8: decode leaves the window mid-run)."""
    torch = pytest.importorskip("torch")
    from transformers import MistralForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_mistral_sw_dir, dtype=jnp.float32)

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

    hf = MistralForCausalLM.from_pretrained(
        tiny_mistral_sw_dir, attn_implementation="eager").eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(12):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_mixed_sliding_layer_stack_parses_to_layer_windows(tiny_llama_dir,
                                                           tmp_path):
    """qwen2-style max_window_layers mid-stack -> per-layer layer_windows
    (heterogeneous stacks became first-class with the gemma families)."""
    import json as _json
    import shutil

    d = tmp_path / "qwen2_mixed_sw"
    shutil.copytree(tiny_llama_dir, d)
    with open(d / "config.json") as f:
        cfg = _json.load(f)
    cfg["model_type"] = "qwen2"
    cfg["sliding_window"] = 16
    cfg["use_sliding_window"] = True
    cfg["max_window_layers"] = 1  # of 2 layers -> mixed stack
    with open(d / "config.json", "w") as f:
        _json.dump(cfg, f)
    c = loader.load_config(str(d))
    assert c.sliding_window == 0
    assert c.layer_windows == (0, 16)
    assert c.max_window_ == 16


def test_qwen2_missing_max_window_layers_uses_hf_default(tiny_llama_dir,
                                                         tmp_path):
    """A qwen2 config with use_sliding_window but NO max_window_layers key
    must resolve to the HF class default (28), i.e. all-full attention for
    a 2-layer model — not an all-sliding stack from a 0 default."""
    import json as _json
    import shutil

    d = tmp_path / "qwen2_no_mwl"
    shutil.copytree(tiny_llama_dir, d)
    with open(d / "config.json") as f:
        cfg = _json.load(f)
    cfg["model_type"] = "qwen2"
    cfg["sliding_window"] = 16
    cfg["use_sliding_window"] = True
    cfg.pop("max_window_layers", None)
    with open(d / "config.json", "w") as f:
        _json.dump(cfg, f)
    assert loader.load_config(str(d)).sliding_window == 0


def test_qwen2_sliding_window_ignored_without_flag(tiny_hf_dir, tmp_path):
    """qwen2 configs carry sliding_window but it is inert unless
    use_sliding_window is set (transformers semantics)."""
    import json as _json
    import shutil

    d = tmp_path / "qwen2_inert_sw"
    shutil.copytree(tiny_hf_dir, d)
    with open(d / "config.json") as f:
        cfg = _json.load(f)
    cfg["sliding_window"] = 128
    with open(d / "config.json", "w") as f:
        _json.dump(cfg, f)
    assert loader.load_config(str(d)).sliding_window == 0


def test_sliding_window_spec_greedy_bit_identical(tiny_mistral_sw_dir):
    """Spec-decode verify (decode_step_multi) bands by POSITION via the
    engine's per-column pos_map (bitmap holes break decode_step's affine
    column->position map), so windowed models compose with spec decode:
    greedy streams bit-identical to the banded non-spec engine. W=8 with a
    repetitive 20-token prompt + 24 steps: drafts get accepted AND the
    window leaves the prompt mid-run, exercising both the hole bookkeeping
    and the band."""
    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_mistral_sw_dir, dtype=jnp.float32)

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

    base = [5, 6, 7, 8, 9, 10]
    prompts = [" ".join(map(str, base + base[-4:] + base[-4:])),
               " ".join(map(str, range(20, 31)))]
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=24, seed=5)
    ref = mk().generate(prompts, sp)
    out = mk(spec_decode="pld", spec_k=3).generate(prompts, sp)
    for r, o in zip(ref, out):
        assert o.outputs[0].token_ids == r.outputs[0].token_ids


# --------------------------------------------------------------- qwen3 family

@pytest.fixture(scope="module")
def tiny_qwen3_dir(tmp_path_factory):
    """Tiny random HF Qwen3 (no q/k/v bias, per-head q/k RMS norm)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    d = tmp_path_factory.mktemp("tiny_qwen3")
    hf_cfg = HFQwen3Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=24,  # qwen3 decouples head_dim from hidden/heads
        max_position_embeddings=256,
        rope_theta=1000000.0,
        tie_word_embeddings=True,
        torch_dtype="float32",
    )
    torch.manual_seed(2)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    # break the all-ones init so the q/k norms actually do something
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.mul_(1.5).add_(0.1)
            layer.self_attn.k_norm.weight.mul_(0.7)
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_qwen3_config_from_hf(tiny_qwen3_dir):
    cfg = loader.load_config(tiny_qwen3_dir)
    assert cfg.qk_norm
    assert not cfg.attention_bias
    assert cfg.head_dim_ == 24


def test_qwen3_logits_match_hf(tiny_qwen3_dir):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3ForCausalLM

    params, cfg = loader.load_params(tiny_qwen3_dir, dtype=jnp.float32)
    assert "q_norm" in params["layers"]["attn"]
    ids = rng.integers(0, 512, size=(2, 11))
    hf = Qwen3ForCausalLM.from_pretrained(tiny_qwen3_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_qwen3_decode_matches_prefill(tiny_qwen3_dir):
    """qk_norm through the engine decode path: KV-cached greedy == HF greedy."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_qwen3_dir, dtype=jnp.float32)

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
    prompt = [5, 6, 7, 8, 9]
    out = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=6))
    got = out[0].outputs[0].token_ids

    hf = Qwen3ForCausalLM.from_pretrained(tiny_qwen3_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_qwen3_export_roundtrip(tiny_qwen3_dir, tmp_path):
    params, cfg = loader.load_params(tiny_qwen3_dir, dtype=jnp.float32)
    out = str(tmp_path / "qwen3_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_qwen3_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------- rope scaling

@pytest.fixture(scope="module")
def tiny_llama31_dir(tmp_path_factory):
    """Tiny random HF Llama model WITH llama3 rope_scaling (Llama-3.1+)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("tiny_llama31")
    hf_cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=500000.0,
        tie_word_embeddings=False, attention_bias=False, torch_dtype="float32",
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 256},
    )
    torch.manual_seed(5)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_llama3_rope_scaling_inv_freq_matches_transformers():
    """rope_freqs' llama3 branch vs transformers' own llama3 rope init
    (modeling_rope_utils._compute_llama3_parameters) on a real head_dim."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    dh, theta = 128, 500000.0
    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 8192}
    hf_cfg = LlamaConfig(hidden_size=dh * 4, num_attention_heads=4,
                         rope_theta=theta, rope_scaling=dict(rs),
                         max_position_embeddings=131072)
    ref_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, device="cpu")
    scaling = qwen2.Qwen2Config._parse_rope_scaling({"rope_scaling": rs})
    pos = jnp.asarray([1.0])
    cos, sin = qwen2.rope_freqs(pos, dh, theta, scaling)
    ours_inv = np.arctan2(np.asarray(sin)[0], np.asarray(cos)[0])  # angle at pos=1
    np.testing.assert_allclose(ours_inv, ref_inv.numpy(), rtol=1e-6, atol=1e-8)


def test_llama31_logits_match_hf(tiny_llama31_dir):
    """End-to-end HF parity for a rope-scaled checkpoint, at positions past
    the ORIGINAL context (where unscaled frequencies would diverge)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaForCausalLM

    params, cfg = loader.load_params(tiny_llama31_dir, dtype=jnp.float32)
    assert cfg.rope_scaling[0] == "llama3"
    ids = rng.integers(0, 512, size=(1, 300))  # > original 256
    hf = LlamaForCausalLM.from_pretrained(tiny_llama31_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_linear_rope_scaling_matches_transformers(tiny_llama_dir, tmp_path):
    """linear scaling: config parses and halved frequencies match HF."""
    import json as _json
    import shutil

    torch = pytest.importorskip("torch")
    from transformers import LlamaForCausalLM

    d = tmp_path / "llama_linear"
    shutil.copytree(tiny_llama_dir, d)
    with open(d / "config.json") as f:
        c = _json.load(f)
    c["rope_scaling"] = {"rope_type": "linear", "factor": 2.0}
    with open(d / "config.json", "w") as f:
        _json.dump(c, f)
    params, cfg = loader.load_params(str(d), dtype=jnp.float32)
    assert cfg.rope_scaling == ("linear", 2.0)
    ids = rng.integers(0, 512, size=(1, 40))
    hf = LlamaForCausalLM.from_pretrained(str(d)).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_yarn_rope_scaling_matches_transformers():
    """rope_freqs' yarn branch vs transformers' own yarn rope init
    (modeling_rope_utils._compute_yarn_parameters): inv freqs AND the
    attention_factor (mscale) that scales cos/sin, with and without
    explicit mscale/mscale_all_dim (DeepSeek-style configs)."""
    pytest.importorskip("torch")
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    dh, theta = 128, 1e6
    cases = [
        {"rope_type": "yarn", "factor": 4.0,
         "original_max_position_embeddings": 32768},
        {"rope_type": "yarn", "factor": 32.0, "beta_fast": 64,
         "beta_slow": 2, "original_max_position_embeddings": 4096,
         "mscale": 1.0, "mscale_all_dim": 0.8},
        {"rope_type": "yarn", "factor": 2.5, "attention_factor": 1.3,
         "original_max_position_embeddings": 8192},
    ]
    for rs in cases:
        hf_cfg = LlamaConfig(hidden_size=dh * 4, num_attention_heads=4,
                             rope_theta=theta, rope_scaling=dict(rs),
                             max_position_embeddings=131072)
        ref_inv, ref_att = ROPE_INIT_FUNCTIONS["yarn"](hf_cfg, device="cpu")
        scaling = qwen2.Qwen2Config._parse_rope_scaling(
            {"rope_scaling": rs, "max_position_embeddings": 131072})
        assert scaling[0] == "yarn"
        assert scaling[2] == pytest.approx(float(ref_att), rel=1e-9), rs
        pos = jnp.asarray([1.0])
        cos, sin = qwen2.rope_freqs(pos, dh, theta, scaling)
        # angle at pos=1 recovers inv_freq regardless of the mscale factor
        ours_inv = np.arctan2(np.asarray(sin)[0], np.asarray(cos)[0])
        np.testing.assert_allclose(ours_inv, ref_inv.numpy(),
                                   rtol=1e-6, atol=1e-8, err_msg=str(rs))
        # cos²+sin² == attention_factor² (the mscale is applied to tables)
        np.testing.assert_allclose(
            np.asarray(cos)[0] ** 2 + np.asarray(sin)[0] ** 2,
            np.full(dh // 2, float(ref_att) ** 2), rtol=1e-5)


def test_yarn_logits_match_hf(tiny_llama_dir, tmp_path):
    """End-to-end HF parity for a YaRN checkpoint at positions past the
    original context window (Qwen2.5-1M-style long-context configs)."""
    import json as _json
    import shutil

    torch = pytest.importorskip("torch")
    from transformers import LlamaForCausalLM

    d = tmp_path / "llama_yarn"
    shutil.copytree(tiny_llama_dir, d)
    with open(d / "config.json") as f:
        c = _json.load(f)
    c["rope_scaling"] = {"rope_type": "yarn", "factor": 4.0,
                         "original_max_position_embeddings": 128}
    c["max_position_embeddings"] = 1024
    with open(d / "config.json", "w") as f:
        _json.dump(c, f)
    params, cfg = loader.load_params(str(d), dtype=jnp.float32)
    assert cfg.rope_scaling[0] == "yarn"
    ids = rng.integers(0, 512, size=(1, 300))  # > original 128
    hf = LlamaForCausalLM.from_pretrained(str(d)).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_unsupported_rope_scaling_rejected(tiny_llama_dir, tmp_path):
    """Unimplemented scaling types (longrope/dynamic) must fail loudly at
    load time, not load with wrong frequencies (round-2 advisor finding)."""
    import json as _json
    import shutil

    d = tmp_path / "llama_longrope"
    shutil.copytree(tiny_llama_dir, d)
    with open(d / "config.json") as f:
        c = _json.load(f)
    c["rope_scaling"] = {"rope_type": "longrope", "factor": 4.0}
    with open(d / "config.json", "w") as f:
        _json.dump(c, f)
    with pytest.raises(ValueError, match="longrope"):
        loader.load_config(str(d))

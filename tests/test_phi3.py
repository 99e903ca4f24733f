"""Phi-3 family: fused-checkpoint split/refuse, HF parity, engine decode.

Model-family widening beyond the reference (which serves only dense Qwen2.5
via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663): Phi-3
checkpoints store FUSED qkv_proj / gate_up_proj mats (HF Phi3Attention /
Phi3MLP); the loader splits them into the uniform per-proj pytree so every
compute path (decode, flash, quantized, sharded) is untouched, and export
re-fuses so the result reloads in vanilla transformers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, loader, qwen2

rng = np.random.default_rng(13)


@pytest.fixture(scope="module")
def tiny_hf_phi3_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    d = tmp_path_factory.mktemp("tiny_phi3")
    hf_cfg = Phi3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,  # Phi3Config
        # defaults (32000/1/32000) exceed the tiny vocab
    )
    torch.manual_seed(4)
    model = Phi3ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_phi3_config_from_hf(tiny_hf_phi3_dir):
    cfg = loader.load_config(tiny_hf_phi3_dir)
    assert cfg.fused_qkv
    assert not cfg.attention_bias
    assert cfg.sliding_window == 0  # None in the default config
    assert cfg.num_experts == 0


def test_phi3_sliding_window_parses():
    cfg = Qwen2Config.from_hf({
        "model_type": "phi3", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 2, "sliding_window": 16,
    })
    assert cfg.sliding_window == 16 and cfg.layer_windows == ()


def test_phi3_longrope_rejected():
    """Phi-3 128k checkpoints use rope_scaling type 'longrope'; loading
    them with unscaled frequencies would be silently wrong -> refuse."""
    with pytest.raises(ValueError, match="longrope"):
        Qwen2Config.from_hf({
            "model_type": "phi3", "vocab_size": 128, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "rope_scaling": {"type": "longrope", "long_factor": [1.0],
                             "short_factor": [1.0]},
        })


def test_phi3_partial_rotary_rejected():
    """phi-4-mini sets partial_rotary_factor=0.75; this stack ropes the
    full head_dim -> refuse rather than produce wrong positions."""
    with pytest.raises(ValueError, match="partial_rotary_factor"):
        Qwen2Config.from_hf({
            "model_type": "phi3", "vocab_size": 128, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "partial_rotary_factor": 0.75,
        })


def test_phi3_logits_match_hf(tiny_hf_phi3_dir):
    torch = pytest.importorskip("torch")
    from transformers import Phi3ForCausalLM

    params, cfg = loader.load_params(tiny_hf_phi3_dir, dtype=jnp.float32)
    # fused mats were split into the uniform per-proj pytree
    assert params["layers"]["attn"]["q_proj"]["w"].shape == (2, 64, 64)
    assert params["layers"]["mlp"]["gate_proj"]["w"].shape == (2, 64, 128)
    ids = rng.integers(0, 512, size=(2, 13))
    hf = Phi3ForCausalLM.from_pretrained(tiny_hf_phi3_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_phi3_engine_greedy_matches_hf(tiny_hf_phi3_dir):
    torch = pytest.importorskip("torch")
    from transformers import Phi3ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_phi3_dir, dtype=jnp.float32)

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
    got = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=6)
                       )[0].outputs[0].token_ids
    hf = Phi3ForCausalLM.from_pretrained(tiny_hf_phi3_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_phi3_export_roundtrip(tiny_hf_phi3_dir, tmp_path):
    """Export re-fuses qkv/gate_up, so the dir reloads both through this
    loader AND vanilla Phi3ForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import Phi3ForCausalLM

    params, cfg = loader.load_params(tiny_hf_phi3_dir, dtype=jnp.float32)
    out = str(tmp_path / "phi3_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_phi3_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = Phi3ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)


def test_phi3_int8_load(tiny_hf_phi3_dir):
    """int8 quantization applies to the SPLIT mats identically to
    per-tensor checkpoints (finish() runs after the host-side split)."""
    from lapha_tpu.models.quant import is_quantized

    params, cfg = loader.load_params(tiny_hf_phi3_dir, dtype=jnp.float32)
    q, qcfg = loader.load_params(tiny_hf_phi3_dir, dtype=jnp.float32,
                                 quantize="int8")
    assert is_quantized(q["layers"]["attn"]["q_proj"]["w"])
    assert is_quantized(q["layers"]["mlp"]["gate_proj"]["w"])
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 10)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(q, qcfg, ids)
    assert float(jnp.max(jnp.abs(l1 - l2))) < 0.15

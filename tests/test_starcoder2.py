"""StarCoder2 family: biased LayerNorm residual stream + plain (non-gated) FFN.

Model-family widening beyond the reference (which serves only dense
Qwen2.5 via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663):
StarCoder2 checkpoints (mean-centered LayerNorm with bias instead of RMS,
c_fc -> gelu -> c_proj FFN, biases on every projection, tied embeddings)
load, match HF logits, and decode through the Engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import loader, qwen2

rng = np.random.default_rng(43)


@pytest.fixture(scope="module")
def tiny_hf_sc2_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    d = tmp_path_factory.mktemp("tiny_sc2")
    hf_cfg = Starcoder2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        use_bias=True, tie_word_embeddings=True, torch_dtype="float32",
        attn_implementation="eager",
    )
    torch.manual_seed(13)
    model = Starcoder2ForCausalLM(hf_cfg).eval()
    # LayerNorm biases init to 0 — randomize so the differential proves
    # the bias path (and the mean-centering) is actually exercised
    with torch.no_grad():
        for layer in model.model.layers:
            layer.input_layernorm.bias.uniform_(-0.3, 0.3)
            layer.post_attention_layernorm.bias.uniform_(-0.3, 0.3)
        model.model.norm.bias.uniform_(-0.3, 0.3)
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_config_from_hf(tiny_hf_sc2_dir):
    cfg = loader.load_config(tiny_hf_sc2_dir)
    assert cfg.norm_style == "layernorm"
    assert cfg.mlp_style == "plain"
    assert cfg.attention_bias and cfg.o_proj_bias
    assert cfg.tie_word_embeddings


def test_logits_match_hf(tiny_hf_sc2_dir):
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2ForCausalLM

    params, cfg = loader.load_params(tiny_hf_sc2_dir, dtype=jnp.float32)
    assert "bias" in params["layers"]["input_layernorm"]
    assert "c_fc" in params["layers"]["mlp"]
    ids = rng.integers(0, 512, size=(2, 13))
    hf = Starcoder2ForCausalLM.from_pretrained(tiny_hf_sc2_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_engine_greedy_matches_hf(tiny_hf_sc2_dir):
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_sc2_dir, dtype=jnp.float32)

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
    hf = Starcoder2ForCausalLM.from_pretrained(tiny_hf_sc2_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_export_roundtrip(tiny_hf_sc2_dir, tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2ForCausalLM

    params, cfg = loader.load_params(tiny_hf_sc2_dir, dtype=jnp.float32)
    out = str(tmp_path / "sc2_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_sc2_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = Starcoder2ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)

"""OLMo-2 family: post-norms-only residual structure + full-width qk norms.

Model-family widening beyond the reference (which serves only dense
Qwen2.5 via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663):
OLMo-2 checkpoints (no pre-norms — each sublayer OUTPUT is normed before
the residual add; q/k RMS-normed over the full projection width before
the head reshape) load, match HF logits, and decode through the Engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import loader, qwen2

rng = np.random.default_rng(41)


@pytest.fixture(scope="module")
def tiny_hf_olmo2_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Olmo2Config, Olmo2ForCausalLM

    d = tmp_path_factory.mktemp("tiny_olmo2")
    hf_cfg = Olmo2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
        pad_token_id=0, bos_token_id=None, eos_token_id=2,
    )
    torch.manual_seed(11)
    model = Olmo2ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_config_from_hf(tiny_hf_olmo2_dir):
    cfg = loader.load_config(tiny_hf_olmo2_dir)
    assert cfg.post_norms_only and cfg.qk_norm_full
    assert not cfg.qk_norm and not cfg.attention_bias


def test_logits_match_hf(tiny_hf_olmo2_dir):
    torch = pytest.importorskip("torch")
    from transformers import Olmo2ForCausalLM

    params, cfg = loader.load_params(tiny_hf_olmo2_dir, dtype=jnp.float32)
    assert "input_layernorm" not in params["layers"]
    assert params["layers"]["attn"]["q_norm"]["scale"].shape == (2, 64)
    ids = rng.integers(0, 512, size=(2, 13))
    hf = Olmo2ForCausalLM.from_pretrained(tiny_hf_olmo2_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_engine_greedy_matches_hf(tiny_hf_olmo2_dir):
    torch = pytest.importorskip("torch")
    from transformers import Olmo2ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_olmo2_dir, dtype=jnp.float32)

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
    hf = Olmo2ForCausalLM.from_pretrained(tiny_hf_olmo2_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_export_roundtrip(tiny_hf_olmo2_dir, tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Olmo2ForCausalLM

    params, cfg = loader.load_params(tiny_hf_olmo2_dir, dtype=jnp.float32)
    out = str(tmp_path / "olmo2_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_olmo2_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = Olmo2ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)

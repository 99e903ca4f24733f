"""Weight-only int8 quantization: accuracy + memory + generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, qwen2
from lapha_tpu.models.quant import dequant, is_quantized, params_nbytes, quantize_params, quantize_weight

rng = np.random.default_rng(11)


def test_quantize_weight_roundtrip_error():
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    back = dequant(q, jnp.float32)
    rel = float(jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01  # int8 per-channel: <1% of max


def test_quantize_params_structure_and_size():
    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    qp = quantize_params(params)
    assert is_quantized(qp["layers"]["attn"]["q_proj"]["w"])
    assert is_quantized(qp["embed"]["weight"])
    assert not is_quantized(qp["norm"])
    assert qp["layers"]["input_layernorm"]["scale"].dtype == params["layers"]["input_layernorm"]["scale"].dtype
    # int8 + f32 scales < f32 weights
    assert params_nbytes(qp) < 0.45 * params_nbytes(params)


def test_quantized_forward_close():
    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    qp = quantize_params(params)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    lf, _, _ = qwen2.forward(params, cfg, ids)
    lq, _, _ = qwen2.forward(qp, cfg, ids)
    # logits stay strongly correlated (top-1 mostly agrees on random nets)
    pf = np.asarray(jnp.argmax(lf, -1))
    pq = np.asarray(jnp.argmax(lq, -1))
    agree = (pf == pq).mean()
    assert agree > 0.8, f"top-1 agreement {agree}"
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.99


def test_quantized_engine_generates():
    from lapha_tpu.engine import Engine, SamplingParams

    class ByteTok:
        eos_token_id = 0
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

        def decode(self, ids, **kw):
            return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")

    cfg = Qwen2Config.tiny(vocab_size=300)
    params = quantize_params(qwen2.init_params(cfg, jax.random.key(3)))
    eng = Engine(params, cfg, ByteTok(), max_model_len=128, max_batch=4,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1, eos_token_ids=[0])
    out = eng.generate(["int8 check"], SamplingParams(n=2, temperature=0.5, max_tokens=6, seed=3))[0]
    assert len(out.outputs) == 2
    assert all(len(o.token_ids) >= 1 for o in out.outputs)


def test_kv_cache_decode_consistent_quantized():
    cfg = Qwen2Config.tiny()
    qp = quantize_params(qwen2.init_params(cfg, jax.random.key(0)))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)))
    full, _, _ = qwen2.forward(qp, cfg, ids)
    cache = qwen2.init_kv_cache(cfg, 1, 16)
    pre, _, cache = qwen2.forward(qp, cfg, ids[:, :6], kv_cache=cache, cache_pos=0,
                                  positions=jnp.arange(6)[None])
    step, _, _ = qwen2.forward(qp, cfg, ids[:, 6:7], kv_cache=cache, cache_pos=6,
                               positions=jnp.full((1, 1), 6))
    np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, 6]),
                               rtol=5e-3, atol=5e-3)


def test_load_params_quantized(tmp_path):
    """HF checkpoint -> int8 tree, logits track the f32 load."""
    import sys as _sys
    _sys.path.insert(0, "tests")
    from model_fixtures import build_tiny_model_dir
    from lapha_tpu.models import loader

    d = build_tiny_model_dir(str(tmp_path / "m"))
    pf, cf = loader.load_params(d, dtype=jnp.float32)
    pq, cq = loader.load_params(d, dtype=jnp.float32, quantize="int8")
    assert is_quantized(pq["layers"]["mlp"]["gate_proj"]["w"])
    assert is_quantized(pq["embed"]["weight"])
    ids = jnp.asarray(rng.integers(0, 2000, (1, 12)))
    lf, _, _ = qwen2.forward(pf, cf, ids)
    lq, _, _ = qwen2.forward(pq, cq, ids)
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.99


# --------------------------------------------------------------- int4 (g128)

def test_int4_roundtrip_error_bounded():
    """Group-wise int4 RTN: reconstruction error <= per-group amax/14."""
    from lapha_tpu.models.quant import quantize_weight_int4

    w = jnp.asarray(rng.normal(size=(256, 48)).astype(np.float32))
    leaf = quantize_weight_int4(w, group=64)
    assert leaf["q"].dtype == jnp.uint8 and leaf["q"].shape == (128, 48)
    assert leaf["s4"].shape == (4, 48)
    d = dequant(leaf, jnp.float32)
    wf = np.asarray(w).reshape(4, 64, 48)
    bound = np.abs(wf).max(axis=1) / 14.0 + 1e-6      # (4, 48) per group
    err = np.abs(np.asarray(d).reshape(4, 64, 48) - wf).max(axis=1)
    assert (err <= bound).all()


def test_int4_params_smaller_and_forward_close():
    """bits=4 quantizes projections to int4 (embed stays int8); logits
    stay strongly correlated with f32 on a tiny random net and the engine
    decodes greedily end-to-end."""
    from lapha_tpu.engine import Engine, SamplingParams

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    qp = quantize_params(params, bits=4, group=32)
    leaf = qp["layers"]["mlp"]["gate_proj"]["w"]
    assert leaf["q"].dtype == jnp.uint8 and "s4" in leaf
    assert qp["embed"]["weight"]["q"].dtype == jnp.int8

    ids = jnp.asarray(rng.integers(0, 512, size=(2, 12)))
    lf, _, _ = qwen2.forward(params, cfg, ids)
    lq, _, _ = qwen2.forward(qp, cfg, ids)
    cc = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert cc > 0.9

    class IdTok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=True, **kw):
            return {"input_ids": [int(x) for x in text.split()]}

        def decode(self, ids, **kw):
            return ""

    e = Engine(qp, cfg, IdTok(), max_model_len=64, max_batch=2, decode_chunk=4,
               pad_multiple=16, batch_bucket=1, eos_token_ids=[],
               prefix_cache_bytes=0)
    out = e.generate(["5 6 7 8"], SamplingParams(n=1, temperature=0.0,
                                                 max_tokens=6))
    assert len(out[0].outputs[0].token_ids) == 6


def test_load_params_int4(tmp_path):
    """HF checkpoint -> quantize="int4": projections whose in-dim splits
    into whole group-128 halves pack int4 (offset-binary nibbles);
    embed/lm_head and too-small projections fall back int8; logits track
    the f32 load."""
    import sys as _sys
    _sys.path.insert(0, "tests")
    from model_fixtures import build_tiny_model_dir
    from lapha_tpu.models import loader

    d = build_tiny_model_dir(str(tmp_path / "m"), hidden=256, inter=512,
                             heads=4, kv_heads=2)
    pf, cf = loader.load_params(d, dtype=jnp.float32)
    pq, cq = loader.load_params(d, dtype=jnp.float32, quantize="int4")
    gate = pq["layers"]["mlp"]["gate_proj"]["w"]
    assert gate["q"].dtype == jnp.uint8 and "s4" in gate  # IN=256: int4
    assert gate["q"].shape[-2] == 128 and gate["s4"].shape[-2] == 2
    down = pq["layers"]["mlp"]["down_proj"]["w"]
    assert "s4" in down                                   # IN=512: int4
    assert pq["embed"]["weight"]["q"].dtype == jnp.int8   # int8 fallback
    ids = jnp.asarray(rng.integers(0, 2000, (1, 12)))
    lf, _, _ = qwen2.forward(pf, cf, ids)
    lq, _, _ = qwen2.forward(pq, cq, ids)
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    # int4 RTN on a random-gaussian tiny net is the worst case (no
    # outlier structure, 2 groups/row); real checkpoints correlate higher
    assert corr > 0.9


def test_int4_init_params_quantized_shapes():
    from lapha_tpu.models.quant import init_params_quantized

    cfg = Qwen2Config.tiny()
    qp = init_params_quantized(cfg, seed=0, bits=4, group=32)
    w = qp["layers"]["attn"]["q_proj"]["w"]
    assert w["q"].dtype == jnp.uint8
    assert w["q"].shape[-2] == cfg.hidden_size // 2
    assert w["s4"].shape[-2] == cfg.hidden_size // 32

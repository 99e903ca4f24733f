"""DeepSeek-V2/V3 family: MLA + grouped routing, HF parity, latent decode.

Model-family widening beyond the reference (which serves only dense
Qwen2.5 via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663):
Multi-head Latent Attention checkpoints load into the two-group stacked
pytree, match HF logits (V2 greedy + group-limited routing; V3 sigmoid +
e_score_correction_bias "noaux_tc"), and decode through the absorbed
latent-cache path bit-consistently with the full forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import deepseek, loader
from lapha_tpu.models.deepseek import DeepseekConfig

rng = np.random.default_rng(21)


def tiny_cfg(**kw):
    base = dict(vocab_size=512, hidden_size=64, intermediate_size=96,
                num_hidden_layers=3, num_attention_heads=4,
                q_lora_rank=0, kv_lora_rank=32, qk_nope_head_dim=16,
                qk_rope_head_dim=8, v_head_dim=16,
                n_routed_experts=8, num_experts_per_tok=2,
                moe_intermediate_size=24, n_shared_experts=1,
                first_k_dense_replace=1, dtype=jnp.float32)
    base.update(kw)
    return DeepseekConfig(**base)


@pytest.fixture(scope="module")
def tiny_hf_v2_dir(tmp_path_factory):
    """V2-Lite-shaped: no q_lora, softmax scores, group_limited_greedy."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    d = tmp_path_factory.mktemp("tiny_dsv2")
    hf_cfg = DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=24, first_k_dense_replace=1,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = DeepseekV2ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def tiny_hf_v3_dir(tmp_path_factory):
    """V3-shaped: q_lora, sigmoid scores + correction bias, noaux_tc."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    d = tmp_path_factory.mktemp("tiny_dsv3")
    hf_cfg = DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=24, first_k_dense_replace=1,
        n_group=4, topk_group=2, routed_scaling_factor=2.5,
        norm_topk_prob=True, rope_interleave=True,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype="float32",
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    # a zero correction bias would make noaux_tc degenerate to unbiased
    # selection — randomize it so the differential exercises the bias path
    for layer in model.model.layers:
        if hasattr(layer.mlp, "gate"):
            layer.mlp.gate.e_score_correction_bias.data = (
                torch.randn(8) * 0.5)
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_v2_config_from_hf(tiny_hf_v2_dir):
    cfg = loader.load_config(tiny_hf_v2_dir)
    assert isinstance(cfg, DeepseekConfig)
    assert cfg.q_lora_rank == 0
    assert cfg.kv_lora_rank == 32
    assert cfg.cache_width_ == 40
    assert cfg.topk_method == "group_limited_greedy"
    assert cfg.scoring_func == "softmax"
    assert cfg.num_dense_layers_ == 1 and cfg.num_moe_layers_ == 2


def test_v3_config_from_hf(tiny_hf_v3_dir):
    cfg = loader.load_config(tiny_hf_v3_dir)
    assert cfg.q_lora_rank == 24
    assert cfg.topk_method == "noaux_tc"
    assert cfg.scoring_func == "sigmoid"
    assert cfg.norm_topk_prob
    assert cfg.routed_scaling_factor == 2.5


def test_v2_logits_match_hf(tiny_hf_v2_dir):
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2ForCausalLM

    params, cfg = loader.load_params(tiny_hf_v2_dir, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(2, 13))
    hf = DeepseekV2ForCausalLM.from_pretrained(tiny_hf_v2_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = deepseek.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_v3_logits_match_hf(tiny_hf_v3_dir):
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3ForCausalLM

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    assert "bias" in params["moe_layers"]["moe"]["router"]
    ids = rng.integers(0, 512, size=(2, 13))
    hf = DeepseekV3ForCausalLM.from_pretrained(tiny_hf_v3_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = deepseek.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_latent_decode_matches_forward(tiny_hf_v3_dir):
    """Cached prefill + absorbed latent-cache decode == the full no-cache
    forward on the extended sequence (weight-absorption identity), over
    several steps — the Engine contract end to end."""
    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    B, T0, S, steps = 2, 9, 24, 5
    ids = jnp.asarray(rng.integers(2, 512, size=(B, T0)))
    ref0, _, _ = deepseek.forward(params, cfg, ids)
    ck, cv = deepseek.init_kv_cache(cfg, B, S)
    kv_valid = jnp.broadcast_to(jnp.arange(S)[None, :] < T0, (B, S))
    logits, _, (ck, cv) = deepseek.forward(
        params, cfg, ids, kv_cache=(ck, cv), cache_pos=0, kv_valid=kv_valid)
    # cache-threaded prefill must equal the no-cache forward
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref0),
                               rtol=1e-4, atol=1e-4)
    # prefill layout (L,B,S,1,W) -> decode layout (L,B,1,S,W)
    ckd = jnp.transpose(ck, (0, 1, 3, 2, 4))
    cvd = jnp.transpose(cv, (0, 1, 3, 2, 4))
    lens = jnp.full((B,), T0, jnp.int32)
    dstart = jnp.full((B,), T0, jnp.int32)
    seq = ids
    step_fn = jax.jit(deepseek.decode_step, static_argnums=(1,))
    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    for t in range(steps):
        slot = T0 + t
        lg, _, ckd, cvd = step_fn(
            params, cfg, nxt, jnp.full((B,), slot, jnp.int32), ckd, cvd,
            jnp.asarray(slot, jnp.int32), lens, dstart)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        ref, _, _ = deepseek.forward(params, cfg, seq)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(ref[:, -1]),
                                   rtol=1e-4, atol=1e-4)
        nxt = jnp.argmax(lg, -1).astype(jnp.int32)


class _IdTok:
    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [int(w) for w in text.split()]}

    def decode(self, ids, **kw):
        return " ".join(str(int(i)) for i in ids)


def _hf_greedy(hf, torch, prompt, steps):
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(steps):
            nt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nt]])], 1)
    return seq[0, len(prompt):].tolist()


def test_engine_greedy_matches_hf(tiny_hf_v2_dir):
    """MLA models serve through the REAL Engine (dispatched decode path,
    slot-uniform latent cache) — greedy == HF greedy."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_v2_dir, dtype=jnp.float32)
    eng = Engine(params, cfg, _IdTok(), max_model_len=64, max_batch=2,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=0)
    prompt = [5, 6, 7, 8, 9]
    got = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=6)
                       )[0].outputs[0].token_ids
    hf = DeepseekV2ForCausalLM.from_pretrained(tiny_hf_v2_dir).eval()
    assert got == _hf_greedy(hf, torch, prompt, 6)


def test_engine_prefix_hit_matches_hf(tiny_hf_v3_dir):
    """Prefix-KV reuse on the latent cache: a second request extending a
    cached prompt takes the suffix-prefill path (per-row cache_pos writes
    into the latent plane) and still matches HF greedy."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3ForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    eng = Engine(params, cfg, _IdTok(), max_model_len=64, max_batch=2,
                 decode_chunk=4, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[], prefix_cache_bytes=10_000_000,
                 prefix_cache_min_reuse=4)
    base = [5, 6, 7, 8, 9, 10, 11, 12]
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=5)
    eng.generate([" ".join(map(str, base))], sp)  # seed the prefix store
    ext = base + [13, 14]
    got = eng.generate([" ".join(map(str, ext))], sp)[0].outputs[0].token_ids
    hf = DeepseekV3ForCausalLM.from_pretrained(tiny_hf_v3_dir).eval()
    assert got == _hf_greedy(hf, torch, ext, 5)


def test_spec_greedy_bit_identical(tiny_hf_v2_dir):
    """Spec decode on the MLA family: deepseek.decode_step_multi (the
    weight-absorbed T-token verify over the bitmap-validity latent cache)
    produces greedy streams bit-identical to the non-spec engine (itself
    HF-pinned above), for both the bf16 and int8 latent planes."""
    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_v2_dir, dtype=jnp.float32)

    def mk(**kw):
        return Engine(params, cfg, _IdTok(), max_model_len=128, max_batch=2,
                      decode_chunk=4, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[], prefix_cache_bytes=0, seed=0, **kw)

    base = [5, 6, 7, 8, 9, 10]
    prompts = [" ".join(map(str, base + base[-4:] + base[-4:]))]
    sp = SamplingParams(n=2, temperature=0.0, max_tokens=20, seed=5)
    for q in (None, "int8"):
        ref = mk(kv_quant=q).generate(prompts, sp)
        out = mk(kv_quant=q, spec_decode="pld", spec_k=3).generate(
            prompts, sp)
        for r, o in zip(ref, out):
            for a, b in zip(r.outputs, o.outputs):
                assert a.token_ids == b.token_ids, q


def test_int8_latent_cache_tracks_bf16(tiny_hf_v3_dir):
    """kv_quant on the MLA latent plane: one shared per-vector scale for
    the c and k_pe segments, folded once into the summed score and into
    the combine weights — logits track the bf16 cache within int8
    per-vector error, and this step's latent is written quantized."""
    from lapha_tpu.engine import Engine

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    r = np.random.default_rng(0)
    B, S, Lp = 4, 32, 12
    L, W = cfg.num_hidden_layers, cfg.cache_width_
    ckf = jnp.asarray(r.normal(size=(L, B, 1, S, W)).astype(np.float32)) * 0.3
    cvf = jnp.zeros_like(ckf)
    lens = jnp.asarray(r.integers(4, Lp, B), jnp.int32)
    dstart = jnp.full((B,), Lp, jnp.int32)
    slot = jnp.asarray(Lp, jnp.int32)
    tok = jnp.asarray(r.integers(2, 512, B), jnp.int32)
    ref_logits, _, _, _ = deepseek.decode_step(
        params, cfg, tok, lens, ckf, cvf, slot, lens, dstart)
    ckq, cvq, scale = Engine._quantize_cache_impl(jnp.array(ckf),
                                                  jnp.array(cvf))
    got_logits, _, ckq2, _, scale2 = deepseek.decode_step(
        params, cfg, tok, lens, ckq, cvq, slot, lens, dstart,
        cache_scale=scale)
    assert ckq2.dtype == jnp.int8
    denom = float(jnp.abs(ref_logits).max())
    err = float(jnp.abs(got_logits - ref_logits).max()) / max(denom, 1e-9)
    assert err < 0.05, err
    assert float(jnp.abs(scale2[0][:, :, :, Lp]).min()) > 0


def test_engine_generate_kv_quant_int8_mla(tiny_hf_v3_dir):
    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    r = np.random.default_rng(1)
    prompts = [" ".join(str(i) for i in r.integers(2, 512, 16))
               for _ in range(2)]
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=10)

    def mk(kv_quant):
        return Engine(params, cfg, _IdTok(), max_model_len=64, max_batch=2,
                      decode_chunk=4, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[], prefix_cache_bytes=0, seed=0,
                      kv_quant=kv_quant)

    ref = mk(None).generate(prompts, sp)
    got = mk("int8").generate(prompts, sp)
    for r_ref, r_got in zip(ref, got):
        a = r_ref.outputs[0].token_ids
        b = r_got.outputs[0].token_ids
        assert len(a) == len(b) == 10
        same = sum(x == y for x, y in zip(a, b))
        assert same >= 7, (a, b)


def test_moe_impls_agree_deepseek():
    """gather == dense == dispatch-with-headroom under DeepSeek routing
    (sigmoid + bias + noaux_tc), via the shared exec strategies."""
    cfg = tiny_cfg(scoring_func="sigmoid", topk_method="noaux_tc",
                   n_group=4, topk_group=2, norm_topk_prob=True,
                   routed_scaling_factor=2.5)
    params = deepseek.init_params(cfg, jax.random.key(1))
    # randomize the bias so selection actually uses it
    moe_p = params["moe_layers"]["moe"]
    moe_p["router"]["bias"] = jnp.asarray(
        rng.normal(size=moe_p["router"]["bias"].shape) * 0.5, jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, (2, 12)))
    outs = {}
    for impl in ("gather", "dense", "dispatch"):
        c = dataclasses.replace(cfg, moe_impl=impl, moe_capacity_factor=8.0)
        outs[impl], _, _ = deepseek.forward(params, c, ids)
    np.testing.assert_allclose(np.asarray(outs["gather"]),
                               np.asarray(outs["dense"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outs["dispatch"]),
                               np.asarray(outs["dense"]), rtol=2e-4, atol=2e-4)


def test_v2_int8_load(tiny_hf_v2_dir):
    from lapha_tpu.models.quant import is_quantized

    params, cfg = loader.load_params(tiny_hf_v2_dir, dtype=jnp.float32)
    q, qcfg = loader.load_params(tiny_hf_v2_dir, dtype=jnp.float32,
                                 quantize="int8")
    assert is_quantized(q["moe_layers"]["attn"]["kv_b"]["w"])
    assert is_quantized(q["moe_layers"]["moe"]["experts"]["down_proj"]["w"])
    assert not is_quantized(q["moe_layers"]["moe"]["router"]["w"])
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 10)))
    l1, _, _ = deepseek.forward(params, cfg, ids)
    l2, _, _ = deepseek.forward(q, qcfg, ids)
    assert float(jnp.max(jnp.abs(l1 - l2))) < 0.2


def test_rope_interleave_convention():
    """interleave=True pairs (x[2i], x[2i+1]) at frequency inv[i]; the
    q.k inner product must match a direct complex-rotation reference
    (HF V2's view_as_complex math)."""
    B, T, n, d = 1, 3, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, 1, d)), jnp.float32)
    pos = jnp.arange(T)[None, :]
    from lapha_tpu.models.qwen2 import rope_freqs

    cos, sin = rope_freqs(pos, d, 10000.0, ())
    qr = deepseek._apply_rope_ds(q, cos, sin, True)
    kr = deepseek._apply_rope_ds(k, cos, sin, True)
    got = np.einsum("btnd,bsmd->btns", np.asarray(qr), np.asarray(kr))

    # complex reference
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = np.arange(T)[:, None] * inv[None, :]
    f = np.exp(1j * ang)  # (T, d/2)

    def rot(x):
        xc = x.reshape(*x.shape[:-1], d // 2, 2)
        xc = xc[..., 0] + 1j * xc[..., 1]
        out = xc * f[None, :, None, :]
        return np.stack([out.real, out.imag], -1).reshape(x.shape)

    ref = np.einsum("btnd,bsmd->btns", rot(np.asarray(q)), rot(np.asarray(k)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_export_roundtrip(tiny_hf_v3_dir, tmp_path):
    """export_hf writes the deepseek tensor layout back (q_a/q_b, kv_a
    with mqa suffix, per-expert mats, gate bias), so the dir reloads both
    through this loader AND vanilla DeepseekV3ForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3ForCausalLM

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    out = str(tmp_path / "ds_export")
    deepseek.export_hf(params, cfg, out, src_config_dir=tiny_hf_v3_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = deepseek.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = deepseek.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = DeepseekV3ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)


def test_sharded_forward_matches(mesh8, tiny_hf_v3_dir):
    """MLA + deepseek-MoE forward sharded over a (data=4, model=2) mesh
    (PARAM_RULES: q_b/kv_b head-split TP, expert-dim EP, latent-side mats
    FSDP) reproduces the unsharded logits."""
    from lapha_tpu.parallel import shard_params

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, size=(4, 12)))
    ref, _, _ = deepseek.forward(params, cfg, ids)
    sharded = shard_params(params, mesh8)
    with mesh8:
        got, _, _ = deepseek.forward(sharded, cfg, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_v3_yarn_mscale_logits_match_hf(tmp_path_factory):
    """Real V3/R1 checkpoints carry yarn rope_scaling with mscale_all_dim;
    HF multiplies the softmax scale by yarn_get_mscale(factor,
    mscale_all_dim)^2 (DeepseekV3Attention.__init__) — attn_mscale_sq
    must reproduce it or every logit is ~2x off at factor 40."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    d = tmp_path_factory.mktemp("tiny_dsv3_yarn")
    hf_cfg = DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=24, first_k_dense_replace=1,
        n_group=4, topk_group=2, routed_scaling_factor=2.5,
        norm_topk_prob=True,
        rope_scaling={"rope_type": "yarn", "factor": 8.0, "mscale": 1.0,
                      "mscale_all_dim": 1.0, "beta_fast": 32.0,
                      "beta_slow": 1.0,
                      "original_max_position_embeddings": 64},
        max_position_embeddings=512, tie_word_embeddings=False,
        torch_dtype="float32", attn_implementation="eager",
    )
    torch.manual_seed(9)
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    params, cfg = loader.load_params(str(d), dtype=jnp.float32)
    assert cfg.attn_mscale_sq > 1.2  # (0.1*ln(8)+1)^2 ~ 1.46
    ids = rng.integers(0, 512, size=(2, 13))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    logits, _, _ = deepseek.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_ref_logps_dispatches_deepseek(tiny_hf_v3_dir):
    """The KL-reference / old-policy logps path must route through the
    model dispatch too (reviewer finding: it hardcoded qwen2.forward)."""
    from lapha_tpu.train import losses

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    B, L = 2, 16
    batch = {
        "ids": jnp.asarray(rng.integers(2, 512, (B, L))),
        "attn": jnp.ones((B, L), jnp.int32),
        "comp_mask": jnp.ones((B, L), jnp.int32),
    }
    lp = losses.ref_logps_fn(params, batch, cfg, 1.0)
    assert lp.shape == (B, L - 1)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_grpo_value_update_step(tiny_hf_v3_dir):
    """The reference's core capability on the new family: ONE jitted
    GRPO+value training step (losses.make_update_fn) over an MLA+MoE
    model — finite loss, finite grads through kv_b/q_b/experts
    (model_module dispatch in losses/value_model)."""
    import optax

    from lapha_tpu.models import value_model
    from lapha_tpu.train import losses

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    optimizer = optax.adamw(1e-5)
    opt_state = optimizer.init((params, head))
    update = losses.make_update_fn(
        cfg, optimizer,
        loss_kwargs=dict(temperature=1.0, eps_low=0.2, eps_high=0.2,
                         loss_type="grpo", importance_level="token",
                         value_w=1.0, beta=0.0, max_completion_length=16,
                         remat=True))
    r = np.random.default_rng(0)
    samples = [dict(prompt_ids=r.integers(2, 512, 8).tolist(),
                    completion_ids=r.integers(2, 512, 6).tolist())
               for _ in range(4)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1,
                                 max_prompt_length=64, pad_multiple=16,
                                 batch_multiple=1)
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(r.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(r.uniform(size=Bb).astype(np.float32))
    before = np.asarray(params["moe_layers"]["attn"]["kv_b"]["w"])  # the
    # update donates params — snapshot to host first
    params2, head2, opt_state, metrics = update(params, head, opt_state,
                                                batch, None)
    assert np.isfinite(float(metrics["loss"]))
    # weights actually moved (grads flowed through the MLA projections)
    moved = float(np.max(np.abs(
        np.asarray(params2["moe_layers"]["attn"]["kv_b"]["w"]) - before)))
    assert moved > 0.0


def test_value_forward_on_deepseek(tiny_hf_v3_dir):
    from lapha_tpu.models import value_model

    params, cfg = loader.load_params(tiny_hf_v3_dir, dtype=jnp.float32)
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(2))
    ids = jnp.asarray(rng.integers(2, 512, size=(3, 12)))
    attn = jnp.ones_like(ids)
    y, v, h0 = value_model.value_forward(params, head, cfg, ids, attn)
    assert v.shape == (3,) and np.all(np.isfinite(np.asarray(v)))
    assert np.all((np.asarray(v) >= 0) & (np.asarray(v) <= 1))


def test_cache_is_latent_sized():
    """The decode cache is (L, B, S, 1, r + rope) MQA-shaped — per token
    per layer far smaller than per-head K/V; this IS the MLA serving win."""
    cfg = tiny_cfg()
    ck, cv = deepseek.init_kv_cache(cfg, 4, 32)
    assert ck.shape == (3, 4, 32, 1, 40)
    dense_equiv = 2 * cfg.num_attention_heads * (
        cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    assert ck.shape[-1] < dense_equiv  # strictly smaller per token-layer
    assert cfg.num_key_value_heads == 1 and cfg.head_dim_ == 40


def test_cached_prefill_pallas_matches_dense():
    """MLA cache-threaded prefill with attn_impl='pallas' rides the
    rectangular flash kernel with NATIVE narrow V (v_head_dim 16 under
    qk_head_dim 24 — no padding, round 5) — logits must match the dense
    cached path, fresh and suffix prefill both."""
    import dataclasses

    cfg_d = tiny_cfg(attn_impl="dense")
    cfg_p = dataclasses.replace(cfg_d, attn_impl="pallas")
    params = deepseek.init_params(cfg_d, jax.random.key(0))
    B, T, S = 2, 12, 32
    ids = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (B, T)))
    kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(True)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    caches, first = {}, {}
    for name, cfg in (("dense", cfg_d), ("pallas", cfg_p)):
        cache = deepseek.init_kv_cache(cfg, B, S)
        lg, _, cache = deepseek.forward(params, cfg, ids,
                                        positions=positions, kv_cache=cache,
                                        cache_pos=0, kv_valid=kv_valid)
        first[name], caches[name] = np.asarray(lg), cache
    np.testing.assert_allclose(first["pallas"], first["dense"],
                               rtol=2e-3, atol=2e-3)

    starts = jnp.asarray([12, 7], jnp.int32)  # per-row suffix offsets
    suf = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (B, 4)))
    kv_valid2 = ((jnp.arange(S)[None, :] < starts[:, None] + 4)
                 & (kv_valid | (jnp.arange(S)[None, :] >= starts[:, None])))
    pos2 = starts[:, None] + jnp.arange(4)[None, :]
    res = {}
    for name, cfg in (("dense", cfg_d), ("pallas", cfg_p)):
        lg, _, _ = deepseek.forward(params, cfg, suf, positions=pos2,
                                    kv_cache=caches[name], cache_pos=starts,
                                    kv_valid=kv_valid2)
        res[name] = np.asarray(lg)
    np.testing.assert_allclose(res["pallas"], res["dense"],
                               rtol=2e-3, atol=2e-3)

"""Qwen2-MoE family: HF parity, impl equivalence, expert parallelism.

Model-family widening beyond the reference (which serves only dense Qwen2.5,
/root/reference/trainer/mtpo_trainer.py:643-663): sparse-FFN checkpoints
(Qwen1.5-MoE-A2.7B layout) load, match HF logits, decode through the
engine, and shard expert-wise over the mesh ``model`` axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, loader, qwen2
from lapha_tpu.ops import moe
from lapha_tpu.parallel import shard_params

rng = np.random.default_rng(7)


def tiny_moe_cfg(**kw):
    base = dict(num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
                shared_expert_intermediate_size=48, norm_topk_prob=False,
                tie_word_embeddings=False, attention_bias=True)
    base.update(kw)
    return Qwen2Config.tiny(**base)


@pytest.fixture(scope="module")
def tiny_hf_moe_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    d = tmp_path_factory.mktemp("tiny_qwen2_moe")
    hf_cfg = Qwen2MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=48, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, torch_dtype="float32",
    )
    torch.manual_seed(1)
    model = Qwen2MoeForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def tiny_moe_model(tiny_hf_moe_dir):
    return loader.load_params(tiny_hf_moe_dir, dtype=jnp.float32)


def test_moe_config_from_hf(tiny_hf_moe_dir):
    cfg = loader.load_config(tiny_hf_moe_dir)
    assert cfg.num_experts == 8
    assert cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == 32
    assert cfg.shared_expert_intermediate_size == 48
    assert not cfg.norm_topk_prob
    assert cfg.attention_bias  # qwen2_moe qkv_bias default


def test_moe_logits_match_hf(tiny_hf_moe_dir, tiny_moe_model):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeForCausalLM

    params, cfg = tiny_moe_model
    ids = rng.integers(0, 512, size=(2, 13))
    hf = Qwen2MoeForCausalLM.from_pretrained(tiny_hf_moe_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_moe_impls_agree(tiny_moe_model):
    """gather (ragged_dot) == dense == dispatch-with-headroom on the same
    block inputs — they are the same function, differently scheduled."""
    params, cfg = tiny_moe_model
    p = jax.tree.map(lambda w: w[0], params["layers"])["moe"]
    x = jnp.asarray(rng.normal(size=(17, cfg.hidden_size)).astype(np.float32))
    kw = dict(top_k=cfg.num_experts_per_tok, norm_topk=cfg.norm_topk_prob)
    yg = moe.moe_ffn_gather(x, p, **kw)
    yd = moe.moe_ffn_dense(x, p, **kw)
    yp = moe.moe_ffn_dispatch(x, p, capacity_factor=8.0, **kw)
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yd), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), rtol=1e-5, atol=1e-5)


def test_moe_dispatch_drops_overflow(tiny_moe_model):
    """capacity_factor≈0 forces drops: output must differ from exact and
    stay finite (documented approximate mode, ops/moe.py)."""
    params, cfg = tiny_moe_model
    p = jax.tree.map(lambda w: w[0], params["layers"])["moe"]
    x = jnp.asarray(rng.normal(size=(32, cfg.hidden_size)).astype(np.float32))
    kw = dict(top_k=cfg.num_experts_per_tok, norm_topk=cfg.norm_topk_prob)
    tight = moe.moe_ffn_dispatch(x, p, capacity_factor=0.25, **kw)
    exact = moe.moe_ffn_dense(x, p, **kw)
    assert np.all(np.isfinite(np.asarray(tight)))
    assert not np.allclose(np.asarray(tight), np.asarray(exact), atol=1e-6)


def test_moe_norm_topk_prob():
    """norm_topk_prob=True renormalizes the k routing weights (Qwen2-57B)."""
    cfg = tiny_moe_cfg(norm_topk_prob=True)
    params = qwen2.init_params(cfg, jax.random.key(0))
    p = jax.tree.map(lambda w: w[0], params["layers"])["moe"]
    x = jnp.asarray(rng.normal(size=(9, cfg.hidden_size)).astype(np.float32))
    topw, _ = moe.route(x, p["router"]["w"], 2, True)
    np.testing.assert_allclose(np.asarray(topw.sum(-1)), 1.0, rtol=1e-5)
    y = moe.moe_ffn_gather(x, p, top_k=2, norm_topk=True)
    yd = moe.moe_ffn_dense(x, p, top_k=2, norm_topk=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), rtol=1e-5, atol=1e-5)


def test_moe_engine_greedy_matches_hf(tiny_hf_moe_dir, tiny_moe_model):
    """KV-cached greedy decode (engine decode_step with the MoE branch) ==
    HF step-by-step greedy."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = tiny_moe_model

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
    prompt = [5, 6, 7, 8, 9, 10]
    out = eng.generate([" ".join(map(str, prompt))],
                       SamplingParams(n=1, temperature=0.0, max_tokens=6))
    got = out[0].outputs[0].token_ids

    hf = Qwen2MoeForCausalLM.from_pretrained(tiny_hf_moe_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_moe_expert_parallel_sharded_matches(mesh8, tiny_moe_model):
    """Expert-parallel forward: experts split over the mesh ``model`` axis
    (PARAM_RULES layers/moe/experts) must reproduce unsharded logits for
    every impl that supports sharding."""
    params, cfg = tiny_moe_model
    ids = jnp.asarray(rng.integers(0, 512, size=(4, 12)))
    sharded = shard_params(params, mesh8)
    for impl in ("dense", "dispatch", "gather"):
        cfg_i = Qwen2Config(**{**cfg.__dict__, "moe_impl": impl})
        ref, _, _ = qwen2.forward(params, cfg_i, ids)  # same impl, unsharded
        with mesh8:
            got, _, _ = qwen2.forward(sharded, cfg_i, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=impl)


def test_moe_export_roundtrip(tiny_hf_moe_dir, tmp_path, tiny_moe_model):
    params, cfg = tiny_moe_model
    out = str(tmp_path / "moe_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_moe_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_moe_int8_quantized_forward(tiny_hf_moe_dir):
    """int8 loading quantizes expert + shared weights but keeps the router
    and sigmoid gate full precision; logits stay close to f32."""
    from lapha_tpu.models.quant import is_quantized

    params, cfg = loader.load_params(tiny_hf_moe_dir, dtype=jnp.float32)
    q, qcfg = loader.load_params(tiny_hf_moe_dir, dtype=jnp.float32, quantize="int8")
    moe_p = q["layers"]["moe"]
    assert is_quantized(moe_p["experts"]["gate_proj"]["w"])
    assert is_quantized(moe_p["shared"]["up_proj"]["w"])
    assert not is_quantized(moe_p["router"]["w"])
    assert not is_quantized(moe_p["shared"]["gate"]["w"])
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 10)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(q, qcfg, ids)
    # int8 weights: coarse agreement on tiny random logits
    err = np.max(np.abs(np.asarray(l1) - np.asarray(l2)))
    assert err < 0.15, err


def test_moe_mixed_dense_sparse_rejected(tiny_hf_moe_dir, tmp_path):
    import json
    import os
    import shutil

    d = str(tmp_path / "mixed")
    shutil.copytree(tiny_hf_moe_dir, d)
    with open(os.path.join(d, "config.json")) as f:
        c = json.load(f)
    c["mlp_only_layers"] = [0]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(c, f)
    with pytest.raises(ValueError, match="dense layers mixed"):
        loader.load_config(d)


def test_moe_grads_flow():
    """Training-path check: the GRPO loss differentiates through the
    gather (ragged_dot) MoE block — expert and router grads are nonzero."""
    cfg = tiny_moe_cfg()
    params = qwen2.init_params(cfg, jax.random.key(2))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 12)))

    def loss_fn(p):
        logits, _, _ = qwen2.forward(p, cfg, ids)
        lp = jax.nn.log_softmax(logits[:, :-1], -1)
        tgt = jax.nn.one_hot(ids[:, 1:], cfg.vocab_size)
        return -jnp.mean(jnp.sum(lp * tgt, -1))

    grads = jax.grad(loss_fn)(params)
    g_exp = grads["layers"]["moe"]["experts"]["gate_proj"]["w"]
    g_rt = grads["layers"]["moe"]["router"]["w"]
    assert float(jnp.max(jnp.abs(g_exp))) > 0
    assert float(jnp.max(jnp.abs(g_rt))) > 0
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))


def test_moe_sharded_update_step(mesh8):
    """A full GRPO+value update on a sparse-MoE model with expert-sharded
    params (EP over the mesh model axis) — loss must match the unsharded
    step and expert/router grads must flow through the dispatch impl (the
    TPU training path: moe_impl auto→dispatch there)."""
    import optax

    from lapha_tpu.models import value_model
    from lapha_tpu.train import losses

    cfg = tiny_moe_cfg(moe_impl="dispatch")
    params = qwen2.init_params(cfg, jax.random.key(4))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(5))
    opt = optax.adamw(1e-4)

    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, 9).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, 5).tolist())
               for _ in range(8)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1,
                                 max_prompt_length=32, pad_multiple=8,
                                 batch_multiple=4)
    batch = {k: jnp.asarray(v) for k, v in packed.items() if k != "kept"}
    Bb = packed["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng.uniform(size=Bb).astype(np.float32))

    kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
              importance_level="token", value_w=1.0, beta=0.0,
              max_completion_length=8, remat=True)
    update = losses.make_update_fn(cfg, opt, loss_kwargs=kw)

    p0 = jax.tree.map(jnp.array, params)
    h0 = jax.tree.map(jnp.array, head)
    st0 = opt.init((p0, h0))
    p_ref, h_ref, _, m_ref = update(p0, h0, st0, batch, None)

    sharded = shard_params(jax.tree.map(jnp.array, params), mesh8)
    h1 = jax.tree.map(jnp.array, head)
    st1 = opt.init((sharded, h1))
    with mesh8:
        p_sh, h_sh, _, m_sh = update(sharded, h1, st1, batch, None)

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-4, atol=1e-5)
    # expert weights actually moved (grads flowed through routing)
    delta = jnp.max(jnp.abs(p_ref["layers"]["moe"]["experts"]["gate_proj"]["w"]
                            - params["layers"]["moe"]["experts"]["gate_proj"]["w"]))
    assert float(delta) > 0


def test_moe_forward_seq_matches_dense():
    """Sparse-MoE layers under the ring-sharded (sequence-parallel) forward:
    forward_seq must reproduce the dense qwen2.forward logits (MoE routing
    is position-local, so context parallelism composes for free)."""
    from jax.sharding import Mesh

    from lapha_tpu.models import qwen2_seq

    cfg = tiny_moe_cfg()
    params = qwen2.init_params(cfg, jax.random.key(3))
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 32)))
    ref, _, _ = qwen2.forward(params, cfg, ids)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sequence",))
    with mesh:
        got = jax.jit(
            lambda p, i: qwen2_seq.forward_seq(p, cfg, i, mesh=mesh)[0]
        )(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------- qwen3_moe

@pytest.fixture(scope="module")
def tiny_hf_qwen3_moe_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    d = tmp_path_factory.mktemp("tiny_qwen3_moe")
    hf_cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=24, max_position_embeddings=256, rope_theta=1e6,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, torch_dtype="float32",
    )
    torch.manual_seed(2)
    model = Qwen3MoeForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_qwen3_moe_config_from_hf(tiny_hf_qwen3_moe_dir):
    cfg = loader.load_config(tiny_hf_qwen3_moe_dir)
    assert cfg.num_experts == 8
    assert cfg.qk_norm                        # per-head q/k RMS norm
    assert not cfg.attention_bias
    assert cfg.shared_expert_intermediate_size == 0  # no shared expert
    assert cfg.norm_topk_prob
    assert cfg.head_dim_ == 24


def test_qwen3_moe_logits_match_hf(tiny_hf_qwen3_moe_dir):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeForCausalLM

    params, cfg = loader.load_params(tiny_hf_qwen3_moe_dir, dtype=jnp.float32)
    assert "shared" not in params["layers"]["moe"]
    ids = rng.integers(0, 512, size=(2, 11))
    hf = Qwen3MoeForCausalLM.from_pretrained(tiny_hf_qwen3_moe_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_qwen3_moe_engine_greedy_matches_hf(tiny_hf_qwen3_moe_dir):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_qwen3_moe_dir, dtype=jnp.float32)

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
    hf = Qwen3MoeForCausalLM.from_pretrained(tiny_hf_qwen3_moe_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_qwen3_moe_export_roundtrip(tiny_hf_qwen3_moe_dir, tmp_path):
    params, cfg = loader.load_params(tiny_hf_qwen3_moe_dir, dtype=jnp.float32)
    out = str(tmp_path / "q3moe_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_qwen3_moe_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_qwen3_moe_int8_load(tiny_hf_qwen3_moe_dir):
    """int8 loading on the shared-expert-less layout: experts quantized,
    router full precision, no shared subtree, logits close to f32."""
    from lapha_tpu.models.quant import is_quantized

    params, cfg = loader.load_params(tiny_hf_qwen3_moe_dir, dtype=jnp.float32)
    q, qcfg = loader.load_params(tiny_hf_qwen3_moe_dir, dtype=jnp.float32,
                                 quantize="int8")
    moe_p = q["layers"]["moe"]
    assert is_quantized(moe_p["experts"]["down_proj"]["w"])
    assert not is_quantized(moe_p["router"]["w"])
    assert "shared" not in moe_p
    ids = jnp.asarray(rng.integers(0, 512, size=(2, 10)))
    l1, _, _ = qwen2.forward(params, cfg, ids)
    l2, _, _ = qwen2.forward(q, qcfg, ids)
    assert float(jnp.max(jnp.abs(l1 - l2))) < 0.15


# --------------------------------------------------------------- mixtral

@pytest.fixture(scope="module")
def tiny_hf_mixtral_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    d = tmp_path_factory.mktemp("tiny_mixtral")
    hf_cfg = MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=1e6,
        num_local_experts=4, num_experts_per_tok=2,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    torch.manual_seed(3)
    model = MixtralForCausalLM(hf_cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_mixtral_config_from_hf(tiny_hf_mixtral_dir):
    cfg = loader.load_config(tiny_hf_mixtral_dir)
    assert cfg.num_experts == 4
    assert cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == 96   # experts use intermediate_size
    assert cfg.shared_expert_intermediate_size == 0
    assert cfg.norm_topk_prob                # softmax -> topk -> renormalize
    assert cfg.moe_layout == "mixtral"
    assert not cfg.attention_bias
    assert cfg.sliding_window == 0           # null in the default config


def test_mixtral_sliding_window_parses():
    """Mixtral applies the window to EVERY layer when set (HF
    modeling_mixtral: create_sliding_window_causal_mask for all layers)."""
    cfg = Qwen2Config.from_hf({
        "model_type": "mixtral", "vocab_size": 128, "hidden_size": 32,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 2, "num_local_experts": 4,
        "num_experts_per_tok": 2, "sliding_window": 16,
    })
    assert cfg.sliding_window == 16 and cfg.layer_windows == ()


def test_mixtral_logits_match_hf(tiny_hf_mixtral_dir):
    torch = pytest.importorskip("torch")
    from transformers import MixtralForCausalLM

    params, cfg = loader.load_params(tiny_hf_mixtral_dir, dtype=jnp.float32)
    assert "shared" not in params["layers"]["moe"]
    ids = rng.integers(0, 512, size=(2, 11))
    hf = MixtralForCausalLM.from_pretrained(tiny_hf_mixtral_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    logits, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_mixtral_engine_greedy_matches_hf(tiny_hf_mixtral_dir):
    torch = pytest.importorskip("torch")
    from transformers import MixtralForCausalLM

    from lapha_tpu.engine import Engine, SamplingParams

    params, cfg = loader.load_params(tiny_hf_mixtral_dir, dtype=jnp.float32)

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
    hf = MixtralForCausalLM.from_pretrained(tiny_hf_mixtral_dir).eval()
    seq = torch.tensor([prompt])
    with torch.no_grad():
        for _ in range(6):
            nxt = hf(seq).logits[0, -1].argmax().item()
            seq = torch.cat([seq, torch.tensor([[nxt]])], 1)
    assert got == seq[0, len(prompt):].tolist()


def test_mixtral_export_roundtrip(tiny_hf_mixtral_dir, tmp_path):
    """Export writes the w1/w3/w2 block_sparse_moe names back, so the dir
    reloads both through this loader AND vanilla MixtralForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralForCausalLM

    params, cfg = loader.load_params(tiny_hf_mixtral_dir, dtype=jnp.float32)
    out = str(tmp_path / "mixtral_export")
    loader.export_hf(params, cfg, out, src_config_dir=tiny_hf_mixtral_dir)
    params2, cfg2 = loader.load_params(out, dtype=jnp.float32)
    ids = rng.integers(0, 512, size=(1, 9))
    l1, _, _ = qwen2.forward(params, cfg, jnp.asarray(ids))
    l2, _, _ = qwen2.forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    hf = MixtralForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(l1), ref, rtol=2e-3, atol=2e-3)


def test_moe_decode_step_seq_matches(tiny_moe_model):
    """Sequence-sharded one-token decode with MoE layers == single-shard
    decode_step (the engine's SP path on a sparse model)."""
    from jax.sharding import Mesh

    from lapha_tpu.models import qwen2_seq

    params, cfg = tiny_moe_model
    rng2 = np.random.default_rng(6)
    B, S = 4, 64
    L, nkv, dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim_
    ck = jnp.asarray(rng2.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    cv = jnp.asarray(rng2.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([9, 5, 12, 7], jnp.int32)
    dstart = jnp.full((B,), 16, jnp.int32)
    slot = jnp.asarray(17, jnp.int32)
    tok = jnp.asarray(rng2.integers(2, cfg.vocab_size, B), jnp.int32)
    pos = lens + 1
    ref = qwen2.decode_step(params, cfg, tok, pos, ck, cv, slot, lens, dstart)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sequence",))
    got = qwen2_seq.decode_step_seq(params, cfg, tok, pos, ck, cv, slot,
                                    lens, dstart, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)


def test_dispatch_drop_fraction_diagnostic():
    """Uniform routing at cf=2 -> zero drops (dispatch exact); adversarial
    skew (every token's top choice = one expert) -> measurable drops that a
    larger capacity_factor eliminates (round-2 advisor finding: the
    lossiness must be observable, not silent)."""
    import numpy as np

    from lapha_tpu.ops.moe import (dispatch_drop_fraction, moe_ffn_dispatch,
                                   moe_ffn_gather)

    rng = np.random.default_rng(11)
    N, H, E, I, k = 64, 16, 8, 32, 2
    p = {
        "router": {"w": jnp.asarray(rng.normal(size=(H, E)), jnp.float32) * 0.05},
        "experts": {
            "gate_proj": {"w": jnp.asarray(rng.normal(size=(E, H, I)), jnp.float32) * 0.1},
            "up_proj": {"w": jnp.asarray(rng.normal(size=(E, H, I)), jnp.float32) * 0.1},
            "down_proj": {"w": jnp.asarray(rng.normal(size=(E, I, H)), jnp.float32) * 0.1},
        },
    }
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    frac = float(dispatch_drop_fraction(x, p, top_k=k, norm_topk=False))
    assert frac == 0.0  # near-uniform router at cf=2: exact
    np.testing.assert_allclose(
        np.asarray(moe_ffn_dispatch(x, p, top_k=k, norm_topk=False)),
        np.asarray(moe_ffn_gather(x, p, top_k=k, norm_topk=False)),
        rtol=2e-5, atol=2e-5)

    # skew: positive activations + a large all-ones router column make
    # expert 0 every token's top choice (the router is linear in x, so a
    # column offset alone flips sign with sum(x))
    x_pos = jnp.abs(x) + 0.1
    p_skew = dict(p, router={"w": p["router"]["w"].at[:, 0].set(5.0)})
    frac_skew = float(dispatch_drop_fraction(x_pos, p_skew, top_k=k,
                                             norm_topk=False))
    assert frac_skew > 0.2, frac_skew  # expert0 gets 64 > C=ceil(2*64/8*2)=32
    frac_wide = float(dispatch_drop_fraction(
        x_pos, p_skew, top_k=k, norm_topk=False, capacity_factor=float(E)))
    assert frac_wide == 0.0
    # and at the widened capacity, dispatch output is exact again
    np.testing.assert_allclose(
        np.asarray(moe_ffn_dispatch(x_pos, p_skew, top_k=k, norm_topk=False,
                                    capacity_factor=float(E))),
        np.asarray(moe_ffn_gather(x_pos, p_skew, top_k=k, norm_topk=False)),
        rtol=2e-5, atol=2e-5)


def test_moe_capacity_factor_config_threads_through():
    """Qwen2Config.moe_capacity_factor reaches the dispatch impl: a skewed
    tiny model's forward differs between cf=0.25 (drops) and cf=8 (exact),
    and cf=8 matches the exact gather impl."""
    import numpy as np

    cfg_lossy = Qwen2Config.tiny(
        vocab_size=128, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=16, shared_expert_intermediate_size=16,
        tie_word_embeddings=False, moe_impl="dispatch",
        moe_capacity_factor=0.25)
    cfg_exact = dataclasses.replace(cfg_lossy, moe_capacity_factor=8.0)
    cfg_gather = dataclasses.replace(cfg_lossy, moe_impl="gather")
    params = qwen2.init_params(cfg_lossy, jax.random.key(3))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 24)))
    lo_lossy, _, _ = qwen2.forward(params, cfg_lossy, ids)
    lo_exact, _, _ = qwen2.forward(params, cfg_exact, ids)
    lo_gather, _, _ = qwen2.forward(params, cfg_gather, ids)
    np.testing.assert_allclose(np.asarray(lo_exact), np.asarray(lo_gather),
                               rtol=2e-4, atol=2e-4)
    assert not np.allclose(np.asarray(lo_lossy), np.asarray(lo_gather),
                           rtol=2e-4, atol=2e-4)

"""Pallas flash attention vs dense reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import Qwen2Config, qwen2
from lapha_tpu.ops.flash_attention import flash_attention

rng = np.random.default_rng(5)


def dense_ref(q, k, v, mask, causal=True):
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    causal_m = jnp.tril(jnp.ones((T, T), bool))[None]
    m = causal_m & (mask[:, None, :] > 0) if causal else (mask[:, None, :] > 0)
    return qwen2._attend(q, k, v, m, cfg)


@pytest.mark.parametrize("T,nh,nkv,dh", [(64, 4, 2, 32), (128, 4, 4, 64), (96, 8, 2, 64)])
def test_flash_matches_dense(T, nh, nkv, dh):
    B = 2
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 7 :] = 0  # padded tail on row 0
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, mask, causal=True, block_q=32, block_k=32,
                          interpret=True)
    ref = dense_ref(q, k, v, mask)
    # padded-query rows are undefined in both; compare valid rows only
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-4)


def test_flash_non_multiple_length_padding():
    B, T, nh, nkv, dh = 1, 50, 2, 1, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    out = flash_attention(q, k, v, mask, causal=True, block_q=32, block_k=32,
                          interpret=True)
    ref = dense_ref(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_bf16_inputs():
    B, T, nh, nkv, dh = 2, 64, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    out = flash_attention(q, k, v, mask, block_q=32, block_k=32, interpret=True)
    ref = dense_ref(q, k, v, mask)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_model_forward_pallas_matches_dense():
    """Full model: attn_impl=pallas (interpret) vs dense logits."""
    cfg_d = Qwen2Config.tiny(attn_impl="dense")
    cfg_p = Qwen2Config.tiny(attn_impl="pallas")
    params = qwen2.init_params(cfg_d, jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (2, 40)))
    mask = np.ones((2, 40), np.int32)
    mask[1, :5] = 0  # left padding
    mask = jnp.asarray(mask)
    ld, _, _ = qwen2.forward(params, cfg_d, ids, attention_mask=mask)
    lp, _, _ = qwen2.forward(params, cfg_p, ids, attention_mask=mask)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(lp)[valid], np.asarray(ld)[valid],
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("T,nh,nkv,dh", [(64, 4, 2, 32), (96, 8, 2, 64), (128, 4, 4, 32)])
def test_flash_backward_matches_dense(T, nh, nkv, dh):
    """dq/dk/dv from the Pallas backward kernels == dense-attention grads."""
    B = 2
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 9:] = 0
    mask = jnp.asarray(mask)
    g_out = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    # upstream grads at padded query rows are zero in training (token masks)
    g_out = g_out * mask[:, :, None, None].astype(jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal=True, block_q=32, block_k=32,
                            interpret=True)
        return jnp.sum(o * g_out)

    causal_m = jnp.tril(jnp.ones((T, T), bool))[None]
    m3 = causal_m & (mask[:, None, :] > 0)
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)

    def loss_dense(q, k, v):
        return jnp.sum(qwen2._attend(q, k, v, m3, cfg) * g_out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    valid = np.asarray(mask) > 0
    for name, a, b in zip("qkv", gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":  # padded-query dq rows are undefined in both
            a, b = a[valid], b[valid]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_flash_backward_bf16():
    B, T, nh, nkv, dh = 2, 64, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, block_q=32, block_k=32,
                                       interpret=True).astype(jnp.float32) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert gq.dtype == jnp.bfloat16 and gk.dtype == jnp.bfloat16
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    m3 = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)

    def loss_d(q, k, v):
        return jnp.sum(qwen2._attend(q, k, v, m3, cfg).astype(jnp.float32) ** 2)

    gqd, gkd, gvd = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
    for a, b in ((gq, gqd), (gk, gkd), (gv, gvd)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-1, atol=1e-1)


def test_training_loss_differentiates_through_flash():
    """loss_and_metrics with attn_impl='pallas' flows grads through the
    flash kernel end-to-end (the reference trains with flash_attention_2)."""
    from lapha_tpu.models import value_model
    from lapha_tpu.train import losses

    cfg = Qwen2Config.tiny(attn_impl="pallas")
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, 6).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, 5).tolist())
               for _ in range(2)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=32,
                                 pad_multiple=16, batch_multiple=2)
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    batch["advantages"] = jnp.asarray(np.asarray([1.0, -1.0], np.float32))
    batch["v_target"] = jnp.asarray(np.asarray([1.0, 0.0], np.float32))
    kw = dict(temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
              importance_level="token", value_w=1.0, beta=0.0,
              max_completion_length=8, remat=False)
    (loss, _), grads = jax.value_and_grad(
        lambda ph: losses.loss_and_metrics(ph[0], ph[1], batch, cfg, **kw),
        has_aux=True)((params, head))
    assert np.isfinite(float(loss))
    assert sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)) > 0


# ------------------------------------------------------- sliding window

def _banded_dense_ref(q, k, v, mask, window, nh, nkv):
    """Dense reference with the causal mask banded to the last `window`."""
    T = q.shape[1]
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    band = (jnp.tril(jnp.ones((T, T), bool))
            & jnp.triu(jnp.ones((T, T), bool), -(window - 1)))[None]
    m3 = band & (mask[:, None, :] > 0)
    return qwen2._attend(q, k, v, m3, cfg), m3, cfg


@pytest.mark.parametrize("T,W", [(96, 16), (96, 40), (64, 8)])
def test_flash_window_matches_dense(T, W):
    """window=W bands the causal mask (Mistral sliding-window attention)."""
    B, nh, nkv, dh = 2, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 7:] = 0
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, mask, causal=True, window=W,
                          block_q=32, block_k=32, interpret=True)
    ref, _, _ = _banded_dense_ref(q, k, v, mask, W, nh, nkv)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-4)


def test_flash_window_backward_matches_dense():
    """dq/dk/dv under the banded mask == dense banded-attention grads."""
    B, T, nh, nkv, dh, W = 2, 96, 4, 2, 32, 16
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 9:] = 0
    mask = jnp.asarray(mask)
    g_out = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    g_out = g_out * mask[:, :, None, None].astype(jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal=True, window=W,
                            block_q=32, block_k=32, interpret=True)
        return jnp.sum(o * g_out)

    _, m3, cfg = _banded_dense_ref(q, k, v, mask, W, nh, nkv)

    def loss_dense(q, k, v):
        return jnp.sum(qwen2._attend(q, k, v, m3, cfg) * g_out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    valid = np.asarray(mask) > 0
    for name, a, b in zip("qkv", gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":
            a, b = a[valid], b[valid]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


# --------------------------------------------- gemma knobs (scale + softcap)

def test_flash_softcap_and_scale_match_dense():
    """Forward with query_pre_attn_scalar scale + gemma2 softcap == the
    dense path evaluated through the same cfg knobs."""
    B, T, nh, nkv, dh = 2, 96, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[1, T - 11:] = 0
    mask = jnp.asarray(mask)
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv,
                           query_pre_attn_scalar=24.0, attn_softcap=50.0)
    causal_m = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)
    dense = qwen2._attend(q, k, v, causal_m, cfg)
    flash = flash_attention(q, k, v, mask, causal=True, block_q=32,
                            block_k=32, interpret=True,
                            scale=cfg.attn_scale_, softcap=50.0)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(flash)[valid],
                               np.asarray(dense)[valid],
                               rtol=2e-4, atol=2e-4)


def test_flash_softcap_backward_matches_dense():
    """dq/dk/dv through the tanh softcap == dense autodiff (the chain
    rule lives in BOTH backward kernels)."""
    B, T, nh, nkv, dh = 2, 64, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 5:] = 0
    mask = jnp.asarray(mask)
    g_out = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    g_out = g_out * mask[:, :, None, None].astype(jnp.float32)
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv,
                           query_pre_attn_scalar=20.0, attn_softcap=30.0)
    causal_m = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal=True, block_q=32,
                            block_k=32, interpret=True,
                            scale=cfg.attn_scale_, softcap=30.0)
        return jnp.sum(o * g_out)

    def loss_dense(q, k, v):
        return jnp.sum(qwen2._attend(q, k, v, causal_m, cfg) * g_out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    valid = np.asarray(mask) > 0
    for name, a, b in zip("qkv", gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":
            a, b = a[valid], b[valid]
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name}")


# ------------------------------------- gpt_oss learned attention sinks

def test_flash_sink_matches_dense():
    """sinks=(nh,) folds exactly around the sink-free kernel: flash with
    the lse-logaddexp renormalization == the dense _sink_softmax path,
    including the fully-padded tail rows (all mass on the sink -> 0)."""
    B, T, nh, nkv, dh = 2, 96, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    sinks = jnp.asarray((rng.normal(size=(nh,)) * 2.0).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 7:] = 0
    mask = jnp.asarray(mask)
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    causal_m = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)
    dense = qwen2._attend(q, k, v, causal_m, cfg, sinks=sinks)
    flash = flash_attention(q, k, v, mask, causal=True, block_q=32,
                            block_k=32, interpret=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_flash_sink_window_matches_dense():
    """sinks compose with the banded (sliding-window) kernel — the
    gpt_oss alternating-window layer shape."""
    B, T, nh, nkv, dh, W = 2, 96, 4, 2, 32, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    sinks = jnp.asarray((rng.normal(size=(nh,)) * 2.0).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    _, m3, cfg = _banded_dense_ref(q, k, v, mask, W, nh, nkv)
    dense = qwen2._attend(q, k, v, m3, cfg, sinks=sinks)
    flash = flash_attention(q, k, v, mask, causal=True, window=W,
                            block_q=32, block_k=32, interpret=True,
                            sinks=sinks)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_flash_sink_backward_matches_dense():
    """dq/dk/dv AND dsinks through the sink fold == dense autodiff.
    (The sink-free backward kernels are reused with (out_t, lse_t);
    dsink = -sum p_sink * D outside pallas.)"""
    B, T, nh, nkv, dh = 2, 64, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    sinks = jnp.asarray((rng.normal(size=(nh,)) * 2.0).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 9:] = 0
    mask = jnp.asarray(mask)
    g_out = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    g_out = g_out * mask[:, :, None, None].astype(jnp.float32)
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    causal_m = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)

    def loss_flash(q, k, v, s):
        o = flash_attention(q, k, v, mask, causal=True, block_q=32,
                            block_k=32, interpret=True, sinks=s)
        return jnp.sum(o * g_out)

    def loss_dense(q, k, v, s):
        return jnp.sum(qwen2._attend(q, k, v, causal_m, cfg, sinks=s) * g_out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    valid = np.asarray(mask) > 0
    for name, a, b in zip(("q", "k", "v", "sinks"), gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":
            a, b = a[valid], b[valid]
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name}")


# ----------------------- rectangular cached-prefill flash (engine path)

def _cached_dense_ref(q, k, v, kv_valid, qstart, nh, nkv, window=0,
                      sinks=None):
    """Dense reference with the exact cached-branch mask semantics
    (models/qwen2.py forward: valid & kpos <= qpos [& band])."""
    B, T = q.shape[0], q.shape[1]
    S = k.shape[1]
    cfg = Qwen2Config.tiny(num_attention_heads=nh, num_key_value_heads=nkv)
    qs = jnp.broadcast_to(jnp.asarray(qstart, jnp.int32).reshape(-1), (B,))
    qpos = qs[:, None, None] + jnp.arange(T)[None, :, None]
    kpos = jnp.arange(S)[None, None, :]
    m = (kv_valid[:, None, :] > 0) & (kpos <= qpos)
    if window:
        m = m & (kpos > qpos - window)
    return qwen2._attend(q, k, v, m, cfg, sinks=sinks)


@pytest.mark.parametrize("T,S,qstart", [(24, 96, 40), (32, 64, 0),
                                        (17, 96, (30, 5))])
def test_flash_cached_matches_dense(T, S, qstart):
    """Rectangular (T x S) cached-prefill flash == dense with the cached
    mask, for scalar and per-row qstart, S != T, non-multiple T."""
    from lapha_tpu.ops.flash_attention import flash_attention_cached

    B, nh, nkv, dh = 2, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    qs = jnp.asarray(qstart, jnp.int32)
    # cache validity: prefix [0, qstart) + the T new tokens
    kv_valid = jnp.broadcast_to(
        (jnp.arange(S)[None, :]
         < (qs.reshape(-1, 1) if qs.ndim else qs) + T), (B, S)).astype(jnp.int32)
    out = flash_attention_cached(q, k, v, kv_valid, qs, block_q=32,
                                 block_k=32, interpret=True)
    ref = _cached_dense_ref(q, k, v, kv_valid, qs, nh, nkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_cached_window_and_sinks():
    """Banded + sink-folded cached prefill (gpt_oss suffix prefill)."""
    from lapha_tpu.ops.flash_attention import flash_attention_cached

    B, T, S, nh, nkv, dh, W = 2, 24, 96, 4, 2, 32, 16
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    sinks = jnp.asarray((rng.normal(size=(nh,)) * 2.0).astype(np.float32))
    qs = jnp.asarray((40, 10), jnp.int32)
    kv_valid = (jnp.arange(S)[None, :] < qs[:, None] + T).astype(jnp.int32)
    out = flash_attention_cached(q, k, v, kv_valid, qs, window=W,
                                 block_q=32, block_k=32, interpret=True,
                                 sinks=sinks)
    ref = _cached_dense_ref(q, k, v, kv_valid, qs, nh, nkv, window=W,
                            sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_cached_gap_validity():
    """kv_valid with a HOLE (compacted/ragged caches): invalid mid-cache
    columns are excluded even when causally visible."""
    from lapha_tpu.ops.flash_attention import flash_attention_cached

    B, T, S, nh, nkv, dh = 1, 8, 64, 2, 1, 32
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, nkv, dh)).astype(np.float32))
    kv_valid = np.zeros((B, S), np.int32)
    kv_valid[0, :20] = 1          # prompt
    kv_valid[0, 40:48] = 1        # suffix written at 40 (gap 20..39)
    kv_valid = jnp.asarray(kv_valid)
    out = flash_attention_cached(q, k, v, kv_valid, jnp.int32(40),
                                 block_q=32, block_k=32, interpret=True)
    ref = _cached_dense_ref(q, k, v, kv_valid, 40, nh, nkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cached_prefill_pallas_matches_dense():
    """Full-model CACHE-THREADED prefill with attn_impl='pallas' rides
    flash_attention_cached and must match the dense cached path — both
    fresh prefill (cache_pos=0, kv_valid right-padded) and per-row
    suffix prefill (cache_pos (B,), prefix already in cache)."""
    import dataclasses

    cfg_d = Qwen2Config.tiny(attn_impl="dense")
    cfg_p = dataclasses.replace(cfg_d, attn_impl="pallas")
    params = qwen2.init_params(cfg_d, jax.random.key(0))
    B, T, S = 2, 12, 32
    ids = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (B, T)))
    mask = np.ones((B, T), np.int32)
    mask[1, -3:] = 0  # right padding (engine prefill layout)
    mask = jnp.asarray(mask)
    kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(mask > 0)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)

    outs = {}
    for name, cfg in (("dense", cfg_d), ("pallas", cfg_p)):
        cache = qwen2.init_kv_cache(cfg, B, S)
        lg, _, cache = qwen2.forward(params, cfg, ids, positions=positions,
                                     kv_cache=cache, cache_pos=0,
                                     kv_valid=kv_valid)
        outs[name] = (np.asarray(lg), cache)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(outs["pallas"][0][valid],
                               outs["dense"][0][valid], rtol=2e-3, atol=2e-3)

    # suffix prefill: 4 new tokens per row at per-row starts
    starts = jnp.asarray([9, 6], jnp.int32)
    suf = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (B, 4)))
    kv_valid2 = (jnp.arange(S)[None, :] < (starts[:, None] + 4))
    kv_valid2 = kv_valid2 & (kv_valid | (jnp.arange(S)[None, :] >= starts[:, None]))
    pos2 = starts[:, None] + jnp.arange(4)[None, :]
    res = {}
    for name, cfg in (("dense", cfg_d), ("pallas", cfg_p)):
        lg, _, _ = qwen2.forward(params, cfg, suf, positions=pos2,
                                 kv_cache=outs[name][1], cache_pos=starts,
                                 kv_valid=kv_valid2)
        res[name] = np.asarray(lg)
    np.testing.assert_allclose(res["pallas"], res["dense"],
                               rtol=2e-3, atol=2e-3)


def test_cached_prefill_pallas_windowed_sinks():
    """Cached prefill through the {0,W} lax.cond dispatch with sinks
    (gpt_oss suffix-prefill shape): pallas == dense."""
    import dataclasses

    cfg_d = Qwen2Config.tiny(attn_impl="dense", attn_sinks=True,
                             layer_windows=(8, 0))
    cfg_p = dataclasses.replace(cfg_d, attn_impl="pallas")
    params = qwen2.init_params(cfg_d, jax.random.key(1))
    L, nh = cfg_d.num_hidden_layers, cfg_d.num_attention_heads
    params["layers"]["attn"]["sinks"] = (
        jax.random.normal(jax.random.key(3), (L, nh)) * 2.0)
    B, T, S = 2, 20, 48
    ids = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (B, T)))
    kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(True)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    res = {}
    for name, cfg in (("dense", cfg_d), ("pallas", cfg_p)):
        cache = qwen2.init_kv_cache(cfg, B, S)
        lg, _, _ = qwen2.forward(params, cfg, ids, positions=positions,
                                 kv_cache=cache, cache_pos=0,
                                 kv_valid=kv_valid)
        res[name] = np.asarray(lg)
    np.testing.assert_allclose(res["pallas"], res["dense"],
                               rtol=2e-3, atol=2e-3)


# ------------------------------------------------- mixed V width (MLA, r5)
def _dense_mixed(q, k, v, mask, scale):
    """Plain softmax attention with independent V width (f32)."""
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    k = jnp.repeat(k, nh // nkv, axis=2)
    v = jnp.repeat(v, nh // nkv, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    m = jnp.tril(jnp.ones((T, T), bool))[None, None] & (mask[:, None, None, :] > 0)
    s = jnp.where(m, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("dh,dv", [(48, 32), (64, 32)])
def test_flash_narrow_v_matches_dense(dh, dv):
    """V narrower than Q/K (MLA: 192-wide scores, 128-wide combine) —
    the kernel must not require padding V up to the Q/K width."""
    B, T, nh, nkv = 2, 64, 4, 2
    scale = 0.17
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dv)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 5:] = 0
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, mask, causal=True, block_q=32,
                          block_k=32, interpret=True, scale=scale)
    assert out.shape == (B, T, nh, dv)
    ref = _dense_mixed(q, k, v, mask, scale)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-4)
    # and the padded-V route must agree with the native narrow-V route
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dh - dv)))
    out_pad = flash_attention(q, k, vp, mask, causal=True, block_q=32,
                              block_k=32, interpret=True, scale=scale)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(out_pad)[valid][..., :dv],
                               rtol=1e-5, atol=1e-5)


def test_flash_narrow_v_backward_matches_dense():
    B, T, nh, nkv, dh, dv = 2, 64, 4, 2, 48, 32
    scale = 1.0 / np.sqrt(dh)
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dv)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 9:] = 0
    mask = jnp.asarray(mask)
    g_out = jnp.asarray(rng.normal(size=(B, T, nh, dv)).astype(np.float32))
    g_out = g_out * mask[:, :, None, None].astype(jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, causal=True, block_q=32,
                            block_k=32, interpret=True, scale=scale)
        return jnp.sum(o * g_out)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_mixed(q, k, v, mask, scale) * g_out)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    valid = np.asarray(mask) > 0
    for name, a, b in zip("qkv", gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name == "q":
            a, b = a[valid], b[valid]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")

"""Ragged decode-attention kernel vs dense reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.ops.ragged_decode_attention import ragged_decode_attention


def dense_ref(q, k, v, lens, dstart, slot):
    """k/v: (B, nkv, S, dh) single-layer panels."""
    B, nh, dh = q.shape
    nkv, S = k.shape[1], k.shape[2]
    ar = np.arange(S)[None, :]
    valid = (ar < lens[:, None]) | ((ar >= dstart[:, None]) & (ar <= slot))
    qg = np.asarray(q, np.float32).reshape(B, nkv, nh // nkv, dh)
    s = np.einsum("bkgd,bksd->bkgs", qg, np.asarray(k, np.float32)) / np.sqrt(dh)
    s = np.where(valid[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bkgs,bksd->bkgd", p, np.asarray(v, np.float32)).reshape(B, nh, dh)


@pytest.mark.parametrize("nh,nkv,dh,bk", [(12, 2, 64, 64), (8, 8, 32, 32), (28, 4, 64, 64)])
def test_ragged_matches_dense(nh, nkv, dh, bk):
    rng = np.random.default_rng(1)
    B, S, L = 4, 256, 3
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([37, 120, 64, 5], jnp.int32)
    dstart = jnp.asarray([128, 128, 160, 128], jnp.int32)  # per-row admission
    slot = jnp.asarray(173, jnp.int32)
    for layer in (0, 2):
        out = ragged_decode_attention(q, k, v, layer, lens, dstart, slot,
                                      block_k=bk, interpret=True)
        ref = dense_ref(q, np.asarray(k)[layer], np.asarray(v)[layer],
                        np.asarray(lens), np.asarray(dstart), 173)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_ragged_first_decode_column():
    """slot == dstart (first decode step): exactly one decode slot valid."""
    rng = np.random.default_rng(2)
    B, S, nh, nkv, dh = 2, 128, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([10, 33], jnp.int32)
    dstart = jnp.full((B,), 64, jnp.int32)
    slot = jnp.asarray(64, jnp.int32)
    out = ragged_decode_attention(q, k, v, 0, lens, dstart, slot, block_k=32,
                                  interpret=True)
    ref = dense_ref(q, np.asarray(k)[0], np.asarray(v)[0],
                    np.asarray(lens), np.asarray(dstart), 64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_ragged_int8_cache_matches_dense():
    """int8 caches + per-vector scales through the kernel == dense attention
    over the dequantized values (the scale folding is exact)."""
    rng = np.random.default_rng(3)
    B, S, L, nh, nkv, dh = 4, 256, 2, 12, 2, 64
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    kf = rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)
    vf = rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)

    def q8(a):
        s = np.maximum(np.abs(a).max(-1) / 127.0, 1e-12)
        return np.clip(np.round(a / s[..., None]), -127, 127).astype(np.int8), s

    kq, ks = q8(kf)
    vq, vs = q8(vf)
    lens = jnp.asarray([37, 120, 64, 5], jnp.int32)
    dstart = jnp.asarray([128, 128, 160, 128], jnp.int32)
    slot = jnp.asarray(173, jnp.int32)
    for layer in (0, 1):
        out = ragged_decode_attention(
            q, jnp.asarray(kq), jnp.asarray(vq), layer, lens, dstart, slot,
            cache_scale=(jnp.asarray(ks.astype(np.float32)),
                         jnp.asarray(vs.astype(np.float32))),
            block_k=64, interpret=True)
        # dense over the DEQUANTIZED cache — bitwise-equal math
        kd = kq[layer].astype(np.float32) * ks[layer][..., None]
        vd = vq[layer].astype(np.float32) * vs[layer][..., None]
        ref = dense_ref(q, kd, vd, np.asarray(lens), np.asarray(dstart), 173)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_unaligned_dstart_shared_chunk_not_double_counted():
    """When dstart is not chunk-aligned (scheduler rows after KV
    compaction), the prompt's last chunk and the decode range's first chunk
    can be the SAME chunk — it is DMA'd twice, and a union validity mask
    would count its positions twice in the softmax (regression: per-segment
    masks in _kernel_impl)."""
    rng = np.random.default_rng(13)
    L, B, nkv, S, dh, nh = 2, 2, 2, 128, 64, 4
    kc = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    # bk=32: prompt [0, 40) spans chunks 0-1; decode [44, 60] starts inside
    # chunk 1 -> chunk 1 serves both segments
    lens = jnp.asarray([40, 40], jnp.int32)
    dstart = jnp.asarray([44, 44], jnp.int32)
    slot = jnp.asarray(60, jnp.int32)
    out = ragged_decode_attention(q, kc, vc, 1, lens, dstart, slot,
                                  block_k=32, interpret=True)

    qg = q.reshape(B, nkv, nh // nkv, dh)
    att = jnp.einsum("bkgd,bksd->bkgs", qg, kc[1]) / np.sqrt(dh)
    ar = jnp.arange(S)[None, :]
    valid = (ar < lens[:, None]) | ((ar >= dstart[:, None]) & (ar <= slot))
    att = jnp.where(valid[:, None, None, :], att, -1e30)
    p = jax.nn.softmax(att, -1)
    ref = jnp.einsum("bkgs,bksd->bkgd", p, vc[1]).reshape(B, nh, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stub_rows_chunk_aligned_dstart():
    """B not a multiple of block_rows pads stub rows in; their dstart is
    aligned to slot's chunk (exactly 2 dead chunks each — regression: a
    dstart of 0 walked every chunk up to slot) and real-row outputs are
    unaffected."""
    rng = np.random.default_rng(7)
    B, S, nh, nkv, dh = 5, 256, 8, 2, 32
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([37, 120, 64, 5, 99], jnp.int32)
    dstart = jnp.asarray([128, 131, 160, 128, 129], jnp.int32)
    for slot in (130, 148, 255):
        out = ragged_decode_attention(
            q, k, v, 0, lens, dstart, jnp.asarray(slot, jnp.int32),
            block_k=32, block_rows=4, interpret=True)
        ref = dense_ref(q, np.asarray(k)[0], np.asarray(v)[0],
                        np.asarray(lens), np.asarray(dstart), slot)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def dense_ref_banded(q, k, v, pstart, lens, dstart, slot):
    """dense_ref with the banded prompt range [pstart, lens)."""
    B, nh, dh = q.shape
    nkv, S = k.shape[1], k.shape[2]
    ar = np.arange(S)[None, :]
    valid = ((ar >= pstart[:, None]) & (ar < lens[:, None])) | (
        (ar >= dstart[:, None]) & (ar <= slot))
    qg = np.asarray(q, np.float32).reshape(B, nkv, nh // nkv, dh)
    s = np.einsum("bkgd,bksd->bkgs", qg, np.asarray(k, np.float32)) / np.sqrt(dh)
    s = np.where(valid[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bkgs,bksd->bkgd", p, np.asarray(v, np.float32)).reshape(B, nh, dh)


def test_banded_pstart_matches_dense():
    """Sliding-window banding: pstart clips the prompt range (including a
    row whose window slid past the WHOLE prompt — zero prompt chunks) and
    a clipped dstart narrows the decode range."""
    rng = np.random.default_rng(21)
    B, S, nh, nkv, dh = 4, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([37, 120, 64, 5], jnp.int32)
    # row 0: mid-prompt unaligned pstart; row 1: chunk-2 pstart; row 2:
    # pstart == lens (EMPTY prompt range); row 3: pstart 0 (no banding)
    pstart = jnp.asarray([11, 70, 64, 0], jnp.int32)
    # decode range [d0, slot] with window-clipped starts (>= lens rows ok)
    dstart = jnp.asarray([160, 140, 130, 128], jnp.int32)
    slot = jnp.asarray(173, jnp.int32)
    for bk in (32, 64):
        out = ragged_decode_attention(q, k, v, 0, lens, dstart, slot,
                                      pstart=pstart, block_k=bk,
                                      interpret=True)
        ref = dense_ref_banded(q, np.asarray(k)[0], np.asarray(v)[0],
                               np.asarray(pstart), np.asarray(lens),
                               np.asarray(dstart), 173)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_banded_int8_and_stub_rows():
    """Banding composes with int8 cache_scale mode and with stub-row
    padding (B % block_rows != 0)."""
    rng = np.random.default_rng(22)
    B, S, nh, nkv, dh = 3, 128, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    kf = rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32)
    vf = rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32)

    def q8(a):
        s = np.maximum(np.abs(a).max(-1) / 127.0, 1e-12)
        return np.clip(np.round(a / s[..., None]), -127, 127).astype(np.int8), s

    kq, ks = q8(kf)
    vq, vs = q8(vf)
    lens = jnp.asarray([30, 40, 12], jnp.int32)
    pstart = jnp.asarray([25, 40, 0], jnp.int32)
    dstart = jnp.asarray([70, 68, 64], jnp.int32)
    slot = jnp.asarray(75, jnp.int32)
    out = ragged_decode_attention(
        q, jnp.asarray(kq), jnp.asarray(vq), 0, lens, dstart, slot,
        cache_scale=(jnp.asarray(ks.astype(np.float32)),
                     jnp.asarray(vs.astype(np.float32))),
        pstart=pstart, block_k=32, block_rows=2, interpret=True)
    kd = kq[0].astype(np.float32) * ks[0][..., None]
    vd = vq[0].astype(np.float32) * vs[0][..., None]
    ref = dense_ref_banded(q, kd, vd, np.asarray(pstart), np.asarray(lens),
                           np.asarray(dstart), 75)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_scale_override():
    """gemma's query_pre_attn_scalar: an explicit logit scale replaces
    1/sqrt(dh)."""
    rng = np.random.default_rng(23)
    B, S, nh, nkv, dh = 2, 64, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([10, 20], jnp.int32)
    dstart = jnp.asarray([32, 32], jnp.int32)
    slot = jnp.asarray(40, jnp.int32)
    myscale = 0.0625
    out = ragged_decode_attention(q, k, v, 0, lens, dstart, slot,
                                  block_k=32, interpret=True, scale=myscale)
    # dense ref with the same scale
    ar = np.arange(S)[None, :]
    valid = (ar < np.asarray(lens)[:, None]) | ((ar >= 32) & (ar <= 40))
    qg = np.asarray(q).reshape(B, nkv, nh // nkv, dh)
    s = np.einsum("bkgd,bksd->bkgs", qg, np.asarray(k)[0]) * myscale
    s = np.where(valid[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bkgs,bksd->bkgd", p, np.asarray(v)[0]).reshape(B, nh, dh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_decode_step_windowed_ragged_matches_dense(monkeypatch):
    """decode_step wiring: a heterogeneous windowed stack (gemma3-style
    {0, W} layers) produces the same logits through the BANDED ragged path
    as through the dense win_valid path (the kernel runs in interpret mode
    with the backend patched to TPU so use_ragged engages on CPU)."""
    import functools

    import lapha_tpu.ops.ragged_decode_attention as rda
    from lapha_tpu.models import qwen2

    cfg = qwen2.Qwen2Config.tiny(
        head_dim=128, num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=2, layer_windows=(0, 8))
    params = qwen2.init_params(cfg, jax.random.key(0))
    B, S, L = 2, 256, cfg.num_hidden_layers
    nkv, dh = cfg.num_key_value_heads, cfg.head_dim_
    rng = np.random.default_rng(5)
    ck = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    cv = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    tok = jnp.asarray([3, 7], jnp.int32)
    lens = jnp.asarray([5, 9], jnp.int32)
    dstart = jnp.asarray([16, 18], jnp.int32)
    slot = jnp.asarray(22, jnp.int32)
    positions = lens + (slot - dstart)  # rows decoded since admission

    dense_logits, _, _, _ = qwen2.decode_step(
        params, cfg, tok, positions, ck, cv, slot, lens, dstart,
        ragged=False)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(rda, "ragged_decode_attention",
                        functools.partial(rda.ragged_decode_attention.__wrapped__
                                          if hasattr(rda.ragged_decode_attention, "__wrapped__")
                                          else rda.ragged_decode_attention,
                                          interpret=True))
    ragged_logits, _, _, _ = qwen2.decode_step(
        params, cfg, tok, positions, ck, cv, slot, lens, dstart,
        ragged=True)
    np.testing.assert_allclose(np.asarray(ragged_logits),
                               np.asarray(dense_logits), rtol=2e-4, atol=2e-4)


def _sink_dense_ref(q, k, v, lens, dstart, slot, sinks, pstart=None):
    """Dense reference with the gpt_oss sink column: softmax over
    [scores, sink_h], sink column dropped (zero value)."""
    B, nh, dh = q.shape
    nkv, S = k.shape[1], k.shape[2]
    group = nh // nkv
    ar = np.arange(S)[None, :]
    p0 = np.zeros((B,), np.int64) if pstart is None else np.asarray(pstart)
    valid = (((ar >= p0[:, None]) & (ar < lens[:, None]))
             | ((ar >= dstart[:, None]) & (ar <= slot)))
    qg = np.asarray(q, np.float32).reshape(B, nkv, group, dh)
    s = np.einsum("bkgd,bksd->bkgs", qg, np.asarray(k, np.float32)) / np.sqrt(dh)
    s = np.where(valid[:, None, None, :], s, -1e30)
    sk = np.asarray(sinks, np.float32).reshape(nkv, group)[None, :, :, None]
    m = np.maximum(s.max(-1, keepdims=True), sk)
    e = np.exp(s - m)
    p = e / (e.sum(-1, keepdims=True) + np.exp(sk - m))
    return np.einsum("bkgs,bksd->bkgd", p, np.asarray(v, np.float32)).reshape(B, nh, dh)


@pytest.mark.parametrize("nh,nkv", [(12, 2), (4, 4)])
def test_ragged_sinks_matches_dense(nh, nkv):
    """gpt_oss attention sinks: the m0=sink/l0=1 accumulator init equals the
    dense [scores, sink] softmax, including across row-boundary resets
    (block_rows>1) and stub rows."""
    rng = np.random.default_rng(11)
    B, S, L, dh = 3, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    sinks = jnp.asarray(rng.normal(size=(nh,)).astype(np.float32) * 2.0)
    lens = jnp.asarray([37, 120, 5], jnp.int32)
    dstart = jnp.asarray([128, 128, 160], jnp.int32)
    slot = jnp.asarray(173, jnp.int32)
    for layer in (0, 1):
        out = ragged_decode_attention(q, k, v, layer, lens, dstart, slot,
                                      sinks=sinks, block_k=64,
                                      block_rows=2, interpret=True)
        ref = _sink_dense_ref(q, np.asarray(k)[layer], np.asarray(v)[layer],
                              np.asarray(lens), np.asarray(dstart), 173,
                              np.asarray(sinks))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_ragged_sinks_int8_and_banded():
    """Sinks compose with the int8 cache mode and window-clipped ranges."""
    rng = np.random.default_rng(12)
    B, S, L, nh, nkv, dh = 2, 128, 1, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(B, nh, dh)).astype(np.float32))
    kf = rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)
    vf = rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32)

    def q8(a):
        s = np.maximum(np.abs(a).max(-1) / 127.0, 1e-12)
        return np.clip(np.round(a / s[..., None]), -127, 127).astype(np.int8), s

    kq, ks = q8(kf)
    vq, vs = q8(vf)
    kdq, vdq = kq * ks[..., None], vq * vs[..., None]
    sinks = jnp.asarray(rng.normal(size=(nh,)).astype(np.float32))
    lens = jnp.asarray([30, 50], jnp.int32)
    dstart = jnp.asarray([64, 64], jnp.int32)
    slot = jnp.asarray(90, jnp.int32)
    # window W=24 clipped ranges (as decode_step computes them)
    W = 24
    positions = np.asarray(lens) + (90 - np.asarray(dstart))
    pstart = np.clip(positions - (W - 1), 0, np.asarray(lens))
    dstart_w = np.maximum(np.asarray(dstart), 90 - (W - 1))
    out = ragged_decode_attention(
        q, jnp.asarray(kq), jnp.asarray(vq), 0, lens,
        jnp.asarray(dstart_w, jnp.int32), slot,
        cache_scale=(jnp.asarray(ks), jnp.asarray(vs)),
        pstart=jnp.asarray(pstart, jnp.int32), sinks=sinks,
        block_k=32, interpret=True)
    ref = _sink_dense_ref(q, kdq[0], vdq[0], np.asarray(lens), dstart_w, 90,
                          np.asarray(sinks), pstart=pstart)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_decode_step_sinks_ragged_matches_dense(monkeypatch):
    """decode_step wiring for a gpt_oss-style stack (sinks + alternating
    sliding/full layers): ragged path == dense path."""
    import functools

    import lapha_tpu.ops.ragged_decode_attention as rda
    from lapha_tpu.models import qwen2

    cfg = qwen2.Qwen2Config.tiny(
        head_dim=128, num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=2, layer_windows=(8, 0), attn_sinks=True,
        attention_bias=True, o_proj_bias=True)
    params = qwen2.init_params(cfg, jax.random.key(0))
    params["layers"]["attn"]["sinks"] = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 4)).astype(np.float32) * 2)
    B, S, L = 2, 256, cfg.num_hidden_layers
    nkv, dh = cfg.num_key_value_heads, cfg.head_dim_
    rng = np.random.default_rng(8)
    ck = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    cv = jnp.asarray(rng.normal(size=(L, B, nkv, S, dh)).astype(np.float32))
    tok = jnp.asarray([3, 7], jnp.int32)
    lens = jnp.asarray([5, 9], jnp.int32)
    dstart = jnp.asarray([16, 18], jnp.int32)
    slot = jnp.asarray(22, jnp.int32)
    positions = lens + (slot - dstart)

    dense_logits, _, _, _ = qwen2.decode_step(
        params, cfg, tok, positions, ck, cv, slot, lens, dstart,
        ragged=False)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(rda, "ragged_decode_attention",
                        functools.partial(rda.ragged_decode_attention,
                                          interpret=True))
    ragged_logits, _, _, _ = qwen2.decode_step(
        params, cfg, tok, positions, ck, cv, slot, lens, dstart,
        ragged=True)
    np.testing.assert_allclose(np.asarray(ragged_logits),
                               np.asarray(dense_logits), rtol=2e-4, atol=2e-4)

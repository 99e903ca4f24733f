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

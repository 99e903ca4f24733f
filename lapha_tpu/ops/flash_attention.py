"""Pallas flash attention (causal, GQA-aware) for prefill/training.

Replaces the reference's flash-attn 2 dependency
(/root/reference/lapha.yaml:5 `attn_implementation: flash_attention_2`,
SURVEY.md §2.4) with a TPU kernel: online-softmax over KV blocks, bf16
inputs with f32 accumulation on the MXU, GQA handled by mapping each query
head's grid row onto its KV head (no materialized repeat), causal + padding
masks fused, and KV blocks beyond the causal horizon skipped.

Grid: (B·nh, T/Bq). Per program: the query block lives in VMEM alongside
the full (T, dh) K/V panels of its kv-head (1 MB each at T=4096, dh=128 —
comfortably within the ~16 MB VMEM budget), so the inner loop is pure
VMEM-resident compute.

On CPU backends the kernel runs in interpreter mode (tests); the dense
fallback in models/qwen2.py stays available via ``attn_impl="dense"``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_q: int,
                  block_k: int, scale: float, causal: bool):
    dh = q_ref.shape[-1]
    q = q_ref[0].astype(jnp.float32) * scale  # (Bq, dh)
    T = k_ref.shape[1]
    qb = pl.program_id(1)

    q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (Bq, Bk)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :] > 0
        if causal:
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    n_kb = T // block_k
    if causal:
        # blocks strictly past the causal horizon contribute nothing
        n_loop = jnp.minimum(n_kb, (qb * block_q + block_q + block_k - 1) // block_k)
    else:
        n_loop = n_kb

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_loop, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_vjp(q, k, v, mask, causal, block_q, block_k, interpret):
    return _flash_forward(q, k, v, mask, causal=causal, block_q=block_q,
                          block_k=block_k, interpret=interpret)


def _flash_fwd(q, k, v, mask, causal, block_q, block_k, interpret):
    return _flash_attention_vjp(q, k, v, mask, causal, block_q, block_k, interpret), None


def _flash_bwd(causal, block_q, block_k, interpret, res, g):
    raise NotImplementedError(
        "flash_attention has no backward kernel yet — the training path uses "
        "dense attention with remat (losses.py forces attn_impl='dense'); "
        "use flash only under no-grad (engine prefill, value scoring)."
    )


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    return _flash_attention_vjp(q, k, v, mask, causal, block_q, block_k, interpret)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def _flash_forward(
    q: jax.Array,  # (B, T, nh, dh)
    k: jax.Array,  # (B, T, nkv, dh)
    v: jax.Array,
    mask: jax.Array | None = None,  # (B, T) key validity
    *,
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    scale = 1.0 / math.sqrt(dh)

    Tp = _round_up(T, max(block_q, block_k))
    if mask is None:
        mask = jnp.ones((B, T), jnp.int32)
    if Tp != T:
        pad = Tp - T
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    # (B*nh, T, dh) query panels; K/V stay per-kv-head and are indexed by the
    # grid map (no repeat materialization for GQA)
    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)

    grid = (B * nh, Tp // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal),
        out_shape=jax.ShapeDtypeStruct((B * nh, Tp, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tp, dh), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, Tp, dh), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda i, j, _nh=nh: (i // _nh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qr, kr, vr, mask.reshape(B, 1, Tp))

    out = out.reshape(B, nh, Tp, dh).transpose(0, 2, 1, 3)
    return out[:, :T]

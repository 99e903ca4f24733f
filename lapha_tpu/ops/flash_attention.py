"""Pallas flash attention (causal, GQA-aware), forward + backward.

Replaces the reference's flash-attn 2 dependency
(/root/reference/lapha.yaml:5 `attn_implementation: flash_attention_2`,
SURVEY.md §2.4) with TPU kernels: online-softmax over KV blocks, bf16
inputs with f32 accumulation on the MXU, GQA handled by mapping each query
head's grid row onto its KV head (no materialized repeat), causal + padding
masks fused, and KV blocks beyond the causal horizon skipped.

Forward grid: (B·nh, T/Bq). Per program: the query block lives in VMEM
alongside the full (T, dh) K/V panels of its kv-head (1 MB each at T=4096,
dh=128 — comfortably within the ~16 MB VMEM budget), so the inner loop is
pure VMEM-resident compute. The forward also emits the per-row logsumexp
(LSE) used by the backward.

Backward = standard flash-attn-2 block recompute, two kernels:
- dq: grid (B·nh, T/Bq); recompute P per KV block from (Q, K, LSE), then
  dS = P∘(dO·Vᵀ − D) and dQ += dS·K, f32 accumulator, one write per block.
- dk/dv: grid (B·nkv, T/Bk, group) with the GQA group as the innermost
  (fastest) grid axis; the output block index ignores the group coordinate,
  so Pallas keeps the dk/dv block resident in VMEM across the group visits
  and the kernel accumulates the per-query-head contributions in place
  (init on g==0). Inner fori over query blocks starts at the causal
  horizon of the key block.

D = rowsum(dO∘O) is computed outside the kernels (one fused elementwise
reduce; XLA handles it).

On CPU backends the kernels run in interpreter mode (tests); the dense
fallback in models/qwen2.py stays available via ``attn_impl="dense"``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, block_q: int,
                  block_k: int, scale: float, causal: bool, window: int = 0,
                  softcap: float = 0.0):
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
        if softcap:  # gemma2: soft-clamp the scaled logits to ±cap
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :] > 0
        if causal:
            valid = valid & (k_pos <= q_pos)
        if window:
            valid = valid & (k_pos > q_pos - window)
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
    kb_start = 0
    if window:
        # blocks entirely below the band (key < first query's window lo)
        kb_start = jnp.maximum(qb * block_q - (window - 1), 0) // block_k

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(kb_start, n_loop, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # logsumexp of the SCALED scores; NEG_INF rows (no valid key) stay NEG_INF
    # (lse is a (1, 1, Tp) row panel revisited across q blocks: TPU block
    # shapes must tile (8, 128) or equal the array dims, so a (1, block_q)
    # block cannot lower — write our slice of the full row instead)
    lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
    lse_ref[0, 0, pl.ds(qb * block_q, block_q)] = lse[:, 0]


def _dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, d_ref, dq_ref, *,
               block_q: int, block_k: int, scale: float, causal: bool,
               window: int = 0, softcap: float = 0.0):
    dh = q_ref.shape[-1]
    T = k_ref.shape[1]
    qb = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]  # (Bq,)
    dd = d_ref[0, 0, pl.ds(qb * block_q, block_q)]
    q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kb, acc):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :] > 0
        if causal:
            valid = valid & (k_pos <= q_pos)
        if window:
            valid = valid & (k_pos > q_pos - window)
        # guard: padded/fully-masked query rows have lse == NEG_INF, so
        # exp(s - lse) would be inf (or exp(0)=1 on masked entries) — a row
        # with no finite lse contributes nothing. (Broadcast the f32 BEFORE
        # comparing: Mosaic can't minor-dim-reshape i1 vectors.)
        row_ok = lse[:, None] > NEG_INF * 0.5
        if softcap:  # p is over the CAPPED scores; d(cap)/d(s) = 1 - (c/cap)^2
            c = jnp.tanh(s * (1.0 / softcap)) * softcap
            dcds = 1.0 - (c * (1.0 / softcap)) ** 2
            p = jnp.where(valid & row_ok, jnp.exp(c - lse[:, None]), 0.0)
        else:
            dcds = None
            p = jnp.where(valid & row_ok, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (Bq, Bk)
        ds = p * (dp - dd[:, None])
        if softcap:
            ds = ds * dcds
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    n_kb = T // block_k
    if causal:
        n_loop = jnp.minimum(n_kb, (qb * block_q + block_q + block_k - 1) // block_k)
    else:
        n_loop = n_kb
    kb_start = 0
    if window:
        kb_start = jnp.maximum(qb * block_q - (window - 1), 0) // block_k
    acc = jax.lax.fori_loop(kb_start, n_loop, body,
                            jnp.zeros((block_q, dh), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, mask_ref, lse_ref, d_ref,
                dk_ref, dv_ref, *, block_q: int, block_k: int, scale: float,
                causal: bool, window: int = 0, softcap: float = 0.0):
    dh = k_ref.shape[-1]
    T = q_ref.shape[1]
    kb = pl.program_id(1)
    g = pl.program_id(2)

    k = k_ref[0].astype(jnp.float32)  # (Bk, dh)
    v = v_ref[0].astype(jnp.float32)
    k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
    maskk = mask_ref[0, 0, pl.ds(kb * block_k, block_k)][:, None] > 0  # (Bk, 1)

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]  # (Bq,)
        dd = d_ref[0, 0, pl.ds(qb * block_q, block_q)]
        s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale  # (Bk, Bq)
        q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        valid = maskk
        if causal:
            valid = valid & (k_pos <= q_pos)
        if window:
            valid = valid & (k_pos > q_pos - window)
        # same NEG_INF-lse guard as _dq_kernel (padded query columns here)
        row_ok = lse[None, :] > NEG_INF * 0.5
        if softcap:  # same capped-score p + chain rule as _dq_kernel
            c_t = jnp.tanh(s_t * (1.0 / softcap)) * softcap
            dcds_t = 1.0 - (c_t * (1.0 / softcap)) ** 2
            p_t = jnp.where(valid & row_ok, jnp.exp(c_t - lse[None, :]), 0.0)
        else:
            dcds_t = None
            p_t = jnp.where(valid & row_ok, jnp.exp(s_t - lse[None, :]), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (Bk, Bq)
        ds_t = p_t * (dp_t - dd[None, :])
        if softcap:
            ds_t = ds_t * dcds_t
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    n_qb = T // block_q
    qb_start = (kb * block_k) // block_q if causal else 0
    qb_end = n_qb
    if window:
        # queries past the band (q_pos >= k_pos + window) see none of this
        # key block; last visible q_pos = kb*Bk + Bk-1 + window-1
        qb_end = jnp.minimum(
            n_qb, (kb * block_k + block_k - 1 + window - 1) // block_q + 1)
    dk0 = jnp.zeros((block_k, dh), jnp.float32)
    dv0 = jnp.zeros((block_k, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(qb_start, qb_end, body, (dk0, dv0))
    dk = dk * scale

    # group axis is the innermost grid dim and the output index map ignores
    # it: the block stays VMEM-resident, accumulate across the group visits
    @pl.when(g == 0)
    def _init():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(g > 0)
    def _acc():
        dk_ref[0] = dk_ref[0] + dk
        dv_ref[0] = dv_ref[0] + dv


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash_attention_vjp(q, k, v, mask, causal, window, block_q, block_k,
                         interpret, scale, softcap):
    out, _lse = _flash_forward(q, k, v, mask, causal=causal, window=window,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret, scale=scale,
                               softcap=softcap)
    return out


def _flash_fwd(q, k, v, mask, causal, window, block_q, block_k, interpret,
               scale, softcap):
    out, lse = _flash_forward(q, k, v, mask, causal=causal, window=window,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret, scale=scale,
                              softcap=softcap)
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(causal, window, block_q, block_k, interpret, scale, softcap,
               res, g):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, mask, out, lse, g, causal=causal,
                                 window=window, block_q=block_q,
                                 block_k=block_k, interpret=interpret,
                                 scale=scale, softcap=softcap)
    # mask is integer-valued: its cotangent is float0
    dmask = None if mask is None else np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    causal: bool = True,
    window: int = 0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
) -> jax.Array:
    """Flash attention, differentiable. q:(B,T,nh,dh) k,v:(B,T,nkv,dh),
    mask:(B,T) key validity. ``window`` > 0 bands the causal mask to the
    last ``window`` positions (sliding-window attention, Mistral-style;
    static, so out-of-band blocks are skipped, not just masked).
    ``scale`` overrides the 1/sqrt(dh) logit scale (gemma's
    query_pre_attn_scalar); ``softcap`` > 0 soft-clamps the scaled logits
    to ±softcap via cap*tanh(s/cap) before the softmax (gemma2), with the
    exact chain rule in both backward kernels. Returns (B,T,nh,dh) in
    q.dtype."""
    return _flash_attention_vjp(q, k, v, mask, causal, window, block_q,
                                block_k, interpret,
                                float(scale) if scale is not None else None,
                                float(softcap))


def _pad_inputs(q, k, v, mask, block_q, block_k):
    B, T, _, _ = q.shape
    Tp = _round_up(T, max(block_q, block_k))
    if mask is None:
        mask = jnp.ones((B, T), jnp.int32)
    if Tp != T:
        pad = Tp - T
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return q, k, v, mask, Tp


@functools.partial(jax.jit, static_argnames=("causal", "window", "block_q",
                                             "block_k", "interpret", "scale",
                                             "softcap"))
def _flash_forward(
    q: jax.Array,  # (B, T, nh, dh)
    k: jax.Array,  # (B, T, nkv, dh)
    v: jax.Array,
    mask: jax.Array | None = None,  # (B, T) key validity
    *,
    causal: bool = True,
    window: int = 0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
):
    """Returns (out (B,T,nh,dh), lse (B,nh,T) f32)."""
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)

    q, k, v, mask, Tp = _pad_inputs(q, k, v, mask, block_q, block_k)

    # (B*nh, T, dh) query panels; K/V stay per-kv-head and are indexed by the
    # grid map (no repeat materialization for GQA)
    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)

    grid = (B * nh, Tp // block_q)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal, window=window,
                          softcap=softcap),
        out_shape=(jax.ShapeDtypeStruct((B * nh, Tp, dh), q.dtype),
                   jax.ShapeDtypeStruct((B * nh, 1, Tp), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tp, dh), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, Tp, dh), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda i, j, _nh=nh: (i // _nh, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, 1, Tp), lambda i, j: (i, 0, 0))),
        interpret=interpret,
    )(qr, kr, vr, mask.reshape(B, 1, Tp))

    out = out.reshape(B, nh, Tp, dh).transpose(0, 2, 1, 3)
    lse = lse.reshape(B, nh, Tp)
    return out[:, :T], lse[:, :, :T]


@functools.partial(jax.jit, static_argnames=("causal", "window", "block_q",
                                             "block_k", "interpret", "scale",
                                             "softcap"))
def _flash_backward(q, k, v, mask, out, lse, do, *, causal: bool,
                    block_q: int, block_k: int, interpret: bool,
                    window: int = 0, scale: float | None = None,
                    softcap: float = 0.0):
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)
    q_dtype, k_dtype, v_dtype = q.dtype, k.dtype, v.dtype

    # D = rowsum(dO ∘ O) in f32 (one fused elementwise reduce outside pallas)
    d = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,T,nh)

    q, k, v, mask, Tp = _pad_inputs(q, k, v, mask, block_q, block_k)
    if Tp != T:
        do = jnp.pad(do, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, 0), (0, Tp - T), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Tp - T)),
                      constant_values=NEG_INF)

    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    dor = do.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    lser = lse.reshape(B * nh, 1, Tp)
    dr = d.transpose(0, 2, 1).reshape(B * nh, 1, Tp)
    maskr = mask.reshape(B, 1, Tp)

    kv_map = lambda i, j, _nh=nh, _g=group, _nkv=nkv: (
        (i // _nh) * _nkv + (i % _nh) // _g, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal, window=window,
                          softcap=softcap),
        out_shape=jax.ShapeDtypeStruct((B * nh, Tp, dh), q_dtype),
        grid=(B * nh, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),   # q
            pl.BlockSpec((1, Tp, dh), kv_map),                        # k panel
            pl.BlockSpec((1, Tp, dh), kv_map),                        # v panel
            pl.BlockSpec((1, 1, Tp), lambda i, j, _nh=nh: (i // _nh, 0, 0)),
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),   # do
            pl.BlockSpec((1, 1, Tp), lambda i, j: (i, 0, 0)),         # lse
            pl.BlockSpec((1, 1, Tp), lambda i, j: (i, 0, 0)),         # D
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qr, kr, vr, maskr, dor, lser, dr)

    # dk/dv: group is the innermost grid axis; output block index ignores it
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal, window=window,
                          softcap=softcap),
        out_shape=(jax.ShapeDtypeStruct((B * nkv, Tp, dh), jnp.float32),
                   jax.ShapeDtypeStruct((B * nkv, Tp, dh), jnp.float32)),
        grid=(B * nkv, Tp // block_k, group),
        in_specs=[
            pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0)),   # k
            pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0)),   # v
            pl.BlockSpec((1, Tp, dh), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # q panel
            pl.BlockSpec((1, Tp, dh), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # do panel
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _nkv=nkv: (i // _nkv, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # lse
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # D
        ],
        out_specs=(pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0)),
                   pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0))),
        interpret=interpret,
    )(kr, vr, qr, dor, maskr, lser, dr)

    dq = dq.reshape(B, nh, Tp, dh).transpose(0, 2, 1, 3)[:, :T]
    dk = dk.reshape(B, nkv, Tp, dh).transpose(0, 2, 1, 3)[:, :T].astype(k_dtype)
    dv = dv.reshape(B, nkv, Tp, dh).transpose(0, 2, 1, 3)[:, :T].astype(v_dtype)
    return dq, dk, dv

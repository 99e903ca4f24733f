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
    # V (and therefore the output/accumulator) may be NARROWER than Q/K:
    # MLA scores on qk_head_dim=192 but combines on v_head_dim=128
    # (models/deepseek.py) — splitting the widths saves the +50% V traffic
    # a padded-V kernel would pay
    dv = v_ref.shape[-1]
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
    a0 = jnp.zeros((block_q, dv), jnp.float32)
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
    dv0 = jnp.zeros((block_k, v_ref.shape[-1]), jnp.float32)  # dv may != dh
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


# --- learned per-head attention sinks (gpt_oss) -------------------------
#
# The sink is an extra per-head softmax column with logit sink_h and zero
# value (HF GptOss eager_attention_forward; models/qwen2.py _sink_softmax).
# It folds EXACTLY around the sink-free kernel, so no kernel changes:
#   lse_t = logaddexp(lse, sink)            (sink-inclusive partition fn)
#   out_t = out * exp(lse - lse_t)          (renormalize: sink steals mass)
# Backward: with p_i = exp(s_i - lse_t), the standard flash-attn-2 formulas
# for dq/dk/dv hold unchanged — D = rowsum(dO ∘ out_t) already equals
# Σ_i p_i·dp_i because the sink column's value (hence dp) is zero — so the
# existing backward kernels are reused with (out_t, lse_t). The sink grad:
#   ∂out_t/∂sink = -p_sink · out_t  ⇒  dsink_h = -Σ_{b,t} p_sink · D
# computed outside pallas (one fused reduce).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_attention_sink_vjp(q, k, v, mask, sinks, causal, window, block_q,
                              block_k, interpret, scale, softcap):
    out, _, _ = _sink_forward(q, k, v, mask, sinks, causal, window, block_q,
                              block_k, interpret, scale, softcap)
    return out


def _sink_forward(q, k, v, mask, sinks, causal, window, block_q, block_k,
                  interpret, scale, softcap):
    out0, lse0 = _flash_forward(q, k, v, mask, causal=causal, window=window,
                                block_q=block_q, block_k=block_k,
                                interpret=interpret, scale=scale,
                                softcap=softcap)
    sinks_f = sinks.astype(jnp.float32)
    lse_t = jnp.logaddexp(lse0, sinks_f[None, :, None])  # (B, nh, T)
    # fully-masked rows: lse0 = NEG_INF ⇒ lse_t = sink, factor = 0 — the
    # row's whole mass sits on the sink and the output is exactly 0.
    factor = jnp.exp(lse0 - lse_t).transpose(0, 2, 1)[..., None]  # (B,T,nh,1)
    out = (out0.astype(jnp.float32) * factor).astype(out0.dtype)
    return out, lse_t, sinks_f


def _sink_fwd(q, k, v, mask, sinks, causal, window, block_q, block_k,
              interpret, scale, softcap):
    out, lse_t, _ = _sink_forward(q, k, v, mask, sinks, causal, window,
                                  block_q, block_k, interpret, scale, softcap)
    return out, (q, k, v, mask, sinks, out, lse_t)


def _sink_bwd(causal, window, block_q, block_k, interpret, scale, softcap,
              res, g):
    q, k, v, mask, sinks, out, lse_t = res
    # D = rowsum(dO ∘ out_t): (B, T, nh) — computed once, shared with the
    # backward kernel via delta= (it needs the identical quantity)
    d = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dq, dk, dv = _flash_backward(q, k, v, mask, out, lse_t, g, causal=causal,
                                 window=window, block_q=block_q,
                                 block_k=block_k, interpret=interpret,
                                 scale=scale, softcap=softcap, delta=d)
    p_sink = jnp.exp(sinks.astype(jnp.float32)[None, :, None] - lse_t)  # (B,nh,T)
    dsink = -jnp.sum(p_sink * d.transpose(0, 2, 1), axis=(0, 2))  # (nh,)
    dmask = None if mask is None else np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask, dsink.astype(sinks.dtype)


_flash_attention_sink_vjp.defvjp(_sink_fwd, _sink_bwd)


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
    sinks: jax.Array | None = None,
) -> jax.Array:
    """Flash attention, differentiable. q:(B,T,nh,dh) k:(B,T,nkv,dh),
    v:(B,T,nkv,dv) — dv may be NARROWER than dh (MLA scores on
    qk_head_dim=192, combines on v_head_dim=128; the output is then
    (B,T,nh,dv) and V/dO traffic stays at dv width, no padding tax).
    mask:(B,T) key validity. ``window`` > 0 bands the causal mask to the
    last ``window`` positions (sliding-window attention, Mistral-style;
    static, so out-of-band blocks are skipped, not just masked).
    ``scale`` overrides the 1/sqrt(dh) logit scale (gemma's
    query_pre_attn_scalar); ``softcap`` > 0 soft-clamps the scaled logits
    to ±softcap via cap*tanh(s/cap) before the softmax (gemma2), with the
    exact chain rule in both backward kernels. ``sinks`` (nh,): learned
    per-head attention-sink logits (gpt_oss), folded exactly around the
    sink-free kernels (see the sink section above) and differentiable.
    Returns (B,T,nh,dh) in q.dtype."""
    scale_f = float(scale) if scale is not None else None
    if sinks is not None:
        return _flash_attention_sink_vjp(q, k, v, mask, sinks, causal,
                                         window, block_q, block_k, interpret,
                                         scale_f, float(softcap))
    return _flash_attention_vjp(q, k, v, mask, causal, window, block_q,
                                block_k, interpret, scale_f, float(softcap))


# --- cache-threaded (engine) prefill: rectangular flash ------------------
#
# The engine's prefill writes T new tokens into a (B, S, nkv, dh) cache at
# qstart[b] (0 for fresh prefill, per-row starts for batched prefix-hit
# suffix prefill) and attends the T queries over the WHOLE cache — a
# rectangular (T x S) attention with the causal frontier at absolute
# position qstart[b] + t (cache slots are positions in this layout; see
# models/qwen2.py forward's cached branch). The dense path materializes
# O(B·nh·T·S) f32 logits in HBM; this kernel is the same online-softmax
# flash structure as _flash_kernel with S decoupled from T and the
# per-row query offset prefetched to SMEM (pltpu.PrefetchScalarGridSpec),
# so causal-past-frontier KV blocks are SKIPPED per batch row, not masked.
# Forward-only: cached prefill is inference (training never threads a
# cache), so there is no backward pair. Sinks (gpt_oss) fold outside the
# kernel exactly like the sink section above.


def _flash_cached_kernel(qstart_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                         lse_ref, *, nh: int, block_q: int, block_k: int,
                         scale: float, window: int = 0, softcap: float = 0.0):
    dh = q_ref.shape[-1]
    q = q_ref[0].astype(jnp.float32) * scale  # (Bq, dh)
    Sp = k_ref.shape[1]
    qb = pl.program_id(1)
    qs = qstart_ref[pl.program_id(0) // nh]  # this row's query offset

    q_pos = qs + qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if softcap:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :] > 0
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

    n_kb = Sp // block_k
    # causal frontier of this block's LAST query row (traced: qs is data)
    n_loop = jnp.minimum(n_kb, (qs + qb * block_q + block_q + block_k - 1)
                         // block_k)
    kb_start = 0
    if window:
        kb_start = jnp.maximum(qs + qb * block_q - (window - 1), 0) // block_k

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, v_ref.shape[-1]), jnp.float32)  # dv may != dh
    m, l, acc = jax.lax.fori_loop(kb_start, n_loop, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
    lse_ref[0, 0, pl.ds(qb * block_q, block_q)] = lse[:, 0]


@functools.partial(jax.jit, static_argnames=("window", "block_q", "block_k",
                                             "interpret", "scale", "softcap"))
def _flash_cached_forward(q, k, v, kv_valid, qstart, *, window=0,
                          block_q=128, block_k=128, interpret=False,
                          scale=None, softcap=0.0):
    """Returns (out (B,T,nh,dh), lse (B,nh,T) f32)."""
    from jax.experimental.pallas import tpu as pltpu

    B, T, nh, dh = q.shape
    S = k.shape[1]
    nkv = k.shape[2]
    dv = v.shape[-1]  # may be narrower than dh (MLA)
    group = nh // nkv
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)

    Tp = _round_up(T, block_q)
    Sp = _round_up(S, block_k)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Sp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Sp, dv)
    qstart = jnp.broadcast_to(jnp.asarray(qstart, jnp.int32).reshape(-1), (B,))

    kv_map = lambda i, j, qs, _nh=nh, _g=group, _nkv=nkv: (
        (i // _nh) * _nkv + (i % _nh) // _g, 0, 0)
    out, lse = pl.pallas_call(
        functools.partial(_flash_cached_kernel, nh=nh, block_q=block_q,
                          block_k=block_k, scale=scale, window=window,
                          softcap=softcap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * nh, Tp // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda i, j, qs: (i, j, 0)),
                pl.BlockSpec((1, Sp, dh), kv_map),
                pl.BlockSpec((1, Sp, dv), kv_map),
                pl.BlockSpec((1, 1, Sp),
                             lambda i, j, qs, _nh=nh: (i // _nh, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, dv), lambda i, j, qs: (i, j, 0)),
                pl.BlockSpec((1, 1, Tp), lambda i, j, qs: (i, 0, 0))),
        ),
        out_shape=(jax.ShapeDtypeStruct((B * nh, Tp, dv), q.dtype),
                   jax.ShapeDtypeStruct((B * nh, 1, Tp), jnp.float32)),
        interpret=interpret,
    )(qstart, qr, kr, vr, kv_valid.reshape(B, 1, Sp).astype(jnp.int32))

    out = out.reshape(B, nh, Tp, dv).transpose(0, 2, 1, 3)
    lse = lse.reshape(B, nh, Tp)
    return out[:, :T], lse[:, :, :T]


def flash_attention_cached(
    q: jax.Array,         # (B, T, nh, dh) new-token queries
    k: jax.Array,         # (B, S, nkv, dh) WHOLE cache (new tokens written)
    v: jax.Array,
    kv_valid: jax.Array,  # (B, S) cache-column validity
    qstart: jax.Array,    # (B,) or scalar: absolute position of query 0
    *,
    window: int = 0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
    sinks: jax.Array | None = None,
) -> jax.Array:
    """Rectangular flash attention for cache-threaded prefill (forward
    only — inference path). Query t of row b sits at absolute position
    qstart[b] + t and sees cache column j iff kv_valid[b, j] and
    j <= qstart[b] + t (and j > qstart[b] + t - window when banded).
    ``sinks`` folds outside the kernel exactly like flash_attention's."""
    scale_f = float(scale) if scale is not None else None
    out, lse = _flash_cached_forward(q, k, v, kv_valid, qstart,
                                     window=window, block_q=block_q,
                                     block_k=block_k, interpret=interpret,
                                     scale=scale_f, softcap=float(softcap))
    if sinks is not None:
        sinks_f = sinks.astype(jnp.float32)
        lse_t = jnp.logaddexp(lse, sinks_f[None, :, None])  # (B, nh, T)
        factor = jnp.exp(lse - lse_t).transpose(0, 2, 1)[..., None]
        out = (out.astype(jnp.float32) * factor).astype(out.dtype)
    return out


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
    """Returns (out (B,T,nh,dv), lse (B,nh,T) f32). dv = v.shape[-1] may be
    narrower than dh (MLA: 128-wide V under 192-wide Q/K)."""
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    dv = v.shape[-1]
    group = nh // nkv
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)

    q, k, v, mask, Tp = _pad_inputs(q, k, v, mask, block_q, block_k)

    # (B*nh, T, dh) query panels; K/V stay per-kv-head and are indexed by the
    # grid map (no repeat materialization for GQA)
    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dv)

    grid = (B * nh, Tp // block_q)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal, window=window,
                          softcap=softcap),
        out_shape=(jax.ShapeDtypeStruct((B * nh, Tp, dv), q.dtype),
                   jax.ShapeDtypeStruct((B * nh, 1, Tp), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tp, dh), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, Tp, dv), lambda i, j, _nh=nh, _g=group, _nkv=nkv:
                         ((i // _nh) * _nkv + (i % _nh) // _g, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda i, j, _nh=nh: (i // _nh, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, 1, Tp), lambda i, j: (i, 0, 0))),
        interpret=interpret,
    )(qr, kr, vr, mask.reshape(B, 1, Tp))

    out = out.reshape(B, nh, Tp, dv).transpose(0, 2, 1, 3)
    lse = lse.reshape(B, nh, Tp)
    return out[:, :T], lse[:, :, :T]


@functools.partial(jax.jit, static_argnames=("causal", "window", "block_q",
                                             "block_k", "interpret", "scale",
                                             "softcap"))
def _flash_backward(q, k, v, mask, out, lse, do, *, causal: bool,
                    block_q: int, block_k: int, interpret: bool,
                    window: int = 0, scale: float | None = None,
                    softcap: float = 0.0, delta=None):
    B, T, nh, dh = q.shape
    nkv = k.shape[2]
    dv_w = v.shape[-1]  # V/dO width; may be narrower than dh (MLA)
    group = nh // nkv
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)
    q_dtype, k_dtype, v_dtype = q.dtype, k.dtype, v.dtype

    # D = rowsum(dO ∘ O) in f32 (one fused elementwise reduce outside
    # pallas). The sink vjp also needs D for dsink, so it computes it
    # once and passes it via ``delta``.
    d = delta if delta is not None else jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,T,nh)

    q, k, v, mask, Tp = _pad_inputs(q, k, v, mask, block_q, block_k)
    if Tp != T:
        do = jnp.pad(do, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, 0), (0, Tp - T), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Tp - T)),
                      constant_values=NEG_INF)

    qr = q.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * nkv, Tp, dv_w)
    dor = do.transpose(0, 2, 1, 3).reshape(B * nh, Tp, dv_w)
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
            pl.BlockSpec((1, Tp, dv_w), kv_map),                      # v panel
            pl.BlockSpec((1, 1, Tp), lambda i, j, _nh=nh: (i // _nh, 0, 0)),
            pl.BlockSpec((1, block_q, dv_w), lambda i, j: (i, j, 0)),  # do
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
                   jax.ShapeDtypeStruct((B * nkv, Tp, dv_w), jnp.float32)),
        grid=(B * nkv, Tp // block_k, group),
        in_specs=[
            pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0)),   # k
            pl.BlockSpec((1, block_k, dv_w), lambda i, kb, g: (i, kb, 0)),  # v
            pl.BlockSpec((1, Tp, dh), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # q panel
            pl.BlockSpec((1, Tp, dv_w), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # do panel
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _nkv=nkv: (i // _nkv, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # lse
            pl.BlockSpec((1, 1, Tp), lambda i, kb, g, _g=group: (i * _g + g, 0, 0)),  # D
        ],
        out_specs=(pl.BlockSpec((1, block_k, dh), lambda i, kb, g: (i, kb, 0)),
                   pl.BlockSpec((1, block_k, dv_w), lambda i, kb, g: (i, kb, 0))),
        interpret=interpret,
    )(kr, vr, qr, dor, maskr, lser, dr)

    dq = dq.reshape(B, nh, Tp, dh).transpose(0, 2, 1, 3)[:, :T]
    dk = dk.reshape(B, nkv, Tp, dh).transpose(0, 2, 1, 3)[:, :T].astype(k_dtype)
    dv = dv.reshape(B, nkv, Tp, dv_w).transpose(0, 2, 1, 3)[:, :T].astype(v_dtype)
    return dq, dk, dv

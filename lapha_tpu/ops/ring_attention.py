"""Ring attention over a `sequence` mesh axis (context parallelism).

The reference has NO sequence parallelism (SURVEY §5.7: it scales search
breadth, not context, and left-truncates at max_model_len). This op is the
TPU-native building block that lifts that ceiling: shard the sequence axis
across devices, keep each device's queries local, and rotate K/V blocks
around the ring with `jax.lax.ppermute` (ICI neighbor exchange) while
online-softmax accumulators (m, l, acc) stay resident — attention memory
per device is O(T/n · T/n) per block instead of O(T²), and the K/V volume
crosses each link exactly once per step.

Blockwise-attention formulation (Ring Attention, Liu et al. 2023), pure
jnp inside `shard_map`, so XLA differentiates it — no bespoke backward.
Causality is handled with GLOBAL positions: block j contributes a full,
partial, or empty causal mask depending on its ring source index, and the
NEG_INF + row-ok guards keep fully-masked rows finite (same guard
structure as ops/flash_attention.py).

Two entry points:
- :func:`ring_attention` — standalone: wraps its own shard_map (tests,
  single-op use).
- :func:`ring_attend_local` — the per-device body, callable INSIDE an
  existing shard_map whose mesh carries `axis`; this is what
  models/qwen2_seq.forward_seq uses to run the whole decoder stack
  sequence-parallel with one shard_map around all layers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, valid, m, l, acc, scale, softcap=0.0):
    """One blockwise online-softmax update.

    q (B, Tl, nh, dh); k/v (B, Tl, nkv, dh); valid (B, Tl, Tl) mask of
    (query, key) pairs; carries m/l (B, nh, Tl, 1), acc (B, nh, Tl, dh).
    ``softcap`` > 0 soft-clamps logits to ±cap before masking (gemma2,
    same order as qwen2._attend: scale → softcap → mask).
    """
    B, Tl, nh, dh = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    qg = q.reshape(B, Tl, nkv, group, dh)
    s = jnp.einsum("btkgd,bskd->bkgts", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale          # (B,nkv,g,Tl,Tl)
    s = s.reshape(B, nh, Tl, Tl)
    if softcap:
        s = jnp.tanh(s / softcap) * softcap
    s = jnp.where(valid[:, None, :, :], s, NEG_INF)

    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    # fully-masked-so-far rows: keep the carry finite
    m_new = jnp.maximum(m_new, NEG_INF)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(valid[:, None, :, :], p, 0.0)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pg = p.reshape(B, nkv, group, Tl, Tl)
    upd = jnp.einsum("bkgts,bskd->btkgd", pg, v.astype(jnp.float32))
    acc_new = acc * alpha + upd.reshape(B, Tl, nh, dh).transpose(0, 2, 1, 3)
    return m_new, l_new, acc_new


def ring_attend_local(
    q: jax.Array,       # (B, Tl, nh, dh) — LOCAL sequence block
    k: jax.Array,       # (B, Tl, nkv, dh)
    v: jax.Array,
    mask: jax.Array,    # (B, Tl) local key-validity block
    axis: str,
    n: int,
    causal: bool = True,
    vary_axes: tuple[str, ...] | None = None,
    window: int | jax.Array = 0,
    sinks: jax.Array | None = None,
    softcap: float = 0.0,
    scale: float | None = None,
) -> jax.Array:
    """Per-device ring attention body (call inside shard_map over `axis`).

    Global causality is reconstructed from `jax.lax.axis_index(axis)`:
    query slot = idx·Tl + t, key slot = src·Tl + s where src is the ring
    source of the block currently held. Returns the local (B, Tl, nh, dh)
    output block. Collectives: n-1 ppermute steps of the K/V block around
    the ring (each link carries each block once — bandwidth-optimal ICI).

    ``vary_axes``: ALL mesh axes the q/k/v blocks vary over (default just
    ``axis``) — the fori_loop accumulators must carry the same varying-
    manual-axes type or shard_map's vma check rejects the loop (e.g. add
    "data" when batch is sharded too, models/qwen2_seq.forward_seq).

    ``window`` (> 0): sliding-window banding — key slot j visible to query
    slot i iff i-window < j <= i, the same INDEX-based rule as
    qwen2.forward's banded dense mask (equal to position-based banding for
    left- or right-padded rows: both indices shift by the pad offset).
    Blocks wholly outside the band (and, under ``causal``, wholly in the
    future) skip their attention FLOPs via ``lax.cond`` — only the
    ppermute rotation still touches them, so W << T long-context runs pay
    O(W·T/n) compute per device, not O((T/n)·T). A TRACED scalar window
    (heterogeneous layer_windows stacks thread widths as a scan operand,
    qwen2_seq.forward_seq) also works: 0 means full attention, the band
    and the block skip use lax.cond's runtime predicate — the FLOP skip
    is still real, only the mask structure stays dynamic.

    ``sinks`` (nh,) f32: gpt_oss learned per-head attention sinks — an
    extra softmax column with logit sink_h and zero value. Folded EXACTLY
    after the ring completes (the same fold as ops/flash_attention's
    _flash_attention_sink_vjp): m_t = max(m, sink), l_t = l·e^{m−m_t} +
    e^{sink−m_t}, acc_t = acc·e^{m−m_t} — fully-masked rows give all mass
    to the sink (output 0), matching qwen2._sink_softmax.

    ``softcap`` (gemma2) soft-clamps logits; ``scale`` overrides the
    1/sqrt(dh) logit scale (gemma's query_pre_attn_scalar)."""
    B, Tl, nh, dh = q.shape
    scale = (1.0 / math.sqrt(dh)) if scale is None else float(scale)
    perm = [(i, (i + 1) % n) for i in range(n)]
    idx = jax.lax.axis_index(axis)
    q_pos = idx * Tl + jnp.arange(Tl)                      # global positions
    traced_w = not isinstance(window, int)
    if traced_w:  # per-layer scanned width: 0 = full attention
        wide = jnp.where(window > 0, window, n * Tl + 1).astype(jnp.int32)

    def body(j, carry):
        m, l, acc, kb, vb, maskb = carry
        src = (idx - j) % n                                 # block's owner
        k_pos = src * Tl + jnp.arange(Tl)
        valid = maskb[:, None, :] > 0                       # (B, 1, Tl)
        valid = jnp.broadcast_to(valid, (B, Tl, Tl))
        if causal:
            valid = valid & (k_pos[None, None, :] <= q_pos[None, :, None])
        if traced_w:
            valid = valid & (k_pos[None, None, :]
                             > q_pos[None, :, None] - wide)
        elif window:
            valid = valid & (k_pos[None, None, :]
                             > q_pos[None, :, None] - window)

        # block-level skip: no (query, key) pair of this block can be live
        # when the block is entirely in the causal future or entirely below
        # the window band — the mask math above would zero it anyway, but
        # the cond saves the einsums (the dominant cost at W << T)
        live = jnp.bool_(True)
        if causal:
            live = live & (k_pos[0] <= q_pos[-1])
        if traced_w:
            live = live & (k_pos[-1] > q_pos[0] - wide)
        elif window:
            live = live & (k_pos[-1] > q_pos[0] - window)
        m, l, acc = jax.lax.cond(
            live,
            lambda m, l, acc: _block_attend(q, kb, vb, valid, m, l, acc,
                                            scale, softcap),
            lambda m, l, acc: (m, l, acc),
            m, l, acc)
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        maskb = jax.lax.ppermute(maskb, axis, perm)
        return m, l, acc, kb, vb, maskb

    # pvary: the accumulators become axis-varying after the first block
    # (they depend on axis_index and the sharded k/v); the carry types must
    # match across loop iterations
    va = tuple(vary_axes) if vary_axes else (axis,)
    m0 = jax.lax.pvary(jnp.full((B, nh, Tl, 1), NEG_INF, jnp.float32), va)
    l0 = jax.lax.pvary(jnp.zeros((B, nh, Tl, 1), jnp.float32), va)
    a0 = jax.lax.pvary(jnp.zeros((B, nh, Tl, dh), jnp.float32), va)
    m, l, acc, *_ = jax.lax.fori_loop(0, n, body, (m0, l0, a0, k, v, mask))
    if sinks is not None:  # exact post-ring fold (docstring)
        sk = sinks.astype(jnp.float32).reshape(1, nh, 1, 1)
        m_t = jnp.maximum(m, sk)
        l = l * jnp.exp(m - m_t) + jnp.exp(sk - m_t)
        acc = acc * jnp.exp(m - m_t)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)        # (B, Tl, nh, dh)


def ring_attention(
    q: jax.Array,       # (B, T, nh, dh) — T sharded over `axis`
    k: jax.Array,       # (B, T, nkv, dh)
    v: jax.Array,
    mask: jax.Array,    # (B, T) key validity — T sharded over `axis`
    mesh: Mesh,
    axis: str = "sequence",
    causal: bool = True,
    window: int = 0,
) -> jax.Array:
    """Full-sequence causal attention with T sharded across `axis`.

    Returns (B, T, nh, dh) sharded like q. Standalone wrapper around
    :func:`ring_attend_local` with its own shard_map."""
    from jax.experimental.shard_map import shard_map

    B, T, nh, dh = q.shape
    n = mesh.shape[axis]
    assert T % n == 0, (T, n)

    def local(q, k, v, mask):
        return ring_attend_local(q, k, v, mask, axis=axis, n=n,
                                 causal=causal, window=window)

    spec_q = P(None, axis, None, None)
    spec_m = P(None, axis)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec_q, spec_q, spec_q, spec_m),
                   out_specs=spec_q)
    return fn(q, k, v, mask)

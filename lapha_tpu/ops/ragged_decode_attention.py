"""Pallas ragged decode attention: read only each row's VALID cache slots.

The engine's decode attention (qwen2.decode_step) is HBM-bound at long
contexts: the dense path reads the full (S, dh) K/V panels per (row,
kv-head) and masks — at S=4096, B=48, 1.5B that is 5.6 GB/step, more than
the weight reads. Rows are ragged (prompt len << S early in decode), so
most of that traffic is masked-out garbage.

This kernel DMAs only the chunks intersecting each row's valid ranges:

  valid(b, j) = pstart[b] <= j < lens[b]  OR  dstart[b] <= j <= slot

(the engine's slot-uniform layout: [0, lens[b]) is the row's prompt,
[dstart[b], slot] its decode columns; dstart >= lens always, so the two
ranges never overlap). Chunk count per row = the prompt-range chunks +
the decode-range chunks — NOT S/bk.

``pstart`` (default 0) is the banding hook for SLIDING-WINDOW layers
(Mistral stacks, gemma3's 5-local:1-global pattern): a window of width W
admits prompt slots (positions) > positions[b] - W and decode slots
> slot - W, which are exactly the same two-range structure with clipped
starts — the caller passes pstart = clip(positions - W + 1, 0, lens) and
dstart' = max(dstart, slot - W + 1) and the kernel reads ~2*W/bk chunks
per row instead of the whole context (at S >> W this is the difference
between O(S) and O(W) cache traffic per windowed layer). An empty prompt
range (pstart >= lens — the window has slid past the whole prompt) walks
zero prompt chunks.

Grid (B/block_rows, nkv): each program owns ``block_rows`` rows and walks
their chunk lists as ONE flattened loop with double-buffered HBM→VMEM DMA
(pltpu.make_async_copy) that crosses row boundaries, so the stream never
stalls between rows. v1 of this kernel used one program per (row, head);
measured on v5e the per-program fixed cost (~0.3 ms across the 96-program
grid at B=48) dominated the DMA'd bytes and the kernel barely beat dense —
batching rows into programs amortizes it by block_rows. Per-row f32
online-softmax accumulators (the GQA query group, nh/nkv rows padded to 8
sublanes) are reset in-register at row boundaries and each row's output is
stored when its last chunk retires.

The kernel takes the FULL stacked (L, B, nkv, S, dh) caches plus the layer
index as a scalar-prefetch arg: inside the engine's unrolled decode loop a
per-layer ``cache[l]`` slice (or any reshape) would materialize an 88 MB
copy per layer-step as the pallas operand — exactly the traffic the kernel
exists to avoid. The (.., nkv, S, dh) axis order keeps the DMA'd (bk, dh)
windows tile-aligned (slicing an nkv-minor axis of extent 2 to 1 violates
the (2,128) bf16 tile) and makes each (l, b, h) panel contiguous.

Reference capability replaced: vLLM's paged attention (SURVEY §2.4) — same
goal (decode attention reads scale with actual sequence length, not
allocated capacity), TPU-shaped realization (ranged DMA over a dense cache
instead of page tables; the slot-uniform layout already gives contiguity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_GPAD = 8  # query-group rows padded to the f32 sublane tile


def _kernel(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
            k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, *, block_k: int,
            scale: float, block_rows: int):
    """bf16-cache entry (pallas passes refs positionally)."""
    _kernel_impl(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
                 k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, block_k=block_k,
                 scale=scale, block_rows=block_rows)


def _kernel_sink(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref,
                 sinks_ref, q_ref, k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, *,
                 block_k: int, scale: float, block_rows: int):
    """bf16-cache entry with attention sinks (extra SMEM prefetch arg)."""
    _kernel_impl(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
                 k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, block_k=block_k,
                 scale=scale, block_rows=block_rows, sinks_ref=sinks_ref)


def _kernel_q8(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
               k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, k_scr, v_scr, ks_scr,
               vs_scr, sem, *, block_k: int, scale: float, block_rows: int):
    """int8-cache entry: scale planes as two extra inputs + VMEM scratch."""
    _kernel_impl(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
                 k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, block_k=block_k,
                 scale=scale, block_rows=block_rows,
                 ks_hbm=ks_hbm, vs_hbm=vs_hbm, ks_scr=ks_scr, vs_scr=vs_scr)


def _kernel_q8_sink(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref,
                    sinks_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
                    k_scr, v_scr, ks_scr, vs_scr, sem, *, block_k: int,
                    scale: float, block_rows: int):
    """int8-cache entry with attention sinks."""
    _kernel_impl(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
                 k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, block_k=block_k,
                 scale=scale, block_rows=block_rows,
                 ks_hbm=ks_hbm, vs_hbm=vs_hbm, ks_scr=ks_scr, vs_scr=vs_scr,
                 sinks_ref=sinks_ref)


def _kernel_impl(pstart_ref, lens_ref, dstart_ref, slot_ref, layer_ref, q_ref,
                 k_hbm, v_hbm, o_ref, k_scr, v_scr, sem, *, block_k: int,
                 scale: float, block_rows: int, ks_hbm=None, vs_hbm=None,
                 ks_scr=None, vs_scr=None, sinks_ref=None):
    quantized = ks_hbm is not None
    pb = pl.program_id(0)
    h = pl.program_id(1)
    NB = block_rows
    G = q_ref.shape[2]
    dh = q_ref.shape[3]

    sl = slot_ref[0]
    l = layer_ref[0]
    ndc = (sl + block_k) // block_k  # cdiv(sl+1, bk): decode chunks end

    def row_params(r):
        """r: traced or static in [0, NB). Scalars from SMEM."""
        rb = pb * NB + r
        p0 = pstart_ref[rb]        # prompt range [p0, n1) — p0 > 0 on
        n1 = lens_ref[rb]          # windowed layers; empty when p0 >= n1
        d0 = dstart_ref[rb]        # decode range [d0, sl]
        c1_lo = p0 // block_k
        nc1 = jnp.where(p0 >= n1, 0,
                        (n1 + block_k - 1) // block_k - c1_lo)
        c2_lo = d0 // block_k
        nc = nc1 + (ndc - c2_lo)   # >= 1 always (d0 <= sl)
        return p0, n1, d0, c1_lo, nc1, c2_lo, nc

    # flattened chunk count across this program's rows (static unroll of NB)
    total = row_params(0)[6]
    for r in range(1, NB):
        total = total + row_params(r)[6]

    def chunk_of(r, i):
        p0, n1, d0, c1_lo, nc1, c2_lo, nc = row_params(r)
        return jnp.where(i < nc1, c1_lo + i, c2_lo + (i - nc1))

    def next_ri(r, i):
        """(row, chunk) after (r, i); every row has >= 1 chunk."""
        nc = row_params(r)[6]
        last = (i + 1) >= nc
        return jnp.where(last, r + 1, r), jnp.where(last, 0, i + 1)

    def _copies(buf, r, i):
        c = chunk_of(r, i)
        # stub rows past the real batch read row B-1's panels (cheap, dropped)
        rb = jnp.minimum(pb * NB + r, k_hbm.shape[1] - 1)
        cps = [
            pltpu.make_async_copy(
                k_hbm.at[l, rb, h, pl.ds(c * block_k, block_k), :],
                k_scr.at[buf], sem.at[buf, 0]),
            pltpu.make_async_copy(
                v_hbm.at[l, rb, h, pl.ds(c * block_k, block_k), :],
                v_scr.at[buf], sem.at[buf, 1]),
        ]
        if quantized:
            # int8-KV scale rows: the planes arrive pre-viewed as
            # (L, B, nkv, S/bk, 1, bk) so each chunk is a lane-aligned
            # (1, bk) window (slicing the raw (.., nkv, S) plane would cut
            # the nkv sublane dim below its tile — Mosaic rejects it)
            cps += [
                pltpu.make_async_copy(ks_hbm.at[l, rb, h, c],
                                      ks_scr.at[buf], sem.at[buf, 2]),
                pltpu.make_async_copy(vs_hbm.at[l, rb, h, c],
                                      vs_scr.at[buf], sem.at[buf, 3]),
            ]
        return cps

    def start_dma(buf, r, i):
        for cp in _copies(buf, r, i):
            cp.start()

    def wait_dma(buf, r, i):
        for cp in _copies(buf, r, i):
            cp.wait()

    start_dma(0, 0, 0)

    if sinks_ref is not None:
        # gpt_oss learned attention sinks: an extra per-head softmax column
        # with logit sink_h and ZERO value. Initializing the online softmax
        # with m0 = sink, l0 = exp(sink - m0) = 1 is exactly "the sink
        # column was already processed" — acc never sees it (value 0), the
        # denominator does. sinks_ref (nkv*G,) f32 in SMEM, padded group
        # rows carry NEG_INF (their l0=1 is wrong but their outputs are
        # sliced off by the caller).
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
        for g in range(G):
            m0 = jnp.where(g_iota == g, sinks_ref[h * G + g], m0)
        l0 = jnp.ones((G, 1), jnp.float32)
    else:
        m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((G, 1), jnp.float32)
    a0 = jnp.zeros((G, dh), jnp.float32)

    def body(t, carry):
        r, i, m, lacc, acc = carry
        buf = t % 2
        nr, ni = next_ri(r, i)

        @pl.when(t + 1 < total)
        def _():
            start_dma((t + 1) % 2, nr, ni)

        wait_dma(buf, r, i)
        p0, n1, d0, c1_lo, nc1, c2_lo, nc = row_params(r)
        q = q_ref[pl.ds(r, 1)][0, 0].astype(jnp.float32) * scale

        k = k_scr[buf].astype(jnp.float32)  # (bk, dh)
        v = v_scr[buf].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (G, bk)
        if quantized:
            s = s * ks_scr[buf]             # (1, bk) K scales fold into logits
        c = chunk_of(r, i)
        k_pos = c * block_k + jax.lax.broadcasted_iota(jnp.int32, (G, block_k), 1)
        # per-SEGMENT validity, not the union: when d0 is not chunk-aligned
        # (scheduler rows after KV compaction) the prompt's last chunk and
        # the decode range's first chunk can be the SAME chunk, processed
        # twice — a union mask would count its positions twice in the
        # softmax. Each pass admits only its own segment's positions (the
        # segments are disjoint: d0 >= n1 always). Expressed with and/or
        # instead of a select: Mosaic fails to legalize `arith.select` on
        # i1 vectors (measured on v5e: "failed to legalize operation
        # 'arith.select'" with vector<8x128xi1> operands).
        in_prompt_seg = i < nc1  # scalar bool, broadcasts
        valid = ((in_prompt_seg & (k_pos >= p0) & (k_pos < n1))
                 | (~in_prompt_seg & (k_pos >= d0) & (k_pos <= sl)))
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = lacc * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_scr[buf]             # V scales fold into probabilities
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        last = (i + 1) >= nc

        @pl.when(last)
        def _():
            o = (acc_new / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)
            o_ref[pl.ds(r, 1)] = o[None, None]

        # reset accumulators in-register at row boundaries (to the sink
        # inits when sinks are on — every row restarts with the sink column)
        keep = jnp.where(last, 0.0, 1.0)
        m_out = jnp.where(last, m0, m_new)
        l_out = (jnp.where(last, 1.0, l_new) if sinks_ref is not None
                 else l_new * keep)
        return nr, ni, m_out, l_out, acc_new * keep

    jax.lax.fori_loop(0, total, body,
                      (jnp.int32(0), jnp.int32(0), m0, l0, a0))


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_rows", "interpret",
                                    "scale"))
def ragged_decode_attention(
    q: jax.Array,        # (B, nh, dh) current-token queries
    k_cache: jax.Array,  # (L, B, nkv, S, dh) — full stacked decode cache
    v_cache: jax.Array,
    layer: jax.Array,    # scalar — which layer's panels to read
    lens: jax.Array,     # (B,) prompt lengths
    dstart: jax.Array,   # (B,) first decode column (>= lens everywhere)
    slot: jax.Array,     # scalar — latest written column (inclusive)
    cache_scale=None,    # int8 caches: ((L,B,nkv,S) K scales, same for V)
    pstart: jax.Array | None = None,  # (B,) first valid PROMPT slot
    sinks: jax.Array | None = None,   # (nh,) gpt_oss attention-sink logits
    *,
    # default 1024, not 256: the kernel is DMA-ISSUE-bound, not
    # stream-bound (isolated-chain probe, BASELINE.md round-3 session-7:
    # bk 256 -> 1024 cut 253.6 -> 164.2 us/layer-call at the S=4096/B=48
    # geometry; block_rows was within noise). Bigger chunks over-read
    # short ragged spans, but bytes are ~1/10 of the cost at these
    # shapes, so fewer issues win even at W=256 windows.
    block_k: int = 1024,
    block_rows: int = 8,
    interpret: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Returns (B, nh, dh) in q.dtype. Cache slots outside
    [pstart[b], lens[b]) ∪ [dstart[b], slot] are never read (ragged HBM
    savings); ``pstart`` defaults to 0 (full-attention layers).

    Sliding-window layers pass pstart = clip(positions - W + 1, 0, lens)
    and dstart = max(dstart, slot - W + 1) — the window clips both ranges
    and the kernel's traffic drops to O(W) per row (module docstring).
    ``scale`` overrides the 1/sqrt(dh) logit scale (gemma's
    query_pre_attn_scalar).

    ``cache_scale`` switches to int8-cache mode (composes the ragged read
    savings with the int8-KV traffic halving): per-chunk scale rows are
    DMA'd alongside the int8 K/V, the K scale folds into the logits and
    the V scale into the probabilities — same math as the dense int8 path
    in qwen2.decode_step.

    ``sinks`` (nh,) f32: gpt_oss learned per-head attention-sink logits —
    an extra softmax column with logit sink_h and zero value (HF GptOss
    eager_attention_forward; models/qwen2._sink_softmax). Realized by
    INITIALIZING the online softmax with m0 = sink, l0 = 1 per query-group
    row (the sink column pre-processed), so the kernel's chunk walk is
    unchanged. Composes with int8 caches and windowed ranges.

    ``block_rows`` rows share one program (grid B/block_rows × nkv);
    rows padded in (lens=1 stubs) when B isn't a multiple."""
    B, nh, dh = q.shape
    S = k_cache.shape[3]
    nkv = k_cache.shape[2]
    group = nh // nkv
    scale = (1.0 / math.sqrt(dh)) if scale is None else float(scale)
    # largest chunk <= block_k that divides S (multiple of 256 — callers
    # guarantee S % 256 == 0 on TPU; tiny interpret-mode S just uses S):
    # fewer, bigger DMAs (issue-bound kernel). A caller-passed block_k
    # that already divides S on a 128 boundary is honored as-is (e.g.
    # block_k=128 to shrink the double-buffered K/V scratch) — but capped
    # at 2048 so a block_k >= S cannot blow the scoped-VMEM budget with
    # the double-buffered K/V scratch (2 bufs x 2 arrays x bk x dh).
    bk = min(block_k, S, 2048)
    if S > 256 and (S % bk != 0 or bk % 128 != 0):
        bk = 256
        for cand in range(256, min(block_k, S, 2048) + 1, 256):
            if S % cand == 0:
                bk = cand
    assert S % bk == 0, (S, bk)
    NB = max(1, min(block_rows, B))

    qg = q.reshape(B, nkv, group, dh)
    if group < _GPAD:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, _GPAD - group), (0, 0)))
    G = qg.shape[2]

    Bp = ((B + NB - 1) // NB) * NB
    lens_p, dstart_p = lens.astype(jnp.int32), dstart.astype(jnp.int32)
    pstart_p = (jnp.zeros_like(lens_p) if pstart is None
                else pstart.astype(jnp.int32))
    if Bp != B:
        # stub rows: 1-token prompt + dstart aligned to slot's chunk, so
        # each stub walks exactly 2 chunks of dead DMA (chunk 0 for the
        # 1-token prompt, slot's chunk for the decode range) — a dstart of
        # 0 would make the decode range span every chunk up to slot. Their
        # outputs are sliced off below. The CACHE is not padded — stub DMAs
        # clamp to row B-1's panels (pl.ds clamps like dynamic_slice),
        # reading garbage that lands in dropped rows.
        qg = jnp.pad(qg, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        lens_p = jnp.pad(lens_p, (0, Bp - B), constant_values=1)
        pstart_p = jnp.pad(pstart_p, (0, Bp - B))  # stubs: 1-token prompt
        stub_d = (jnp.asarray(slot, jnp.int32) // bk) * bk
        dstart_p = jnp.concatenate(
            [dstart_p, jnp.full((Bp - B,), stub_d, jnp.int32)])

    quantized = cache_scale is not None
    has_sinks = sinks is not None
    if has_sinks:
        # (nh,) -> (nkv, group) -> pad group rows to G with NEG_INF -> flat
        # SMEM prefetch row indexed sinks_flat[h*G + g] in-kernel
        sinks_flat = jnp.pad(
            sinks.astype(jnp.float32).reshape(nkv, group),
            ((0, 0), (0, G - group)), constant_values=NEG_INF).reshape(-1)
    in_specs = [
        pl.BlockSpec((NB, 1, G, dh), lambda pb, h, *_: (pb, h, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, bk, dh), k_cache.dtype),
        pltpu.VMEM((2, bk, dh), v_cache.dtype),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY),
                     pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch += [pltpu.VMEM((2, 1, bk), jnp.float32),
                    pltpu.VMEM((2, 1, bk), jnp.float32)]
    scratch += [pltpu.SemaphoreType.DMA((2, 4 if quantized else 2))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if has_sinks else 5,
        grid=(Bp // NB, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NB, 1, G, dh), lambda pb, h, *_: (pb, h, 0, 0)),
        scratch_shapes=scratch,
    )
    args = [pstart_p, lens_p, dstart_p,
            jnp.asarray(slot, jnp.int32).reshape(1),
            jnp.asarray(layer, jnp.int32).reshape(1)]
    if has_sinks:
        args.append(sinks_flat)
    args += [qg, k_cache, v_cache]
    if quantized:
        L = k_cache.shape[0]
        args += [cache_scale[0].astype(jnp.float32)
                 .reshape(L, B, nkv, S // bk, 1, bk),
                 cache_scale[1].astype(jnp.float32)
                 .reshape(L, B, nkv, S // bk, 1, bk)]
    if quantized:
        kern = _kernel_q8_sink if has_sinks else _kernel_q8
    else:
        kern = _kernel_sink if has_sinks else _kernel
    out = pl.pallas_call(
        functools.partial(kern, block_k=bk, scale=scale, block_rows=NB),
        out_shape=jax.ShapeDtypeStruct((Bp, nkv, G, dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args)

    return out[:B, :, :group].reshape(B, nh, dh)

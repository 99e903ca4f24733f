"""Sequence-parallel Qwen2 forward: context parallelism over a mesh axis.

The reference has NO long-context story beyond left-truncation at
max_model_len (/root/reference/trainer/agent.py:1095-1099; SURVEY §5.7 —
it scales search breadth, not sequence length). This module lifts that
ceiling TPU-natively: the WHOLE decoder stack runs under one ``shard_map``
with the sequence axis sharded across devices, attention is computed with
ring attention (ops/ring_attention.ring_attend_local — K/V blocks rotate
over ICI via ppermute while online-softmax accumulators stay resident),
and everything position-local (norms, projections, MLP, embedding, logits)
needs zero communication. Per-device activation memory is O(T/n) and
attention score memory O((T/n)²) per block, so max trainable context
scales linearly with the ring size.

Composes with data AND tensor parallelism: only the (data?, sequence)
axes are manual (jax.shard_map ``axis_names``); any other mesh axis — a
TP ``model`` axis in particular — stays auto, so TP-sharded parameters
are partitioned by GSPMD inside the shard_map instead of being gathered
replicated per shard. FSDP-sharded params are gathered once per step (the
same traffic FSDP pays anyway). Fully differentiable (the ring is pure
jnp under XLA AD); ``remat=True`` checkpoints per layer exactly like
qwen2._scan_layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ring_attention import ring_attend_local
from .quant import dequant
from .qwen2 import (Qwen2Config, _embed, _layer_body, _layer_params,
                    _lm_head, _mlp, _norm, rms_norm, rope_freqs)


def forward_seq(
    params: dict,
    cfg: Qwen2Config,
    input_ids: jax.Array,              # (B, T), T % mesh.shape[seq_axis] == 0
    attention_mask: jax.Array | None = None,
    *,
    mesh: Mesh,
    seq_axis: str = "sequence",
    data_axis: str = "data",
    remat: bool = False,
    return_hidden: bool = False,
    compute_logits: bool = True,
    return_kv: bool = False,
):
    """Training/prefill forward with the sequence axis sharded over `mesh`.

    Semantics match qwen2.forward's no-cache mode (causal over slot order,
    padding-aware positions via cumsum(mask)-1). Returns
    (logits | None, last_hidden | None, kv | None) with outputs sharded
    P(data?, sequence, ...); ``return_kv=True`` additionally returns the
    per-layer post-RoPE K/V as ``(k, v)`` each (L, B, T, nkv, dh) sharded
    over T — the engine's sequence-sharded prefill uses this to seed a
    slot-sharded decode cache (:func:`decode_step_seq`). For the decode
    step itself see :func:`decode_step_seq`.
    """
    B, T = input_ids.shape
    n = mesh.shape[seq_axis]
    assert T % n == 0, (T, n)
    da = data_axis if (data_axis in mesh.shape
                       and B % mesh.shape[data_axis] == 0) else None

    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    # left-padding friendly positions, computed on the full (cheap) mask
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    cos, sin = rope_freqs(positions, cfg.head_dim_, cfg.rope_theta,
                          cfg.rope_scaling)  # (B,T,dh/2)
    # gemma3 dual rope: windowed (local) layers swap in unscaled
    # rope_local_theta tables — selected per layer by _layer_body off the
    # scanned window width, exactly like qwen2.forward
    rope_loc = (rope_freqs(positions, cfg.head_dim_, cfg.rope_local_theta,
                           ())
                if (cfg.rope_local_theta and cfg.layer_windows) else None)
    # per-layer attention knobs forwarded into the ring (the dense path
    # applies these inside _dispatch_attend, which attend_fn bypasses)
    softcap = float(cfg.attn_softcap or 0.0)
    scale_over = cfg.attn_scale_ if cfg.query_pre_attn_scalar else None
    uniform_w = int(cfg.sliding_window or 0)

    def local(params, ids, mask, cos, sin, cos_loc, sin_loc):
        x = _embed(params, cfg, ids)

        vary = (da, seq_axis) if da else (seq_axis,)

        kv_out = [] if return_kv else None

        def attend(q, k, v, sinks=None, win=None):
            if return_kv:
                kv_out.append((k, v))
            # sliding windows -> banded ring (same index-based rule as
            # qwen2.forward's dense band; out-of-band blocks skip FLOPs).
            # ``win`` is the scanned per-layer width (heterogeneous
            # stacks); None falls back to the uniform config window.
            return ring_attend_local(q, k, v, mask, axis=seq_axis, n=n,
                                     vary_axes=vary,
                                     window=uniform_w if win is None else win,
                                     sinks=sinks, softcap=softcap,
                                     scale=scale_over)

        rl = (cos_loc, sin_loc) if rope_loc is not None else None
        wins = (jnp.asarray(cfg.layer_windows, jnp.int32)
                if cfg.layer_windows else None)
        ropes = (jnp.asarray([1 - f for f in cfg.nope_layers], jnp.int32)
                 if cfg.nope_layers else None)
        assert not (wins is not None and ropes is not None), \
            "layer_windows and nope_layers cannot combine (same rule as " \
            "qwen2._scan_layers)"

        def body(x, pr):
            if wins is not None:
                p, w = pr
                kw = dict(win=w, rope_loc=rl)
            elif ropes is not None:
                p, r = pr
                kw = dict(use_rope=r)
            else:
                p, kw = pr, {}
            (x2, *_), _ = _layer_body(cfg, (x, cos, sin, None, None, None, 0),
                                      p, attend_fn=attend, **kw)
            return x2, None

        if return_kv:
            # unrolled layers so each layer's K/V is captured (scan would
            # hide them in the carry); prefill is one-shot, the compile-size
            # cost is acceptable on the serving path
            x2 = x
            for l in range(cfg.num_hidden_layers):
                p_l = jax.tree.map(lambda w: w[l], params["layers"])
                if wins is not None:
                    x2, _ = body(x2, (p_l, wins[l]))
                elif ropes is not None:
                    x2, _ = body(x2, (p_l, ropes[l]))
                else:
                    x2, _ = body(x2, p_l)
            x = x2
            kstack = jnp.stack([k for k, _ in kv_out])  # (L, B, Tl, nkv, dh)
            vstack = jnp.stack([v for _, v in kv_out])
            h = _norm(x, params["norm"], cfg)
            return h, kstack, vstack
        if remat:
            from .qwen2 import remat_policy

            body = jax.checkpoint(body, prevent_cse=False,
                                  policy=remat_policy(remat))
        xs = (params["layers"] if wins is None and ropes is None else
              (params["layers"], wins if wins is not None else ropes))
        x, _ = jax.lax.scan(body, x, xs)
        return _norm(x, params["norm"], cfg)

    spec2 = P(da, seq_axis)
    spec3 = P(da, seq_axis, None)
    # tiny placeholders keep one shard_map signature when there is no
    # dual-theta rope (never read inside)
    cos_loc, sin_loc = rope_loc if rope_loc is not None else (cos, sin)
    # manual over (data?, sequence) ONLY: any other mesh axis (e.g. a TP
    # `model` axis) stays auto, so TP-sharded params are partitioned by
    # GSPMD inside instead of being gathered replicated per shard
    manual = {seq_axis} | ({da} if da else set())
    if return_kv:
        kv_spec = P(None, da, seq_axis, None, None)
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(), spec2, spec2, spec3, spec3,
                                     spec3, spec3),
                           out_specs=(spec3, kv_spec, kv_spec),
                           axis_names=manual)
        x, kstack, vstack = fn(params, input_ids, attention_mask, cos, sin,
                               cos_loc, sin_loc)
        logits, hidden, _ = _head(params, cfg, x, return_hidden, compute_logits)
        return logits, hidden, (kstack, vstack)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), spec2, spec2, spec3, spec3,
                                 spec3, spec3),
                       out_specs=spec3,
                       axis_names=manual)
    x = fn(params, input_ids, attention_mask, cos, sin, cos_loc, sin_loc)
    return _head(params, cfg, x, return_hidden, compute_logits)


def _head(params, cfg, x, return_hidden, compute_logits):
    """LM head on hidden x (..., H) — shared by forward_seq /
    decode_step_seq. Rides qwen2._lm_head so int8 heads and the gemma2
    final softcap stay in lockstep with the dense path."""
    if not compute_logits:
        return None, (x if return_hidden else None), None
    return _lm_head(params, cfg, x), (x if return_hidden else None), None


def decode_step_seq(
    params: dict,
    cfg: Qwen2Config,
    tok: jax.Array,        # (B,) int32
    positions: jax.Array,  # (B,) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, nkv, S, dh) decode layout, S sharded
    cache_v: jax.Array,
    slot: jax.Array,       # scalar int32 — uniform cache slot for this step
    lens: jax.Array,       # (B,) prompt lengths
    dstart: jax.Array,     # (B,) first valid decode slot per row
    *,
    mesh: Mesh,
    seq_axis: str = "sequence",
    return_hidden: bool = False,
    cache_scale=None,
):
    """One-token decode with the KV cache SHARDED over the ``seq_axis``
    slot dimension — engine-side sequence parallelism.

    Serving contexts whose KV cache exceeds one chip's HBM (the training
    side covers long-context via ring attention in :func:`forward_seq`;
    this covers decode residency): each device holds S/n cache slots, the
    new token's K/V is written only by the owning shard, and attention runs
    as a flash-style distributed softmax — local masked logits → global max
    (``pmax``) → locally rescaled exp-sums and weighted-V partials →
    ``psum`` — so per-step communication is O(B·nh·dh), NOT O(B·nh·S) (what
    GSPMD's all-gather-the-logits lowering would pay). Everything
    position-local (projections, MLP, norms, LM head) is computed
    replicated on every shard: decode is weight-bandwidth-bound and those
    reads are the same whether replicated or not.

    Semantics match qwen2.decode_step exactly (same validity rule
    ``j < lens[b] or dstart[b] <= j <= slot``). ``cache_scale=(ks, vs)``
    (each (L, B, nkv, S) f32, slot-sharded like the caches) switches to the
    int8 KV cache: writes quantize this step's K/V per (b, h) vector on the
    owner shard, reads fold the K scale into the local logits and the V
    scale into the local probabilities — the same math as
    qwen2.decode_step's dense int8 path, distributed. The single-chip
    ragged kernel does not apply here (each shard's panel is dense).

    COMPOSES WITH TENSOR PARALLELISM: only ``seq_axis`` is manual
    (jax.shard_map ``axis_names``); every other mesh axis stays auto, so on
    a (data, model, sequence) mesh with TP-sharded params GSPMD partitions
    the projections/MLP over ``model`` exactly as in the unsharded-decode
    path while the slot axis rides the manual flash-combine.

    Returns (logits (B, V) f32 replicated, hidden|None, cache_k, cache_v)
    — plus the updated ``(ks, vs)`` appended when quantized.

    Every layer structure the single-chip :func:`qwen2.decode_step`
    serves runs here too (the per-layer dispatch is the SAME static
    Python loop): attention sinks fold into the distributed softmax
    (m ← max(m, sink) after the pmax, den += e^{sink−m} after the psum —
    exact, since the sink column's value is zero), heterogeneous
    ``layer_windows`` band each layer's slot validity statically
    (windowed layers keep full-S panels with position-windowed validity —
    the short win_cache is a single-chip residency optimization that does
    not apply when the point of seq-sharding is S exceeding one chip),
    gemma softcap/query-scale/dual-theta rope, olmo2 post-norms +
    full-width qk norms, starcoder2 LayerNorm + plain FFN + o-proj bias,
    and smollm3 per-layer NoPE all ride the shared _norm/_mlp/_embed
    building blocks.
    """
    L = cfg.num_hidden_layers
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    group = nh // nkv
    B = tok.shape[0]
    S = cache_k.shape[3]
    n = mesh.shape[seq_axis]
    assert S % n == 0, (S, n)
    Sl = S // n

    scale = cfg.attn_scale_
    softcap = float(cfg.attn_softcap or 0.0)
    W_layers = [cfg.window_for_layer(l) for l in range(L)]

    cos_g, sin_g = rope_freqs(positions, dh, cfg.rope_theta,
                              cfg.rope_scaling)  # (B, dh/2)
    cos_lg, sin_lg = ((rope_freqs(positions, dh, cfg.rope_local_theta, ()))
                      if (cfg.rope_local_theta and any(W_layers))
                      else (cos_g, sin_g))

    quantized = cache_scale is not None

    def local(params, tok, ck, cv, ks_all, vs_all, cos, sin, cos_lt, sin_lt,
              slot, lens, dstart, positions):
        idx = jax.lax.axis_index(seq_axis)
        owner = slot // Sl
        local_slot = slot - owner * Sl
        own = (idx == owner)
        j_global = idx * Sl + jnp.arange(Sl)[None, :]          # (1, Sl)
        valid = ((j_global < lens[:, None])
                 | ((j_global >= dstart[:, None]) & (j_global <= slot)))  # (B, Sl)
        win_valid = {}
        for Wl in sorted({w for w in W_layers if w}):
            # position-windowed slot validity, the same rule as
            # qwen2.decode_step's win_valid: prompt slot j has position j;
            # decode slot j (one column per step up to `slot`) has position
            # positions[b] - (slot - j)
            win_valid[Wl] = valid & jnp.where(
                j_global < lens[:, None],
                j_global > positions[:, None] - Wl,
                j_global > slot - Wl)

        def rope1(v, c, s_):
            c, s_ = c[:, None, :], s_[:, None, :]
            v1 = v[..., : dh // 2].astype(jnp.float32)
            v2 = v[..., dh // 2 :].astype(jnp.float32)
            return jnp.concatenate([v1 * c - v2 * s_, v2 * c + v1 * s_],
                                   -1).astype(v.dtype)

        x = _embed(params, cfg, tok)

        def proj(h, w, b=None):
            y = jnp.einsum("bh,hd->bd", h, dequant(w, h.dtype),
                           preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(h.dtype)

        for l in range(L):
            Wl = W_layers[l]
            p = _layer_params(params, l)
            sinks_l = p["attn"]["sinks"] if cfg.attn_sinks else None
            cos_l, sin_l = ((cos_lt, sin_lt)
                            if (Wl and cfg.rope_local_theta) else (cos, sin))
            h = (x if cfg.post_norms_only
                 else _norm(x, p["input_layernorm"], cfg))
            q = proj(h, p["attn"]["q_proj"]["w"], p["attn"]["q_proj"]["b"])
            k = proj(h, p["attn"]["k_proj"]["w"], p["attn"]["k_proj"]["b"])
            v = proj(h, p["attn"]["v_proj"]["w"],
                     p["attn"]["v_proj"]["b"]).reshape(B, nkv, dh)
            if cfg.qk_norm_full:  # olmo2: full projection width
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            q, k = q.reshape(B, nh, dh), k.reshape(B, nkv, dh)
            if cfg.qk_norm:
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            if not (cfg.nope_layers and cfg.nope_layers[l]):  # static skip
                q, k = rope1(q, cos_l, sin_l), rope1(k, cos_l, sin_l)

            # only the owner shard keeps the new K/V at its local column
            if quantized:
                def q8(y):  # (B, nkv, dh) -> int8 + (B, nkv) scale
                    yf = y.astype(jnp.float32)
                    s_ = jnp.maximum(jnp.max(jnp.abs(yf), axis=-1) / 127.0,
                                     1e-12)
                    return (jnp.clip(jnp.round(yf / s_[..., None]), -127, 127)
                            .astype(jnp.int8), s_)

                k, sk = q8(k)
                v, sv = q8(v)
                old_sk = jax.lax.dynamic_slice(ks_all, (l, 0, 0, local_slot),
                                               (1, B, nkv, 1))
                old_sv = jax.lax.dynamic_slice(vs_all, (l, 0, 0, local_slot),
                                               (1, B, nkv, 1))
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, jnp.where(own, sk[None, :, :, None], old_sk),
                    (l, 0, 0, local_slot))
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, jnp.where(own, sv[None, :, :, None], old_sv),
                    (l, 0, 0, local_slot))
            old_k = jax.lax.dynamic_slice(ck, (l, 0, 0, local_slot, 0),
                                          (1, B, nkv, 1, dh))
            old_v = jax.lax.dynamic_slice(cv, (l, 0, 0, local_slot, 0),
                                          (1, B, nkv, 1, dh))
            wk = jnp.where(own, k[None, :, :, None, :], old_k)
            wv = jnp.where(own, v[None, :, :, None, :], old_v)
            ck = jax.lax.dynamic_update_slice(ck, wk, (l, 0, 0, local_slot, 0))
            cv = jax.lax.dynamic_update_slice(cv, wv, (l, 0, 0, local_slot, 0))

            # flash-style distributed softmax over the sharded slot axis
            k_loc, v_loc = ck[l], cv[l]                      # (B, nkv, Sl, dh)
            qg = q.reshape(B, nkv, group, dh)
            if quantized:  # int8 reads: cast in registers, fold scales
                att = jnp.einsum("bkgd,bksd->bkgs", qg, k_loc.astype(x.dtype),
                                 preferred_element_type=jnp.float32) * scale
                att = att * ks_all[l][:, :, None, :]
            else:
                att = jnp.einsum("bkgd,bksd->bkgs", qg, k_loc,
                                 preferred_element_type=jnp.float32) * scale
            if softcap:  # gemma2 (true logits: after the k-scale fold)
                att = jnp.tanh(att / softcap) * softcap
            vl = win_valid[Wl] if Wl else valid
            att = jnp.where(vl[:, None, None, :], att, -jnp.inf)
            m_loc = jnp.max(att, axis=-1)                    # (B, nkv, g)
            m = jax.lax.pmax(m_loc, seq_axis)
            if sinks_l is not None:
                # gpt_oss sink: extra softmax column with logit sink_h and
                # zero value — global max includes it, denominator adds
                # e^{sink-m} ONCE (after the psum; every shard computes the
                # same fold from the same replicated m and sink)
                sk_h = sinks_l.astype(jnp.float32).reshape(nkv, group)[None]
                m = jnp.maximum(m, sk_h)
            # guard rows with no valid local slot: exp(-inf - m) -> 0
            pexp = jnp.exp(att - m[..., None])
            pexp = jnp.where(vl[:, None, None, :], pexp, 0.0)
            den = jax.lax.psum(jnp.sum(pexp, axis=-1), seq_axis)   # (B,nkv,g)
            if sinks_l is not None:
                den = den + jnp.exp(sk_h - m)
            if quantized:
                pv = (pexp * vs_all[l][:, :, None, :]).astype(x.dtype)
                num = jax.lax.psum(
                    jnp.einsum("bkgs,bksd->bkgd", pv, v_loc.astype(x.dtype),
                               preferred_element_type=jnp.float32), seq_axis)
            else:
                num = jax.lax.psum(
                    jnp.einsum("bkgs,bksd->bkgd", pexp.astype(v_loc.dtype), v_loc,
                               preferred_element_type=jnp.float32), seq_axis)
            o = (num / jnp.maximum(den, 1e-30)[..., None]).reshape(B, nh * dh)
            att_out = proj(o.astype(x.dtype), p["attn"]["o_proj"]["w"],
                           p["attn"]["o_proj"]["b"] if cfg.o_proj_bias
                           else None)

            if cfg.sandwich_norms:  # gemma: norm sublayer outputs too
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                h2 = _norm(x, p["pre_feedforward_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, h2),
                              p["post_feedforward_layernorm"], cfg)
            elif cfg.post_norms_only:  # olmo2: norm sublayer outputs ONLY
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, x),
                              p["post_feedforward_layernorm"], cfg)
            else:
                x = x + att_out
                h2 = _norm(x, p["post_attention_layernorm"], cfg)
                x = x + _mlp(cfg, p, h2)

        x = _norm(x, params["norm"], cfg)
        return x, ck, cv, ks_all, vs_all

    cache_spec = P(None, None, None, seq_axis, None)
    scale_spec = P(None, None, None, seq_axis)
    if quantized:
        ks_in, vs_in = cache_scale
    else:  # tiny placeholders keep one shard_map signature (never read)
        ks_in = jnp.zeros((1, 1, 1, n), jnp.float32)
        vs_in = ks_in
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), cache_spec, cache_spec,
                                 scale_spec, scale_spec,
                                 P(), P(), P(), P(), P(), P(), P(), P()),
                       out_specs=(P(), cache_spec, cache_spec,
                                  scale_spec, scale_spec),
                       axis_names={seq_axis})
    x, cache_k, cache_v, ks_out, vs_out = fn(
        params, tok, cache_k, cache_v, ks_in, vs_in,
        cos_g, sin_g, cos_lg, sin_lg, jnp.asarray(slot, jnp.int32), lens,
        dstart, jnp.asarray(positions, jnp.int32))
    logits, hidden, _ = _head(params, cfg, x, return_hidden, True)
    if quantized:
        return logits, hidden, cache_k, cache_v, (ks_out, vs_out)
    return logits, hidden, cache_k, cache_v


def suffix_seq(
    params: dict,
    cfg: Qwen2Config,
    ids: jax.Array,        # (B, T) right-padded suffix tokens
    mask: jax.Array,       # (B, T) suffix validity
    starts: jax.Array,     # (B,) reused-prefix length per row
    cache_k: jax.Array,    # (L, B, S, nkv, dh) PREFILL layout, S sharded
    cache_v: jax.Array,
    *,
    mesh: Mesh,
    seq_axis: str = "sequence",
    return_hidden: bool = False,
):
    """Cached suffix prefill with the KV cache SHARDED over ``seq_axis`` —
    prefix-KV reuse under engine-side sequence parallelism.

    The T-token generalization of :func:`decode_step_seq`'s distributed
    softmax: row b's reused prefix KV already sits at cache columns
    [0, starts[b]); the suffix K/V are written into columns
    [starts[b], starts[b]+T) on their OWNER shards (each local column c
    gathers its token via j_global - starts[b]); attention computes local
    masked logits over each shard's (B, T, Sl) panel and combines with the
    flash-style pmax/psum reduction, so per-device attention work is
    O(B·T·S/n) and per-layer communication O(B·nh·T·dh). Validity for
    suffix query t is ``j_global <= starts[b] + t`` (the prefix region
    [0, starts) is content-valid by the reuse contract; suffix columns at
    or below the query's own are written by construction), banded by the
    uniform ``cfg.sliding_window`` when set — exactly
    engine._suffix_batch_impl's ``kv_valid``/causal semantics distributed.

    Projections/MLP/norms are computed replicated on every shard (same
    trade as decode_step_seq: the MCTS reuse niche has SHORT suffixes over
    LONG shared prefixes, so the sharded attention panel is the cost that
    matters). Returns (last-token hidden pre-head logits are NOT computed
    here) — concretely ``(logits (B, T, V) f32, hidden (B, T, H) | None,
    (cache_k, cache_v))`` matching qwen2.forward's cached mode so the
    engine's suffix path is a drop-in dispatch.

    Layer-structure coverage matches :func:`decode_step_seq` (same static
    per-layer dispatch): sinks, heterogeneous windows, gemma softcap/
    scale/dual rope, olmo2/starcoder2/smollm3 bodies.
    """
    L = cfg.num_hidden_layers
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    group = nh // nkv
    B, T = ids.shape
    S = cache_k.shape[2]
    n = mesh.shape[seq_axis]
    assert S % n == 0, (S, n)
    Sl = S // n

    scale = cfg.attn_scale_
    softcap = float(cfg.attn_softcap or 0.0)
    W_layers = [cfg.window_for_layer(l) for l in range(L)]

    positions = starts[:, None] + jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    cos_g, sin_g = rope_freqs(positions, dh, cfg.rope_theta,
                              cfg.rope_scaling)  # (B, T, dh/2)
    cos_lg, sin_lg = ((rope_freqs(positions, dh, cfg.rope_local_theta, ()))
                      if (cfg.rope_local_theta and any(W_layers))
                      else (cos_g, sin_g))

    def local(params, ids, mask, starts, ck, cv, cos, sin, cos_lt, sin_lt):
        idx = jax.lax.axis_index(seq_axis)
        j_global = idx * Sl + jnp.arange(Sl)                    # (Sl,)
        # which suffix token (if any) each local column receives
        t_of_col = j_global[None, :] - starts[:, None]          # (B, Sl)
        col_written = (t_of_col >= 0) & (t_of_col < T)
        t_idx = jnp.clip(t_of_col, 0, T - 1)
        # query validity over local columns: j <= starts[b] + t
        q_t = jnp.arange(T)
        q_slot = (starts[:, None] + q_t[None, :])[:, :, None]   # (B,T,1)
        valid = j_global[None, None, :] <= q_slot               # (B,T,Sl)
        win_valid = {}
        for Wl in sorted({w for w in W_layers if w}):
            win_valid[Wl] = valid & (j_global[None, None, :] > q_slot - Wl)

        def ropeT(v, c, s_):
            c, s_ = c[:, :, None, :], s_[:, :, None, :]
            v1 = v[..., : dh // 2].astype(jnp.float32)
            v2 = v[..., dh // 2 :].astype(jnp.float32)
            return jnp.concatenate([v1 * c - v2 * s_, v2 * c + v1 * s_],
                                   -1).astype(v.dtype)

        x = _embed(params, cfg, ids)

        def proj(h, w, b=None):
            y = jnp.einsum("bth,hd->btd", h, dequant(w, h.dtype),
                           preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(h.dtype)

        for l in range(L):
            Wl = W_layers[l]
            p = _layer_params(params, l)
            sinks_l = p["attn"]["sinks"] if cfg.attn_sinks else None
            cos_l, sin_l = ((cos_lt, sin_lt)
                            if (Wl and cfg.rope_local_theta) else (cos, sin))
            h = (x if cfg.post_norms_only
                 else _norm(x, p["input_layernorm"], cfg))
            q = proj(h, p["attn"]["q_proj"]["w"], p["attn"]["q_proj"]["b"])
            k = proj(h, p["attn"]["k_proj"]["w"], p["attn"]["k_proj"]["b"])
            v = proj(h, p["attn"]["v_proj"]["w"],
                     p["attn"]["v_proj"]["b"]).reshape(B, T, nkv, dh)
            if cfg.qk_norm_full:  # olmo2: full projection width
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            q = q.reshape(B, T, nh, dh)
            k = k.reshape(B, T, nkv, dh)
            if cfg.qk_norm:
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            if not (cfg.nope_layers and cfg.nope_layers[l]):  # static skip
                q, k = ropeT(q, cos_l, sin_l), ropeT(k, cos_l, sin_l)

            # owner-shard writes: local column c takes suffix token t_of_col
            k_wr = jnp.take_along_axis(k, t_idx[:, :, None, None], axis=1)
            v_wr = jnp.take_along_axis(v, t_idx[:, :, None, None], axis=1)
            wr = col_written[:, :, None, None]
            k_loc = jnp.where(wr, k_wr.astype(ck.dtype), ck[l])
            v_loc = jnp.where(wr, v_wr.astype(cv.dtype), cv[l])
            ck = ck.at[l].set(k_loc)
            cv = cv.at[l].set(v_loc)

            # distributed softmax over the sharded panel
            qg = q.reshape(B, T, nkv, group, dh)
            att = jnp.einsum("btkgd,bskd->bkgts", qg,
                             k_loc.astype(x.dtype),
                             preferred_element_type=jnp.float32) * scale
            if softcap:  # gemma2
                att = jnp.tanh(att / softcap) * softcap
            vl = win_valid[Wl] if Wl else valid
            att = jnp.where(vl[:, None, None, :, :], att, -jnp.inf)
            m_loc = jnp.max(att, axis=-1)                     # (B,nkv,g,T)
            m = jax.lax.pmax(m_loc, seq_axis)
            if sinks_l is not None:  # same fold as decode_step_seq
                sk_h = sinks_l.astype(jnp.float32).reshape(
                    nkv, group)[None, :, :, None]
                m = jnp.maximum(m, sk_h)
            pexp = jnp.exp(att - m[..., None])
            pexp = jnp.where(vl[:, None, None, :, :], pexp, 0.0)
            den = jax.lax.psum(jnp.sum(pexp, axis=-1), seq_axis)
            if sinks_l is not None:
                den = den + jnp.exp(sk_h - m)
            num = jax.lax.psum(
                jnp.einsum("bkgts,bskd->btkgd", pexp.astype(v_loc.dtype),
                           v_loc, preferred_element_type=jnp.float32),
                seq_axis)
            o = (num / jnp.maximum(den, 1e-30)[..., None].transpose(
                0, 3, 1, 2, 4)).reshape(B, T, nh * dh)
            att_out = proj(o.astype(x.dtype), p["attn"]["o_proj"]["w"],
                           p["attn"]["o_proj"]["b"] if cfg.o_proj_bias
                           else None)

            if cfg.sandwich_norms:  # gemma
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                h2 = _norm(x, p["pre_feedforward_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, h2),
                              p["post_feedforward_layernorm"], cfg)
            elif cfg.post_norms_only:  # olmo2
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, x),
                              p["post_feedforward_layernorm"], cfg)
            else:
                x = x + att_out
                h2 = _norm(x, p["post_attention_layernorm"], cfg)
                x = x + _mlp(cfg, p, h2)

        x = _norm(x, params["norm"], cfg)
        return x, ck, cv

    cache_spec = P(None, None, seq_axis, None, None)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P(), P(), cache_spec, cache_spec,
                                 P(), P(), P(), P()),
                       out_specs=(P(), cache_spec, cache_spec),
                       axis_names={seq_axis})
    x, cache_k, cache_v = fn(params, ids, mask, starts, cache_k, cache_v,
                             cos_g, sin_g, cos_lg, sin_lg)
    logits, hidden, _ = _head(params, cfg, x, return_hidden, True)
    return logits, hidden, (cache_k, cache_v)


def decode_step_multi_seq(
    params: dict,
    cfg: Qwen2Config,
    toks: jax.Array,       # (B, T) int32 — [last_emitted, draft_1..draft_{T-1}]
    positions: jax.Array,  # (B, T) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, nkv, S, dh) decode layout, S sharded
    cache_v: jax.Array,
    slot: jax.Array,       # scalar int32 — first cache column for this block
    valid_map: jax.Array,  # (B, S) bool — stored-KV validity bitmap, S sharded
    return_hidden: bool = False,
    cache_scale=None,      # (ks, vs) each (L, B, nkv, S) f32, S sharded
    pos_map: jax.Array | None = None,  # (B, S) int32 — stored-KV positions
    *,
    mesh: Mesh,
    seq_axis: str = "sequence",
):
    """T-token speculative-decoding verify step with the KV cache SHARDED
    over ``seq_axis`` — spec decode under engine-side sequence parallelism.

    The seq-sharded analogue of :func:`qwen2.decode_step_multi`: same
    signature (plus the mesh kwargs), same semantics — the engine's spec
    loop (engine._decode_spec_impl) dispatches here unchanged when
    ``Engine(seq_mesh=…, spec_decode="pld")``. Structure combines
    :func:`suffix_seq`'s T-token owner-shard writes (each local column c
    with global slot ``idx·Sl + c`` in [slot, slot+T) gathers its token's
    K/V via ``j_global − slot``; the spec block is slot-uniform so the map
    is row-independent) with :func:`decode_step_multi`'s per-row validity
    BITMAP (rejected-draft columns are permanent holes — each shard sees
    its local (B, Sl) slice via shard_map in_specs) and per-column
    position map (windowed stacks band by STORED position, not column).
    Attention is the flash-style distributed softmax of
    :func:`decode_step_seq` with a T query dim: local masked logits →
    ``pmax`` → rescaled exp-sums / weighted-V partials → ``psum`` —
    per-layer comms O(B·nh·T·dh), never O(B·nh·S).

    Layer-structure coverage matches the single-chip verify forward:
    attention sinks (denominator fold after the psum), heterogeneous
    ``layer_windows`` (position-banded via pos_map), gemma sandwich
    norms / softcaps / dual-theta rope, olmo2 / starcoder2 / smollm3
    bodies, int8 KV (``cache_scale`` planes shard with the slots; the T
    new vectors quantize identically on every shard, each shard writes
    only its owned columns).

    Returns (logits (B, T, V) f32 replicated, hidden|None, cache_k,
    cache_v) — plus the updated ``(ks, vs)`` appended when quantized.
    """
    L = cfg.num_hidden_layers
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    group = nh // nkv
    B, T = toks.shape
    S = cache_k.shape[3]
    n = mesh.shape[seq_axis]
    assert S % n == 0, (S, n)
    Sl = S // n
    assert T <= Sl, (
        f"spec window T={T} exceeds per-shard slots Sl={Sl}; "
        f"lower spec_k or the sequence-shard count")

    scale = cfg.attn_scale_
    softcap = float(cfg.attn_softcap or 0.0)
    W_layers = [cfg.window_for_layer(l) for l in range(L)]

    cos_g, sin_g = rope_freqs(positions, dh, cfg.rope_theta,
                              cfg.rope_scaling)  # (B, T, dh/2)
    cos_lg, sin_lg = ((rope_freqs(positions, dh, cfg.rope_local_theta, ()))
                      if (cfg.rope_local_theta and any(W_layers))
                      else (cos_g, sin_g))

    quantized = cache_scale is not None
    if pos_map is None:  # unwindowed standalone use; never read when all
        # layers are full-attention (masked by valid)
        pos_map = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))

    def local(params, toks, ck, cv, ks_all, vs_all, cos, sin, cos_lt,
              sin_lt, slot, valid_loc, posm_loc, positions):
        idx = jax.lax.axis_index(seq_axis)
        j_global = idx * Sl + jnp.arange(Sl)          # (Sl,)
        # which new token (if any) each local column receives — the spec
        # block is slot-uniform, so the map is row-independent
        t_of_col = j_global - slot                    # (Sl,)
        col_written = (t_of_col >= 0) & (t_of_col < T)
        t_idx = jnp.clip(t_of_col, 0, T - 1)
        # query i additionally attends causally to new columns j <= i
        causal_new = ((t_of_col[None, :] >= 0)
                      & (t_of_col[None, :] <= jnp.arange(T)[:, None]))  # (T,Sl)
        valid = valid_loc[:, None, :] | causal_new[None]  # (B, T, Sl)
        win_valid = {}
        if any(W_layers):
            # per-column key positions: stored columns from the engine's
            # pos_map, this block's new columns from `positions`
            new_pos = jnp.take_along_axis(
                positions, jnp.broadcast_to(t_idx[None, :], (B, Sl)), axis=1)
            pos_col = jnp.where(col_written[None, :], new_pos, posm_loc)
            for Wl in sorted({w for w in W_layers if w}):
                win_valid[Wl] = valid & (
                    pos_col[:, None, :] > positions[:, :, None] - Wl)

        def ropeT(v, c, s_):
            c, s_ = c[:, :, None, :], s_[:, :, None, :]
            v1 = v[..., : dh // 2].astype(jnp.float32)
            v2 = v[..., dh // 2 :].astype(jnp.float32)
            return jnp.concatenate([v1 * c - v2 * s_, v2 * c + v1 * s_],
                                   -1).astype(v.dtype)

        x = _embed(params, cfg, toks)  # (B, T, H)

        def proj(h, w, b=None):
            y = jnp.einsum("bth,hd->btd", h, dequant(w, h.dtype),
                           preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(h.dtype)

        for l in range(L):
            Wl = W_layers[l]
            p = _layer_params(params, l)
            sinks_l = p["attn"]["sinks"] if cfg.attn_sinks else None
            cos_l, sin_l = ((cos_lt, sin_lt)
                            if (Wl and cfg.rope_local_theta) else (cos, sin))
            h = (x if cfg.post_norms_only
                 else _norm(x, p["input_layernorm"], cfg))
            q = proj(h, p["attn"]["q_proj"]["w"], p["attn"]["q_proj"]["b"])
            k = proj(h, p["attn"]["k_proj"]["w"], p["attn"]["k_proj"]["b"])
            v = proj(h, p["attn"]["v_proj"]["w"],
                     p["attn"]["v_proj"]["b"]).reshape(B, T, nkv, dh)
            if cfg.qk_norm_full:  # olmo2: full projection width
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            q = q.reshape(B, T, nh, dh)
            k = k.reshape(B, T, nkv, dh)
            if cfg.qk_norm:  # qwen3 / gemma3
                q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
            if not (cfg.nope_layers and cfg.nope_layers[l]):  # static skip
                q, k = ropeT(q, cos_l, sin_l), ropeT(k, cos_l, sin_l)

            # owner-shard writes: local column c takes new token t_of_col[c]
            if quantized:
                def q8(y):  # (B, T, nkv, dh) -> int8 + (B, T, nkv) scale
                    yf = y.astype(jnp.float32)
                    s_ = jnp.maximum(jnp.max(jnp.abs(yf), axis=-1) / 127.0,
                                     1e-12)
                    return (jnp.clip(jnp.round(yf / s_[..., None]), -127, 127)
                            .astype(jnp.int8), s_)

                k, sk = q8(k)
                v, sv = q8(v)
                # scale rows: (B, T, nkv) -> per local column (B, nkv, Sl)
                sk_col = jnp.transpose(jnp.take(sk, t_idx, axis=1), (0, 2, 1))
                sv_col = jnp.transpose(jnp.take(sv, t_idx, axis=1), (0, 2, 1))
                wrs = col_written[None, None, :]
                ks_all = ks_all.at[l].set(
                    jnp.where(wrs, sk_col, ks_all[l]))
                vs_all = vs_all.at[l].set(
                    jnp.where(wrs, sv_col, vs_all[l]))
            k_col = jnp.transpose(jnp.take(k, t_idx, axis=1), (0, 2, 1, 3))
            v_col = jnp.transpose(jnp.take(v, t_idx, axis=1), (0, 2, 1, 3))
            wr = col_written[None, None, :, None]
            k_loc = jnp.where(wr, k_col.astype(ck.dtype), ck[l])
            v_loc = jnp.where(wr, v_col.astype(cv.dtype), cv[l])
            ck = ck.at[l].set(k_loc)
            cv = cv.at[l].set(v_loc)

            # flash-style distributed softmax, T query columns
            qg = q.reshape(B, T, nkv, group, dh)
            if quantized:  # int8 reads: cast in registers, fold scales
                att = jnp.einsum("btkgd,bksd->bktgs", qg,
                                 k_loc.astype(x.dtype),
                                 preferred_element_type=jnp.float32) * scale
                att = att * ks_all[l][:, :, None, None, :]
            else:
                att = jnp.einsum("btkgd,bksd->bktgs", qg, k_loc,
                                 preferred_element_type=jnp.float32) * scale
            if softcap:  # gemma2 (true logits: after the k-scale fold)
                att = jnp.tanh(att / softcap) * softcap
            vl = win_valid[Wl] if Wl else valid
            att = jnp.where(vl[:, None, :, None, :], att, -jnp.inf)
            m_loc = jnp.max(att, axis=-1)                 # (B, nkv, T, g)
            m = jax.lax.pmax(m_loc, seq_axis)
            if sinks_l is not None:  # same fold as decode_step_seq
                sk_h = sinks_l.astype(jnp.float32).reshape(
                    nkv, group)[None, :, None, :]
                m = jnp.maximum(m, sk_h)
            pexp = jnp.exp(att - m[..., None])
            pexp = jnp.where(vl[:, None, :, None, :], pexp, 0.0)
            den = jax.lax.psum(jnp.sum(pexp, axis=-1), seq_axis)
            if sinks_l is not None:
                den = den + jnp.exp(sk_h - m)
            if quantized:
                pv = (pexp * vs_all[l][:, :, None, None, :]).astype(x.dtype)
                num = jax.lax.psum(
                    jnp.einsum("bktgs,bksd->bktgd", pv,
                               v_loc.astype(x.dtype),
                               preferred_element_type=jnp.float32), seq_axis)
            else:
                num = jax.lax.psum(
                    jnp.einsum("bktgs,bksd->bktgd", pexp.astype(v_loc.dtype),
                               v_loc, preferred_element_type=jnp.float32),
                    seq_axis)
            o = num / jnp.maximum(den, 1e-30)[..., None]  # (B, nkv, T, g, dh)
            o = jnp.transpose(o, (0, 2, 1, 3, 4)).reshape(B, T, nh * dh)
            att_out = proj(o.astype(x.dtype), p["attn"]["o_proj"]["w"],
                           p["attn"]["o_proj"]["b"] if cfg.o_proj_bias
                           else None)

            if cfg.sandwich_norms:  # gemma
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                h2 = _norm(x, p["pre_feedforward_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, h2),
                              p["post_feedforward_layernorm"], cfg)
            elif cfg.post_norms_only:  # olmo2
                x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
                x = x + _norm(_mlp(cfg, p, x),
                              p["post_feedforward_layernorm"], cfg)
            else:
                x = x + att_out
                h2 = _norm(x, p["post_attention_layernorm"], cfg)
                x = x + _mlp(cfg, p, h2)

        x = _norm(x, params["norm"], cfg)
        return x, ck, cv, ks_all, vs_all

    cache_spec = P(None, None, None, seq_axis, None)
    scale_spec = P(None, None, None, seq_axis)
    map_spec = P(None, seq_axis)
    if quantized:
        ks_in, vs_in = cache_scale
    else:  # tiny placeholders keep one shard_map signature (never read)
        ks_in = jnp.zeros((1, 1, 1, n), jnp.float32)
        vs_in = ks_in
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), cache_spec, cache_spec,
                                 scale_spec, scale_spec,
                                 P(), P(), P(), P(), P(),
                                 map_spec, map_spec, P()),
                       out_specs=(P(), cache_spec, cache_spec,
                                  scale_spec, scale_spec),
                       axis_names={seq_axis})
    x, cache_k, cache_v, ks_out, vs_out = fn(
        params, toks, cache_k, cache_v, ks_in, vs_in,
        cos_g, sin_g, cos_lg, sin_lg, jnp.asarray(slot, jnp.int32),
        valid_map, pos_map, jnp.asarray(positions, jnp.int32))
    logits, hidden, _ = _head(params, cfg, x, return_hidden, True)
    if quantized:
        return logits, hidden, cache_k, cache_v, (ks_out, vs_out)
    return logits, hidden, cache_k, cache_v

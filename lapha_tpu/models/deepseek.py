"""DeepSeek-V2/V3 decoder family — Multi-head Latent Attention, TPU-first.

Model-family widening beyond the reference (which serves only dense
Qwen2.5 via HF AutoModel, /root/reference/trainer/mtpo_trainer.py:643-663).
DeepSeek's MLA compresses the per-token KV state into ONE shared latent
vector (kv_lora_rank + qk_rope_head_dim floats, e.g. 576 for V3) instead
of per-head K/V (nh * (qk_head_dim + v_head_dim)) — the decode cache
shrinks ~10-50x and, on TPU, decode attention becomes two large
MXU-friendly matmuls over a single MQA-style cache stream instead of nh
grouped reads:

    scores_h = (W_UK,h^T q_nope,h) . c  +  q_pe,h . k_pe      (absorbed)
    out_h    = W_UV,h (sum_s attn_s c_s)

(the "weight absorption" identity: K_h = W_UK,h c and V_h = W_UV,h c are
never materialized at decode time). Prefill/training expand K/V per head
exactly like HF's eager path and reuse the Pallas flash kernel with V
padded to qk_head_dim (HF flash does the same pad,
modeling_deepseek_v2.py DeepseekV2Attention.forward).

Structure notes vs the qwen2 module: DeepSeek stacks are heterogeneous —
the first ``first_k_dense_replace`` layers use a dense SwiGLU MLP, the
rest the DeepSeek MoE block (n_routed_experts + n_shared_experts plain
shared MLP, grouped/sigmoid routing — ops/moe.route_deepseek). The
params pytree therefore holds TWO uniformly-stacked layer groups
("dense_layers", "moe_layers") scanned in sequence; decode unrolls both.

HF semantics mirrored from transformers 4.57 modeling_deepseek_v2/_v3
(the parity references in tests/test_deepseek.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .quant import dequant, is_quantized
from .qwen2 import (Qwen2Config, rms_norm, rope_freqs, apply_rope,
                    cached_key_mask)


@dataclasses.dataclass(frozen=True)
class DeepseekConfig:
    """Static (jit-hashable) DeepSeek-V2/V3 architecture description."""

    vocab_size: int = 102400
    hidden_size: int = 2048
    intermediate_size: int = 10944     # dense-layer MLP width
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    # ---- MLA ----
    q_lora_rank: int = 0               # 0 = full q_proj (V2-Lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_interleave: bool = True       # V2 always; V3 config flag
    # ---- rope ----
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rope_scaling: tuple = ()           # Qwen2Config._parse_rope_scaling tuple
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    # ---- MoE ----
    n_routed_experts: int = 0          # 0 = fully dense model
    num_experts_per_tok: int = 6
    moe_intermediate_size: int = 1408
    n_shared_experts: int = 2          # shared MLP width = n * moe_inter
    first_k_dense_replace: int = 1
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"        # greedy|group_limited_greedy|noaux_tc
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = False
    scoring_func: str = "softmax"      # softmax (V2) | sigmoid (V3)
    moe_impl: str = "auto"             # ops/moe.py exec strategy
    moe_capacity_factor: float = 2.0
    attn_impl: str = "auto"            # auto | pallas | dense
    dtype: Any = jnp.bfloat16

    # duck-typed knobs qwen2._embed/_lm_head and the Engine read (inert
    # here; plain class attributes, deliberately NOT dataclass fields)
    embed_normalizer = False
    final_softcap = 0.0
    sliding_window = 0
    layer_windows = ()
    max_window_ = 0

    def window_for_layer(self, l: int) -> int:
        return 0

    @property
    def num_key_value_heads(self) -> int:
        """MLA's latent cache is MQA-shaped: ONE shared 'head' per layer.
        The Engine reads this (with :attr:`head_dim_`) only for cache
        allocation/layout math, which is exactly right for the latent."""
        return 1

    @property
    def head_dim_(self) -> int:
        """Engine-facing cache vector width (see num_key_value_heads)."""
        return self.cache_width_

    @property
    def qk_head_dim_(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def cache_width_(self) -> int:
        """Latent decode-cache width per token per layer: the normed
        compressed KV plus the shared roped key."""
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def num_dense_layers_(self) -> int:
        if self.n_routed_experts <= 0:
            return self.num_hidden_layers
        return min(self.first_k_dense_replace, self.num_hidden_layers)

    @property
    def num_moe_layers_(self) -> int:
        return self.num_hidden_layers - self.num_dense_layers_

    # V3 YaRN softmax-scale correction: HF DeepseekV3Attention multiplies
    # the 1/sqrt(qk_head_dim) scale by yarn_get_mscale(factor,
    # mscale_all_dim)^2 when rope_scaling sets mscale_all_dim (the HF V2
    # port does NOT — mirrored per family in from_hf). 1.0 = no scaling.
    attn_mscale_sq: float = 1.0

    @property
    def attn_scale_(self) -> float:
        return self.attn_mscale_sq / math.sqrt(self.qk_head_dim_)

    @classmethod
    def from_hf(cls, cfg: dict, dtype=jnp.bfloat16) -> "DeepseekConfig":
        """Build from an HF config.json dict (model_type deepseek_v2 or
        deepseek_v3). Rope scaling reuses Qwen2Config's parser — DeepSeek
        long-context checkpoints use YaRN with mscale/mscale_all_dim,
        which resolve into the ("yarn", ...) tuple's attention factor."""
        mt = cfg.get("model_type", "deepseek_v2")
        if mt not in ("deepseek_v2", "deepseek_v3"):
            raise ValueError(f"not a deepseek config: model_type={mt!r}")
        v3 = mt == "deepseek_v3"
        # HF DeepseekV3Attention: scaling *= yarn_get_mscale(factor,
        # mscale_all_dim)^2 when rope_scaling sets mscale_all_dim (real
        # V3/R1 checkpoints: factor 40, mscale_all_dim 1.0 -> ~1.87x).
        # The HF V2 port applies no such factor — mirrored per family.
        mscale_sq = 1.0
        rs = cfg.get("rope_scaling") or {}
        if v3 and rs.get("mscale_all_dim"):
            f = float(rs["factor"])
            ms = (0.1 * float(rs["mscale_all_dim"]) * math.log(f) + 1.0
                  if f > 1 else 1.0)
            mscale_sq = ms * ms
        n_routed = int(cfg.get("n_routed_experts") or 0)
        if cfg.get("attention_bias", False):
            raise ValueError("deepseek attention_bias=True is not supported "
                             "(no released checkpoint sets it)")
        if int(cfg.get("moe_layer_freq", 1) or 1) != 1:
            raise ValueError("moe_layer_freq != 1 is not supported (MoE "
                             "layers must be the contiguous suffix)")
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            q_lora_rank=int(cfg.get("q_lora_rank") or 0),
            kv_lora_rank=cfg["kv_lora_rank"],
            qk_nope_head_dim=cfg["qk_nope_head_dim"],
            qk_rope_head_dim=cfg["qk_rope_head_dim"],
            v_head_dim=cfg["v_head_dim"],
            # HF V2 ropes with complex pair math (= interleaved); V3 has
            # the flag (default True)
            rope_interleave=bool(cfg.get("rope_interleave", True)),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=Qwen2Config._parse_rope_scaling(cfg),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            n_routed_experts=n_routed,
            num_experts_per_tok=int(cfg.get("num_experts_per_tok") or 6),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 1408),
            n_shared_experts=int(cfg.get("n_shared_experts") or 0),
            first_k_dense_replace=int(cfg.get("first_k_dense_replace", 0)),
            routed_scaling_factor=float(cfg.get("routed_scaling_factor", 1.0)),
            topk_method=cfg.get("topk_method",
                                "noaux_tc" if v3 else "greedy"),
            n_group=int(cfg.get("n_group") or 1),
            topk_group=int(cfg.get("topk_group") or 1),
            norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
            scoring_func=cfg.get("scoring_func",
                                 "sigmoid" if v3 else "softmax"),
            attn_mscale_sq=mscale_sq,
            dtype=dtype,
        )


# --------------------------------------------------------------- building
# blocks


def _apply_rope_ds(x: jax.Array, cos: jax.Array, sin: jax.Array,
                   interleave: bool) -> jax.Array:
    """DeepSeek rope on (B, T, n, d). ``interleave`` pairs (x[2i], x[2i+1])
    at frequency inv[i] (HF V2 complex math / V3 interleave path): the
    de-interleave permutation + rotate-half is the same rotation with a
    consistent output ordering, and only the q_pe . k_pe inner product
    (permutation-invariant when applied to both sides) enters attention."""
    if interleave:
        x = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    return apply_rope(x, cos, sin)


def _matmul(h: jax.Array, w) -> jax.Array:
    """h (..., IN) @ leaf (IN, OUT) -> (..., OUT) f32 accum; int8 leaves
    dequant at the use site (fused by XLA)."""
    return jnp.einsum("...h,hd->...d", h, dequant(w, h.dtype),
                      preferred_element_type=jnp.float32)


def _q_heads(cfg: DeepseekConfig, p: dict, h: jax.Array) -> jax.Array:
    """Query projection -> (..., nh, qk_head_dim) [nope | pe] per head."""
    if cfg.q_lora_rank > 0:
        qa = rms_norm(_matmul(h, p["q_a"]["w"]).astype(h.dtype),
                      p["q_a_norm"]["scale"], cfg.rms_norm_eps)
        q = _matmul(qa, p["q_b"]["w"])
    else:
        q = _matmul(h, p["q"]["w"])
    return q.astype(h.dtype).reshape(
        *h.shape[:-1], cfg.num_attention_heads, cfg.qk_head_dim_)


def _latent(cfg: DeepseekConfig, p: dict, h: jax.Array, cos, sin):
    """kv_a projection -> (c_norm (..., r), k_pe_roped (..., 1, rope)).

    These two ARE the decode cache content: everything per-head is
    recovered from them through kv_b (absorbed at decode)."""
    ckv = _matmul(h, p["kv_a"]["w"]).astype(h.dtype)
    c, k_pe = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
    c = rms_norm(c, p["kv_a_norm"]["scale"], cfg.rms_norm_eps)
    k_pe = _apply_rope_ds(k_pe[..., None, :], cos, sin, cfg.rope_interleave)
    return c, k_pe


def _split_kv_b(cfg: DeepseekConfig, p: dict, dtype):
    """kv_b weight (r, nh*(dn+dv)) -> (W_UK (r, nh, dn), W_UV (r, nh, dv))."""
    w = dequant(p["kv_b"]["w"], dtype).reshape(
        cfg.kv_lora_rank, cfg.num_attention_heads,
        cfg.qk_nope_head_dim + cfg.v_head_dim)
    return w[..., :cfg.qk_nope_head_dim], w[..., cfg.qk_nope_head_dim:]


def _mla_attend_full(cfg: DeepseekConfig, q, k, v, mask, key_mask):
    """Prefill/training attention on per-head expanded K/V.

    q/k: (B, T, nh, qk_head_dim), v: (B, T, nh, v_head_dim). The flash
    kernel supports a V narrower than Q/K natively (round 5) — scores on
    the 192-wide rope+nope Q/K, combines on the 128-wide V, so V/dO
    traffic stays at v_head_dim (HF's flash_attention_2 path pads V up to
    qk_head_dim instead and pays +50% V bandwidth)."""
    impl = str(cfg.attn_impl).lower()
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = impl in ("pallas", "flash", "flash_attention_2") or (
        impl == "auto" and on_tpu)
    if use_pallas and key_mask is not None:
        from ..ops.flash_attention import flash_attention

        return flash_attention(q, k, v, key_mask, causal=True,
                               scale=cfg.attn_scale_, window=0, softcap=0.0,
                               interpret=not on_tpu)
    return _mla_attend_dense(cfg, q, k, v, mask)


def _moe_ffn(cfg: DeepseekConfig, p: dict, h: jax.Array) -> jax.Array:
    """DeepSeek MoE block on (..., H): grouped/sigmoid routing
    (ops/moe.route_deepseek) + the shared exec strategies + plain shared
    expert MLP (no sigmoid gate — HF DeepseekV2MoE.shared_experts)."""
    from ..ops import moe as _moe

    H = h.shape[-1]
    x = h.reshape(-1, H)
    routing = _moe.route_deepseek(
        x, p["moe"]["router"]["w"], p["moe"]["router"].get("bias"),
        top_k=cfg.num_experts_per_tok, scoring=cfg.scoring_func,
        topk_method=cfg.topk_method, n_group=cfg.n_group,
        topk_group=cfg.topk_group, norm_topk=cfg.norm_topk_prob,
        routed_scaling_factor=cfg.routed_scaling_factor)
    impl = cfg.moe_impl
    if impl == "auto":
        impl = "dispatch" if jax.default_backend() == "tpu" else "gather"
    kw = dict(top_k=cfg.num_experts_per_tok, norm_topk=False,
              routing=routing)
    if impl == "gather":
        out = _moe.moe_ffn_gather(x, p["moe"], **kw)
    elif impl == "dense":
        out = _moe.moe_ffn_dense(x, p["moe"], **kw)
    elif impl == "dispatch":
        out = _moe.moe_ffn_dispatch(
            x, p["moe"], capacity_factor=cfg.moe_capacity_factor, **kw)
    else:
        raise ValueError(f"unknown moe impl {impl!r}")
    if "shared" in p["moe"]:
        out = out + _moe.shared_expert(x, p["moe"]["shared"])
    return out.reshape(h.shape)


def _dense_ffn(p: dict, h: jax.Array) -> jax.Array:
    gate = _matmul(h, p["mlp"]["gate_proj"]["w"])
    up = _matmul(h, p["mlp"]["up_proj"]["w"])
    act = (jax.nn.silu(gate) * up).astype(h.dtype)
    return _matmul(act, p["mlp"]["down_proj"]["w"]).astype(h.dtype)


def _layer_body(cfg: DeepseekConfig, x, p, cos, sin, mask, key_mask):
    """One prefill/training decoder layer (either group — the MLP flavor
    is decided by the pytree structure, static per scan). Returns
    (x, latent (B, T, cache_width)) — the latent IS the decode cache."""
    B, T, H = x.shape
    nh = cfg.num_attention_heads
    h = rms_norm(x, p["input_layernorm"]["scale"], cfg.rms_norm_eps)

    q = _q_heads(cfg, p["attn"], h)
    q_nope, q_pe = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
    q_pe = _apply_rope_ds(q_pe, cos, sin, cfg.rope_interleave)
    c, k_pe = _latent(cfg, p["attn"], h, cos, sin)

    wk, wv = _split_kv_b(cfg, p["attn"], x.dtype)
    k_nope = jnp.einsum("btr,rhd->bthd", c, wk,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.einsum("btr,rhd->bthd", c, wv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, T, nh, cfg.qk_rope_head_dim))],
        axis=-1)
    q_full = jnp.concatenate([q_nope, q_pe], axis=-1)

    att = _mla_attend_full(cfg, q_full, k, v, mask, key_mask)
    att = jnp.einsum("btd,dh->bth", att.reshape(B, T, nh * cfg.v_head_dim),
                     dequant(p["attn"]["o"]["w"], x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + att
    h = rms_norm(x, p["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
    ffn = _moe_ffn(cfg, p, h) if "moe" in p else _dense_ffn(p, h)
    x = x + ffn.astype(x.dtype)
    latent = jnp.concatenate([c, k_pe[..., 0, :]], axis=-1)
    return x, latent


def _mla_attend_dense(cfg: DeepseekConfig, q, k, v, mask):
    """Masked dense attention: q (B,T,nh,dq), k (B,S,nh,dq),
    v (B,S,nh,dv), mask (B,T,S)."""
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * cfg.attn_scale_
    logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _mla_attend_cached(cfg: DeepseekConfig, q, k, v, mask, key_mask, qstart):
    """Cache-threaded (engine prefill) attention: rectangular flash over
    the whole cache (ops/flash_attention.flash_attention_cached) with
    NATIVE narrow V (v_head_dim < qk_head_dim; no padding tax — round 5),
    dense fallback off-kernel. ``key_mask`` (B, S) cache-column validity;
    queries sit at absolute positions ``qstart[b] + t``."""
    impl = str(cfg.attn_impl).lower()
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = impl in ("pallas", "flash", "flash_attention_2") or (
        impl == "auto" and on_tpu)
    if use_pallas and key_mask is not None:
        from ..ops.flash_attention import flash_attention_cached

        return flash_attention_cached(q, k, v, key_mask, qstart,
                                      scale=cfg.attn_scale_,
                                      interpret=not on_tpu)
    return _mla_attend_dense(cfg, q, k, v, mask)


def _layer_body_cached(cfg: DeepseekConfig, x, p, cos, sin, mask,
                       ck_l, cv_l, cache_pos, key_mask=None):
    """One decoder layer in cache-threaded (engine prefill) mode: the T
    new tokens' latents are WRITTEN into the layer's prefill-layout cache
    (B, S, 1, cache_width) at ``cache_pos`` (scalar, or (B,) per-row
    offsets for batched prefix-hit suffix prefill), then attention expands
    per-head K/V from the WHOLE cache (reused prefix latents included).
    ``cv_l`` is carried untouched — MLA has no second cache plane; the
    Engine's (ck, cv) pair keeps its layout code model-agnostic."""
    B, T, H = x.shape
    nh, r = cfg.num_attention_heads, cfg.kv_lora_rank
    h = rms_norm(x, p["input_layernorm"]["scale"], cfg.rms_norm_eps)

    q = _q_heads(cfg, p["attn"], h)
    q_nope, q_pe = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
    q_pe = _apply_rope_ds(q_pe, cos, sin, cfg.rope_interleave)
    c, k_pe = _latent(cfg, p["attn"], h, cos, sin)
    lat = jnp.concatenate([c, k_pe[..., 0, :]], axis=-1)[:, :, None, :]

    if getattr(cache_pos, "ndim", 0) >= 1:  # per-row suffix offsets
        b_idx = jnp.arange(B)[:, None]
        t_idx = cache_pos[:, None] + jnp.arange(T)[None, :]
        nk = ck_l.at[b_idx, t_idx].set(lat)
    else:
        nk = jax.lax.dynamic_update_slice(ck_l, lat, (0, cache_pos, 0, 0))

    c_all = nk[:, :, 0, :r]                       # (B, S, r)
    kpe_all = nk[:, :, 0, r:]                     # (B, S, rope)
    wk, wv = _split_kv_b(cfg, p["attn"], x.dtype)
    k_nope = jnp.einsum("bsr,rhd->bshd", c_all, wk,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.einsum("bsr,rhd->bshd", c_all, wv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    S = c_all.shape[1]
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(kpe_all[:, :, None, :],
                                  (B, S, nh, cfg.qk_rope_head_dim))], axis=-1)
    q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
    att = _mla_attend_cached(cfg, q_full, k, v, mask, key_mask, cache_pos)
    att = jnp.einsum("btd,dh->bth", att.reshape(B, T, nh * cfg.v_head_dim),
                     dequant(p["attn"]["o"]["w"], x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + att
    h = rms_norm(x, p["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
    ffn = _moe_ffn(cfg, p, h) if "moe" in p else _dense_ffn(p, h)
    return x + ffn.astype(x.dtype), nk


def forward(
    params: dict,
    cfg: DeepseekConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    positions: jax.Array | None = None,
    kv_cache: tuple[jax.Array, jax.Array] | None = None,
    cache_pos: Any = 0,
    kv_valid: jax.Array | None = None,
    remat: bool = False,
    return_hidden: bool = False,
    compute_logits: bool = True,
    return_latent: bool = False,
):
    """Full forward pass; same two modes/contract as qwen2.forward so the
    Engine serves MLA models through identical plumbing:

    * prefill/training — ``kv_cache=None``: causal attention over (B, T).
    * cache-threaded — ``kv_cache=(ck, cv)`` of shape (L, B, S, 1,
      cache_width): the T tokens' latents are written at ``cache_pos`` and
      attend where ``kv_valid`` (B, S) is true; ``cv`` is carried inert.

    ``return_latent`` (no-cache mode) additionally returns the
    (L, B, T, cache_width) latent stack — the decode cache content."""
    from .qwen2 import _embed, _lm_head  # shared embed/head (int8-aware)

    B, T = input_ids.shape
    x = _embed(params, cfg, input_ids)
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = rope_freqs(positions, cfg.qk_rope_head_dim, cfg.rope_theta,
                          cfg.rope_scaling)

    Ld = cfg.num_dense_layers_
    if kv_cache is None:
        causal = jnp.tril(jnp.ones((T, T), jnp.bool_))[None, :, :]
        if attention_mask is not None:
            mask = causal & (attention_mask[:, None, :] > 0)
            key_mask = attention_mask
        else:
            mask = jnp.broadcast_to(causal, (B, T, T))
            key_mask = jnp.ones((B, T), jnp.int32)

        def scan_group(x, group):
            def body(x, p):
                return _layer_body(cfg, x, p, cos, sin, mask, key_mask)
            if remat:
                body = jax.checkpoint(body, prevent_cse=False)
            return jax.lax.scan(body, x, group)

        lats = []
        if "dense_layers" in params:
            x, lat_d = scan_group(x, params["dense_layers"])
            lats.append(lat_d)
        if "moe_layers" in params:
            x, lat_m = scan_group(x, params["moe_layers"])
            lats.append(lat_m)
        latents = jnp.concatenate(lats, axis=0) if return_latent else None
        new_cache = None
    else:
        ck, cv = kv_cache
        S = ck.shape[2]
        kpos = jnp.arange(S)[None, None, :]
        cp = jnp.asarray(cache_pos)
        cp_btc = cp[:, None, None] if cp.ndim >= 1 else cp
        valid = (kv_valid[:, None, :] if kv_valid is not None
                 else (kpos < (cp_btc + T)))
        qpos = cp_btc + jnp.arange(T)[None, :, None]
        mask = valid & (kpos <= qpos)
        # (B, S) cache-column validity for the rectangular flash kernel
        key_mask_c = cached_key_mask(kv_valid, cache_pos, T, B, S)

        def scan_cached(x, group, ck_g, cv_g):
            def body(x, inp):
                p, ckl, cvl = inp
                x2, nkl = _layer_body_cached(cfg, x, p, cos, sin, mask,
                                             ckl, cvl, cache_pos,
                                             key_mask=key_mask_c)
                return x2, (nkl, cvl)
            return jax.lax.scan(body, x, (group, ck_g, cv_g))

        nks, nvs = [], []
        if "dense_layers" in params:
            x, (nk, nv) = scan_cached(x, params["dense_layers"],
                                      ck[:Ld], cv[:Ld])
            nks.append(nk); nvs.append(nv)
        if "moe_layers" in params:
            x, (nk, nv) = scan_cached(x, params["moe_layers"],
                                      ck[Ld:], cv[Ld:])
            nks.append(nk); nvs.append(nv)
        new_cache = (jnp.concatenate(nks, axis=0) if len(nks) > 1 else nks[0],
                     jnp.concatenate(nvs, axis=0) if len(nvs) > 1 else nvs[0])
        latents = None

    x = rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)
    if not compute_logits:
        return None, (x if return_hidden else None), \
            (new_cache if kv_cache is not None else latents)
    logits = _lm_head(params, cfg, x)
    return logits, (x if return_hidden else None), \
        (new_cache if kv_cache is not None else latents)


# --------------------------------------------------------------- decode


def init_kv_cache(cfg: DeepseekConfig, batch: int, max_len: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Engine-contract prefill-layout cache pair, MQA-shaped for MLA:
    (L, B, S, 1, kv_lora_rank + qk_rope_head_dim). The "k" plane holds the
    latent [c_norm | k_pe]; the "v" plane exists only so the Engine's
    model-agnostic layout code (transpose/gather/compaction/prefix store)
    handles one pair shape — it is never read or written by compute, so
    XLA sees pure identities through it. At V3 scale the latent is
    61 x 576 x 2 B = 69 KB/token vs ~3.8 MB/token for per-head K/V —
    the MLA serving win."""
    shape = (cfg.num_hidden_layers, batch, max_len, 1, cfg.cache_width_)
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


def _layer_slice(params: dict, cfg: DeepseekConfig, l: int) -> dict:
    """Static layer-l view over the two stacked groups."""
    Ld = cfg.num_dense_layers_
    if l < Ld:
        return jax.tree.map(lambda w: w[l], params["dense_layers"])
    return jax.tree.map(lambda w: w[l - Ld], params["moe_layers"])


def decode_step(
    params: dict,
    cfg: DeepseekConfig,
    tok: jax.Array,        # (B,) int32 — the tokens to forward
    positions: jax.Array,  # (B,) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, 1, S, cache_width) — decode layout
    cache_v: jax.Array,    # carried inert (see init_kv_cache)
    slot: jax.Array,       # scalar int32 — uniform cache slot for this step
    lens: jax.Array,       # (B,) int32 — prompt lengths (prefix validity)
    dstart: jax.Array,     # (B,) int32 — first VALID decode slot per row
    return_hidden: bool = False,
    ragged: bool | None = None,
    cache_scale=None,
    win_cache=None,
    win_pad: int = 0,
):
    """One-token MLA decode via weight absorption — the Engine's hot loop
    body for this family (same contract as qwen2.decode_step; slot-uniform
    validity: slot j readable for row b iff j < lens[b] or
    dstart[b] <= j <= slot).

    Per layer the cache column ``slot`` receives [c_norm | k_pe], then
    attention reads the SINGLE shared latent stream:

        q_lat,h = W_UK,h^T q_nope,h            (per-head absorb: (r,))
        s_h     = q_lat,h . c_s + q_pe,h . k_pe_s       over valid s
        ctx_h   = W_UV,h (sum_s softmax(s)_s c_s)

    No per-head K/V is ever materialized — cache traffic per layer-step
    is S * cache_width bytes regardless of nh (the MQA property that
    makes MLA decode HBM-cheap). ``ragged`` is accepted and ignored (the
    latent width is not kernel-tileable; the dense masked read IS the
    cheap path here); windowed-short caches are a qwen2-family feature
    and reject loudly.

    ``cache_scale=(ks, vs)`` (each (L, B, 1, S) f32) switches the latent
    plane to int8 with per-vector scales (kv_quant="int8"): the c and
    k_pe segments share one vector scale, which folds ONCE into the
    summed score (both dot products scale linearly in the vector) and
    into the attention weights before the context combine — exact given
    the quantized values. At long S the latent read stream dominates an
    MLA decode step, so halving it is the same lever as qwen2's int8 KV.
    ``vs`` is carried inert like cache_v. Returns gain the updated scale
    tuple, matching the qwen2 contract."""
    from .qwen2 import _embed, _lm_head, _quantize_kv

    if win_cache is not None:
        raise ValueError("sliding-window caches do not apply to deepseek")
    q8 = cache_scale is not None
    if q8:
        ks_all, vs_all = cache_scale
    B = tok.shape[0]
    nh, r = cfg.num_attention_heads, cfg.kv_lora_rank
    S = cache_k.shape[3]
    x = _embed(params, cfg, tok[:, None])  # (B, 1, H)
    cos, sin = rope_freqs(positions[:, None], cfg.qk_rope_head_dim,
                          cfg.rope_theta, cfg.rope_scaling)
    ar = jnp.arange(S)[None, :]
    valid = (ar < lens[:, None]) | ((ar >= dstart[:, None]) & (ar <= slot))

    for l in range(cfg.num_hidden_layers):
        p = _layer_slice(params, cfg, l)
        h = rms_norm(x, p["input_layernorm"]["scale"], cfg.rms_norm_eps)
        q = _q_heads(cfg, p["attn"], h)[:, 0]          # (B, nh, dq)
        q_nope, q_pe = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
        q_pe = _apply_rope_ds(q_pe[:, None], cos, sin,
                              cfg.rope_interleave)[:, 0]
        c1, kpe1 = _latent(cfg, p["attn"], h, cos, sin)  # (B,1,r), (B,1,1,p)
        lat = jnp.concatenate([c1[:, 0], kpe1[:, 0, 0, :]], axis=-1)  # (B,W)

        if q8:
            lat_q, s_vec = _quantize_kv(lat)           # (B, W) i8, (B,) f32
            layer_cache = jax.lax.dynamic_update_slice(
                cache_k[l], lat_q[:, None, None, :], (0, 0, slot, 0))
            ks_l = jax.lax.dynamic_update_slice(
                ks_all[l], s_vec[:, None, None], (0, 0, slot))
            ks_all = ks_all.at[l].set(ks_l)
        else:
            layer_cache = jax.lax.dynamic_update_slice(
                cache_k[l], lat[:, None, None, :], (0, 0, slot, 0))
        cache_k = cache_k.at[l].set(layer_cache)

        wk, wv = _split_kv_b(cfg, p["attn"], x.dtype)
        q_lat = jnp.einsum("bhd,rhd->bhr", q_nope, wk,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        cc = layer_cache[:, 0, :, :r]                   # (B, S, r)
        kp = layer_cache[:, 0, :, r:]                   # (B, S, rope)
        if q8:
            cc = cc.astype(x.dtype)
            kp = kp.astype(x.dtype)
        scores = (jnp.einsum("bhr,bsr->bhs", q_lat, cc,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("bhp,bsp->bhs", q_pe, kp,
                               preferred_element_type=jnp.float32))
        if q8:  # one shared per-vector scale for both segments
            scores = scores * ks_l[:, 0, None, :]
        scores = scores * cfg.attn_scale_
        scores = jnp.where(valid[:, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        if q8:  # fold the value-side scale into the weights pre-combine
            attn = (attn * ks_l[:, 0, None, :]).astype(x.dtype)
        else:
            attn = attn.astype(x.dtype)
        ctx = jnp.einsum("bhs,bsr->bhr", attn, cc,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.einsum("bhr,rhd->bhd", ctx, wv,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        att = jnp.einsum("bd,dh->bh",
                         out.reshape(B, nh * cfg.v_head_dim),
                         dequant(p["attn"]["o"]["w"], x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        xb = x[:, 0] + att
        h2 = rms_norm(xb, p["post_attention_layernorm"]["scale"],
                      cfg.rms_norm_eps)
        ffn = _moe_ffn(cfg, p, h2) if "moe" in p else _dense_ffn(p, h2)
        x = (xb + ffn.astype(xb.dtype))[:, None, :]

    hidden = rms_norm(x[:, 0], params["norm"]["scale"], cfg.rms_norm_eps)
    logits = _lm_head(params, cfg, hidden)
    if q8:
        return (logits, (hidden if return_hidden else None), cache_k,
                cache_v, (ks_all, vs_all))
    return logits, (hidden if return_hidden else None), cache_k, cache_v


def decode_step_multi(
    params: dict,
    cfg: DeepseekConfig,
    toks: jax.Array,       # (B, T) int32 — [last_emitted, draft_1..draft_{T-1}]
    positions: jax.Array,  # (B, T) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, 1, S, cache_width) — decode layout
    cache_v: jax.Array,    # carried inert (see init_kv_cache)
    slot: jax.Array,       # scalar int32 — first cache column for this block
    valid_map: jax.Array,  # (B, S) bool — per-row stored-latent validity
    return_hidden: bool = False,
    cache_scale=None,
    pos_map: jax.Array | None = None,  # accepted for engine-contract parity
):
    """T-token MLA verify step for speculative decoding (engine spec mode)
    — the weight-absorbed analogue of :func:`qwen2.decode_step_multi`,
    same contract (bitmap validity with permanent holes at rejected draft
    columns; new columns attend causally within the block; int8 latent
    scales quantize per (b, t) vector exactly as the 1-token loop).
    ``pos_map`` is accepted and unused: MLA stacks have no sliding
    windows, and the single latent stream already makes the T-token read
    the same S * cache_width bytes as one token — exactly the property
    that makes speculation nearly free on an HBM-bound decode.
    Capability beyond the reference: its vLLM config runs no speculative
    decoding on any family (vllm_start.sh)."""
    from .qwen2 import _embed, _lm_head, _quantize_kv

    del pos_map
    q8 = cache_scale is not None
    if q8:
        ks_all, vs_all = cache_scale
    B, T = toks.shape
    nh, r = cfg.num_attention_heads, cfg.kv_lora_rank
    S = cache_k.shape[3]
    x = _embed(params, cfg, toks)  # (B, T, H)
    cos, sin = rope_freqs(positions, cfg.qk_rope_head_dim,
                          cfg.rope_theta, cfg.rope_scaling)  # (B, T, p/2)
    ar = jnp.arange(S)[None, None, :]
    new_rel = ar - slot                       # new columns are 0..T-1
    causal_new = (new_rel >= 0) & (new_rel <= jnp.arange(T)[None, :, None])
    valid = valid_map[:, None, :] | causal_new  # (B, T, S)

    for l in range(cfg.num_hidden_layers):
        p = _layer_slice(params, cfg, l)
        h = rms_norm(x, p["input_layernorm"]["scale"], cfg.rms_norm_eps)
        q = _q_heads(cfg, p["attn"], h)                 # (B, T, nh, dq)
        q_nope, q_pe = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
        q_pe = _apply_rope_ds(q_pe, cos, sin, cfg.rope_interleave)
        c1, kpe1 = _latent(cfg, p["attn"], h, cos, sin)  # (B,T,r),(B,T,1,p)
        lat = jnp.concatenate([c1, kpe1[:, :, 0, :]], axis=-1)  # (B, T, W)

        if q8:
            lat_q, s_vec = _quantize_kv(lat)            # (B,T,W) i8, (B,T)
            layer_cache = jax.lax.dynamic_update_slice(
                cache_k[l], lat_q[:, None, :, :], (0, 0, slot, 0))
            ks_l = jax.lax.dynamic_update_slice(
                ks_all[l], s_vec[:, None, :], (0, 0, slot))
            ks_all = ks_all.at[l].set(ks_l)
        else:
            layer_cache = jax.lax.dynamic_update_slice(
                cache_k[l], lat[:, None, :, :], (0, 0, slot, 0))
        cache_k = cache_k.at[l].set(layer_cache)

        wk, wv = _split_kv_b(cfg, p["attn"], x.dtype)
        q_lat = jnp.einsum("bthd,rhd->bthr", q_nope, wk,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        cc = layer_cache[:, 0, :, :r]                   # (B, S, r)
        kp = layer_cache[:, 0, :, r:]                   # (B, S, rope)
        if q8:
            cc = cc.astype(x.dtype)
            kp = kp.astype(x.dtype)
        scores = (jnp.einsum("bthr,bsr->bths", q_lat, cc,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("bthp,bsp->bths", q_pe, kp,
                               preferred_element_type=jnp.float32))
        if q8:  # one shared per-vector scale for both segments
            scores = scores * ks_l[:, 0, None, None, :]
        scores = scores * cfg.attn_scale_
        scores = jnp.where(valid[:, :, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        if q8:  # fold the value-side scale into the weights pre-combine
            attn = (attn * ks_l[:, 0, None, None, :]).astype(x.dtype)
        else:
            attn = attn.astype(x.dtype)
        ctx = jnp.einsum("bths,bsr->bthr", attn, cc,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.einsum("bthr,rhd->bthd", ctx, wv,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        att = jnp.einsum("btd,dh->bth",
                         out.reshape(B, T, nh * cfg.v_head_dim),
                         dequant(p["attn"]["o"]["w"], x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        xb = x + att
        h2 = rms_norm(xb, p["post_attention_layernorm"]["scale"],
                      cfg.rms_norm_eps)
        ffn = _moe_ffn(cfg, p, h2) if "moe" in p else _dense_ffn(p, h2)
        x = xb + ffn.astype(xb.dtype)

    hidden = rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)
    logits = _lm_head(params, cfg, hidden)
    if q8:
        return (logits, (hidden if return_hidden else None), cache_k,
                cache_v, (ks_all, vs_all))
    return logits, (hidden if return_hidden else None), cache_k, cache_v


# --------------------------------------------------------------- init /
# loading


def init_params(cfg: DeepseekConfig, key: jax.Array) -> dict:
    """Random-init pytree (tests / benches); layout mirrors load_params."""
    keys = iter(jax.random.split(key, 64))
    dt = cfg.dtype
    sc = 0.02

    def mat(*shape):
        return jax.random.normal(next(keys), shape, dt) * sc

    def attn_group(L):
        a = {
            "kv_a": {"w": mat(L, cfg.hidden_size, cfg.cache_width_)},
            "kv_a_norm": {"scale": jnp.ones((L, cfg.kv_lora_rank), dt)},
            "kv_b": {"w": mat(L, cfg.kv_lora_rank,
                              cfg.num_attention_heads
                              * (cfg.qk_nope_head_dim + cfg.v_head_dim))},
            "o": {"w": mat(L, cfg.num_attention_heads * cfg.v_head_dim,
                           cfg.hidden_size)},
        }
        if cfg.q_lora_rank > 0:
            a["q_a"] = {"w": mat(L, cfg.hidden_size, cfg.q_lora_rank)}
            a["q_a_norm"] = {"scale": jnp.ones((L, cfg.q_lora_rank), dt)}
            a["q_b"] = {"w": mat(L, cfg.q_lora_rank,
                                 cfg.num_attention_heads * cfg.qk_head_dim_)}
        else:
            a["q"] = {"w": mat(L, cfg.hidden_size,
                               cfg.num_attention_heads * cfg.qk_head_dim_)}
        return a

    def norms(L):
        return {"input_layernorm": {"scale": jnp.ones((L, cfg.hidden_size), dt)},
                "post_attention_layernorm":
                    {"scale": jnp.ones((L, cfg.hidden_size), dt)}}

    params: dict[str, Any] = {
        "embed": {"weight": mat(cfg.vocab_size, cfg.hidden_size)},
        "norm": {"scale": jnp.ones((cfg.hidden_size,), dt)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": mat(cfg.vocab_size, cfg.hidden_size)}
    Ld, Lm = cfg.num_dense_layers_, cfg.num_moe_layers_
    if Ld:
        params["dense_layers"] = {
            **norms(Ld), "attn": attn_group(Ld),
            "mlp": {"gate_proj": {"w": mat(Ld, cfg.hidden_size, cfg.intermediate_size)},
                    "up_proj": {"w": mat(Ld, cfg.hidden_size, cfg.intermediate_size)},
                    "down_proj": {"w": mat(Ld, cfg.intermediate_size, cfg.hidden_size)}},
        }
    if Lm:
        E, I = cfg.n_routed_experts, cfg.moe_intermediate_size
        moe: dict[str, Any] = {
            "router": {"w": mat(Lm, cfg.hidden_size, E)},
            "experts": {
                "gate_proj": {"w": mat(Lm, E, cfg.hidden_size, I)},
                "up_proj": {"w": mat(Lm, E, cfg.hidden_size, I)},
                "down_proj": {"w": mat(Lm, E, I, cfg.hidden_size)},
            },
        }
        if cfg.scoring_func == "sigmoid":
            moe["router"]["bias"] = jnp.zeros((Lm, E), jnp.float32)
        if cfg.n_shared_experts > 0:
            Is = I * cfg.n_shared_experts
            moe["shared"] = {
                "gate_proj": {"w": mat(Lm, cfg.hidden_size, Is)},
                "up_proj": {"w": mat(Lm, cfg.hidden_size, Is)},
                "down_proj": {"w": mat(Lm, Is, cfg.hidden_size)},
            }
        params["moe_layers"] = {**norms(Lm), "attn": attn_group(Lm),
                                "moe": moe}
    return params


def load_params(model_dir: str, cfg: DeepseekConfig | None = None,
                dtype=jnp.bfloat16, quantize: str | None = None
                ) -> tuple[dict, DeepseekConfig]:
    """Load an HF deepseek_v2/v3 safetensors checkpoint into the two-group
    stacked pytree. ``quantize="int8"`` applies weight-only per-channel
    int8 to the big matmul weights on host (the 7B/V2-Lite-on-one-chip fit
    lever); routers, norms and the tiny rope-side mats stay full precision."""
    from . import loader as _ld

    if cfg is None:
        cfg = _ld.load_config(model_dir)
    if not isinstance(cfg, DeepseekConfig):
        raise ValueError("load_params(deepseek) needs a DeepseekConfig")
    cfg = dataclasses.replace(cfg, dtype=dtype)
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize={quantize!r} for deepseek "
                         "(int8 only)")
    q8 = quantize == "int8"
    tensors = _ld._open_safetensors(model_dir)

    def get_stack(layers: list[int], fmt: str, transpose=True,
                  quantizable=True):
        out = np.stack(
            [_ld._get(tensors, fmt.format(i=i)) for i in layers], axis=0)
        if q8 and transpose and quantizable:
            host = np.swapaxes(_ld._host_f32(out), -1, -2)
            return _ld._quant_int8_host(host, axis=-2)
        arr = _ld._to_jax(out, dtype)
        return jnp.swapaxes(arr, -1, -2) if transpose else arr

    def get_experts(layers: list[int], fmt: str):
        mats = []
        for i in layers:
            per = [np.swapaxes(_ld._get(tensors, fmt.format(i=i, e=e)), -1, -2)
                   for e in range(cfg.n_routed_experts)]
            mats.append(np.stack(per, axis=0))
        out = np.stack(mats, axis=0)
        if q8:
            return _ld._quant_int8_host(_ld._host_f32(out), axis=-2)
        return _ld._to_jax(out, dtype)

    def attn_group(layers: list[int]) -> dict:
        a = {
            "kv_a": {"w": get_stack(layers, "layers.{i}.self_attn.kv_a_proj_with_mqa.weight",
                                    quantizable=False)},
            "kv_a_norm": {"scale": get_stack(layers, "layers.{i}.self_attn.kv_a_layernorm.weight",
                                             transpose=False)},
            "kv_b": {"w": get_stack(layers, "layers.{i}.self_attn.kv_b_proj.weight")},
            "o": {"w": get_stack(layers, "layers.{i}.self_attn.o_proj.weight")},
        }
        if cfg.q_lora_rank > 0:
            a["q_a"] = {"w": get_stack(layers, "layers.{i}.self_attn.q_a_proj.weight",
                                       quantizable=False)}
            a["q_a_norm"] = {"scale": get_stack(layers, "layers.{i}.self_attn.q_a_layernorm.weight",
                                                transpose=False)}
            a["q_b"] = {"w": get_stack(layers, "layers.{i}.self_attn.q_b_proj.weight")}
        else:
            a["q"] = {"w": get_stack(layers, "layers.{i}.self_attn.q_proj.weight")}
        return a

    def norms(layers: list[int]) -> dict:
        return {
            "input_layernorm": {"scale": get_stack(layers, "layers.{i}.input_layernorm.weight",
                                                   transpose=False)},
            "post_attention_layernorm": {"scale": get_stack(
                layers, "layers.{i}.post_attention_layernorm.weight",
                transpose=False)},
        }

    params: dict[str, Any] = {
        "embed": {"weight": _ld._to_jax(_ld._get(tensors, "embed_tokens.weight"), dtype)},
        "norm": {"scale": _ld._to_jax(_ld._get(tensors, "norm.weight"), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": _ld._to_jax(_ld._get(tensors, "lm_head.weight"), dtype)}

    Ld = cfg.num_dense_layers_
    dense_idx = list(range(Ld))
    moe_idx = list(range(Ld, cfg.num_hidden_layers))
    if dense_idx:
        params["dense_layers"] = {
            **norms(dense_idx), "attn": attn_group(dense_idx),
            "mlp": {
                "gate_proj": {"w": get_stack(dense_idx, "layers.{i}.mlp.gate_proj.weight")},
                "up_proj": {"w": get_stack(dense_idx, "layers.{i}.mlp.up_proj.weight")},
                "down_proj": {"w": get_stack(dense_idx, "layers.{i}.mlp.down_proj.weight")},
            },
        }
    if moe_idx:
        moe: dict[str, Any] = {
            "router": {"w": get_stack(moe_idx, "layers.{i}.mlp.gate.weight",
                                      quantizable=False)},
            "experts": {
                "gate_proj": {"w": get_experts(moe_idx, "layers.{i}.mlp.experts.{e}.gate_proj.weight")},
                "up_proj": {"w": get_experts(moe_idx, "layers.{i}.mlp.experts.{e}.up_proj.weight")},
                "down_proj": {"w": get_experts(moe_idx, "layers.{i}.mlp.experts.{e}.down_proj.weight")},
            },
        }
        if _ld._has(tensors, "layers.{i}.mlp.gate.e_score_correction_bias"
                    .format(i=moe_idx[0])):
            moe["router"]["bias"] = get_stack(
                moe_idx, "layers.{i}.mlp.gate.e_score_correction_bias",
                transpose=False).astype(jnp.float32)
        if cfg.n_shared_experts > 0:
            moe["shared"] = {
                "gate_proj": {"w": get_stack(moe_idx, "layers.{i}.mlp.shared_experts.gate_proj.weight")},
                "up_proj": {"w": get_stack(moe_idx, "layers.{i}.mlp.shared_experts.up_proj.weight")},
                "down_proj": {"w": get_stack(moe_idx, "layers.{i}.mlp.shared_experts.down_proj.weight")},
            }
        params["moe_layers"] = {**norms(moe_idx), "attn": attn_group(moe_idx),
                                "moe": moe}
    return params, cfg


def export_hf(params: dict, cfg: DeepseekConfig, out_dir: str,
              src_config_dir: str | None = None) -> None:
    """Write params back to an HF-layout safetensors dir — reloads both
    through this loader and vanilla Deepseek{V2,V3}ForCausalLM (the
    deepseek analogue of loader.export_hf; quantized leaves dequantize)."""
    import os

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd: dict[str, np.ndarray] = {}

    def put(name: str, arr, transpose=False):
        a = np.asarray(jax.device_get(dequant(arr, jnp.float32)), np.float32)
        if transpose:
            a = np.swapaxes(a, -1, -2)
        sd[name] = np.ascontiguousarray(a, dtype=np.float32)

    put("model.embed_tokens.weight", params["embed"]["weight"])
    put("model.norm.weight", params["norm"]["scale"])
    if not cfg.tie_word_embeddings and "lm_head" in params:
        put("lm_head.weight", params["lm_head"]["weight"])

    Ld = cfg.num_dense_layers_

    def layer_view(l: int) -> dict:
        return _layer_slice(params, cfg, l)

    for l in range(cfg.num_hidden_layers):
        p = layer_view(l)
        pre = f"model.layers.{l}."
        put(pre + "input_layernorm.weight", p["input_layernorm"]["scale"])
        put(pre + "post_attention_layernorm.weight",
            p["post_attention_layernorm"]["scale"])
        a = p["attn"]
        if cfg.q_lora_rank > 0:
            put(pre + "self_attn.q_a_proj.weight", a["q_a"]["w"], transpose=True)
            put(pre + "self_attn.q_a_layernorm.weight", a["q_a_norm"]["scale"])
            put(pre + "self_attn.q_b_proj.weight", a["q_b"]["w"], transpose=True)
        else:
            put(pre + "self_attn.q_proj.weight", a["q"]["w"], transpose=True)
        put(pre + "self_attn.kv_a_proj_with_mqa.weight", a["kv_a"]["w"],
            transpose=True)
        put(pre + "self_attn.kv_a_layernorm.weight", a["kv_a_norm"]["scale"])
        put(pre + "self_attn.kv_b_proj.weight", a["kv_b"]["w"], transpose=True)
        put(pre + "self_attn.o_proj.weight", a["o"]["w"], transpose=True)
        if l < Ld:
            for proj in ("gate", "up", "down"):
                put(pre + f"mlp.{proj}_proj.weight",
                    p["mlp"][f"{proj}_proj"]["w"], transpose=True)
        else:
            moe = p["moe"]
            put(pre + "mlp.gate.weight", moe["router"]["w"], transpose=True)
            if "bias" in moe["router"]:
                put(pre + "mlp.gate.e_score_correction_bias",
                    moe["router"]["bias"])
            E = cfg.n_routed_experts
            for e in range(E):
                for proj in ("gate", "up", "down"):
                    put(pre + f"mlp.experts.{e}.{proj}_proj.weight",
                        moe["experts"][f"{proj}_proj"]["w"][e], transpose=True)
            if "shared" in moe:
                for proj in ("gate", "up", "down"):
                    put(pre + f"mlp.shared_experts.{proj}_proj.weight",
                        moe["shared"][f"{proj}_proj"]["w"], transpose=True)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    if src_config_dir:
        for fname in ("config.json", "tokenizer.json", "tokenizer_config.json",
                      "generation_config.json"):
            src = os.path.join(src_config_dir, fname)
            if os.path.exists(src):
                with open(src, "rb") as fi, \
                        open(os.path.join(out_dir, fname), "wb") as fo:
                    fo.write(fi.read())

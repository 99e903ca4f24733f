"""Qwen2-family decoder in functional JAX (TPU-first design).

Replaces the reference's HF-transformers policy backbone
(/root/reference/trainer/mtpo_trainer.py:643-663 loads Qwen2.5 via
AutoModelForCausalLM + flash-attention-2). This is NOT a port: the model is
a pure function over a stacked-parameter pytree, with

- ``lax.scan`` over stacked layer params (one compile of one layer body —
  fast XLA compiles at any depth),
- bf16 matmuls with f32 accumulation (``preferred_element_type``) on the MXU,
- GQA with K/V head broadcast done inside the einsum (no materialized repeat),
- a KV cache laid out (layers, B, max_len, n_kv, head_dim) updated with
  ``lax.dynamic_update_slice`` for the decode loop,
- sharding-friendly layouts: all 2D weights are (in, out); stacked layer
  weights carry a leading layer axis (see parallel/mesh.py PARAM_RULES).

Supported HF checkpoints: Qwen2 / Qwen2.5 (incl. -Math, -Instruct), the
Llama decoder family (Llama-2/3, Mistral without sliding window) — same
architecture modulo config knobs (attention_bias, tie_word_embeddings,
head_dim, rope_theta) — and Qwen2-MoE (Qwen1.5-MoE-A2.7B / Qwen2-57B-A14B:
sparse FFN via ops/moe.py, ``num_experts > 0``) — loader in
models/loader.py maps safetensors names onto this pytree.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from .quant import dequant, is_quantized


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int | None = None
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    # RoPE frequency scaling, parsed from HF config.json `rope_scaling` by
    # :func:`_parse_rope_scaling` into a hashable tuple (the config is a
    # frozen jit-static dataclass): () = none, ("linear", factor),
    # ("llama3", factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings), or ("yarn", factor,
    # attention_factor, beta_fast, beta_slow, orig_max, truncate) for
    # Qwen2.5-1M / DeepSeek-style YaRN checkpoints. Unsupported types
    # (dynamic/longrope) are rejected at parse time — silently ignoring
    # them would load such checkpoints with wrong frequencies.
    rope_scaling: tuple = ()
    # Sliding-window attention width; 0 = full attention. Parsed from HF
    # config.json by :func:`_parse_sliding_window` (Mistral-v0.1-style
    # uniform stacks; qwen2/qwen3 only when use_sliding_window is set).
    # Applies to prefill (dense mask + flash kernel banding), cached
    # suffix prefill, and decode (position-windowed slot validity; the
    # ragged kernel bands via window-clipped DMA ranges — O(W) traffic at
    # S >> W); seq-mesh/spec-decode paths reject — see decode_step/Engine.
    sliding_window: int = 0
    # Per-layer attention windows for HETEROGENEOUS stacks (gemma2
    # alternates sliding/full, gemma3 runs 5 local : 1 global): () =
    # uniform (`sliding_window` applies to every layer, possibly 0), else
    # a length-L tuple of 0 (full) / W (sliding). The decode path selects
    # per layer statically (the layer loop is unrolled); the prefill scan
    # threads the window widths as a scanned operand and bands the mask
    # in-body. Non-gemma mixed stacks (qwen with 0 < max_window_layers
    # < L) also parse into this.
    layer_windows: tuple = ()
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    attention_bias: bool = True  # qwen2 uses bias on q/k/v only
    # HF checkpoint stores fused qkv_proj + gate_up_proj mats (phi3
    # family). Loader splits at load / export re-fuses; the runtime pytree
    # and every compute path are identical to per-tensor checkpoints.
    fused_qkv: bool = False
    qk_norm: bool = False  # qwen3: per-head RMS norm on q/k before RoPE
    # Mixture-of-experts (qwen2_moe family): num_experts == 0 means dense.
    # All layers must be sparse (decoder_sparse_step=1, no mlp_only_layers —
    # true of Qwen1.5-MoE-A2.7B / Qwen2-57B-A14B); mixed stacks are rejected
    # at load time because the layer scan requires a uniform pytree.
    num_experts: int = 0
    num_experts_per_tok: int = 4
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = False
    # HF checkpoint tensor layout for the MoE subtree: "qwen"
    # (mlp.gate / mlp.experts.{e}.{gate,up,down}_proj, Qwen1.5-MoE /
    # Qwen3-MoE) or "mixtral" (block_sparse_moe.gate /
    # block_sparse_moe.experts.{e}.{w1,w3,w2} = gate/up/down). Compute is
    # identical (ops/moe.py); only loader/export key names differ.
    moe_layout: str = "qwen"
    moe_impl: str = "auto"  # auto | gather | dense | dispatch (ops/moe.py)
    # dispatch-impl expert bucket width: C = ceil(top_k*S/E * this).
    # Larger = fewer capacity drops under routing skew, more FLOPs/memory;
    # moe.dispatch_drop_fraction() measures the actual drop rate.
    moe_capacity_factor: float = 2.0
    dtype: Any = jnp.bfloat16
    # "auto": pallas flash attention on TPU for the no-cache path, dense
    # otherwise; "pallas" forces the kernel (interpret mode off-TPU);
    # "dense" forces the reference einsum path
    attn_impl: str = "auto"
    # ---- gemma2 / gemma3 family knobs (all inert at their defaults) ----
    hidden_act: str = "silu"        # gemma: "gelu_pytorch_tanh" (GeGLU)
    # gemma residual structure: post-attention/post-feedforward OUTPUT
    # norms in addition to the two pre-norms (4 RMS norms per layer)
    sandwich_norms: bool = False
    # gemma scales embeddings by sqrt(hidden_size) (cast to dtype first,
    # as HF does — the bf16 rounding of the normalizer is part of parity)
    embed_normalizer: bool = False
    # gemma attention scale base: softmax(q@k * query_pre_attn_scalar
    # **-0.5); 0 = the usual head_dim
    query_pre_attn_scalar: float = 0.0
    attn_softcap: float = 0.0       # gemma2: cap*tanh(logits/cap) pre-mask
    final_softcap: float = 0.0      # gemma2: same, on the lm_head logits
    # gemma3: sliding layers rope at this theta (no scaling); full layers
    # use rope_theta (+rope_scaling). 0 = single rope for all layers.
    rope_local_theta: float = 0.0
    # ---- smollm3 family knobs (inert at defaults) ----
    # Per-layer NoPE: () = rope everywhere, else a length-L tuple of 0/1
    # where 1 means the layer SKIPS rope entirely (SmolLM3 runs every
    # 4th layer position-encoding-free; HF no_rope_layers[l]==0). The
    # prefill scan threads the flag as a scanned operand (rope with
    # cos=1/sin=0 is the identity); decode's unrolled loop skips
    # statically. Mutually exclusive with layer_windows/rope_local_theta.
    nope_layers: tuple = ()
    # ---- starcoder2 family knobs (inert at defaults) ----
    # Residual-stream norms: "rms" or "layernorm" (mean-centered, with
    # bias — params carry {"scale","bias"}; _norm dispatches).
    norm_style: str = "rms"
    # FFN: "swiglu" (gate/up/down) or "plain" (c_fc -> act -> c_proj with
    # biases, starcoder2).
    mlp_style: str = "swiglu"
    # ---- olmo2 family knobs (inert at defaults) ----
    # OLMo-2 residual structure: NO pre-norms — each sublayer's OUTPUT is
    # normed before the residual add (x += norm(attn(x)); x += norm(mlp(x)),
    # HF Olmo2DecoderLayer.forward). Params carry only the two post-norms.
    post_norms_only: bool = False
    # OLMo-2 q/k norms are over the FULL flattened projection width
    # (nh*dh / nkv*dh, Olmo2Attention) — distinct from qwen3's per-head
    # qk_norm over dh. Mutually exclusive with qk_norm.
    qk_norm_full: bool = False
    # ---- gpt_oss family knobs (inert at defaults) ----
    # Learned per-head attention sinks: softmax over [scores, sink_h] with
    # the sink column dropped after normalization (HF GptOss
    # eager_attention_forward) — i.e. the sink only steals probability
    # mass. Implemented by folding exp(sink - m) into the softmax
    # denominator in every attention path: dense via _sink_softmax, flash
    # fwd/bwd + cached prefill via the exact lse fold
    # (ops/flash_attention.py sink section), ragged decode via the m0=sink
    # l0=1 accumulator init (ops/ragged_decode_attention.py).
    attn_sinks: bool = False
    # gpt_oss puts a bias on o_proj too (q/k/v biases ride attention_bias)
    o_proj_bias: bool = False
    # MoE flavor: "qwen" (softmax-over-all -> topk, SwiGLU experts) or
    # "gptoss" (topk over LOGITS -> softmax over the k values; fused
    # gate_up experts with biases and the clamped gate*sigmoid(1.702*gate)
    # GLU; router bias) — ops/moe.py moe_block_gptoss.
    moe_style: str = "qwen"

    def __post_init__(self):
        # sliding_window and layer_windows are MUTUALLY EXCLUSIVE by
        # contract (the loader's _parse_sliding_window emits exactly one):
        # forward() pre-bands the dense mask with sliding_window for EVERY
        # layer while layer_windows bands per-layer in-body, so setting
        # both would silently band the dense path's full-attention layers
        # while the flash dispatch leaves them full — divergent logits.
        if self.sliding_window and self.layer_windows:
            raise ValueError(
                "sliding_window and layer_windows are mutually exclusive: "
                "uniform stacks use sliding_window, heterogeneous stacks a "
                f"length-L layer_windows (got sliding_window="
                f"{self.sliding_window}, layer_windows={self.layer_windows})")

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def attn_scale_(self) -> float:
        return 1.0 / math.sqrt(self.query_pre_attn_scalar or self.head_dim_)

    @property
    def max_window_(self) -> int:
        """Largest attention window anywhere in the stack (0 = none):
        the value engine guards/compaction reason about."""
        if self.layer_windows:
            return max(self.layer_windows)
        return int(self.sliding_window or 0)

    def window_for_layer(self, l: int) -> int:
        if self.layer_windows:
            return int(self.layer_windows[l])
        return int(self.sliding_window or 0)

    @staticmethod
    def _parse_rope_scaling(cfg: dict) -> tuple:
        """HF config.json `rope_scaling` -> the hashable config tuple.

        Handles both the new-style key (`rope_type`) and the legacy one
        (`type`). `default` / absent -> (); `linear` and `llama3` are
        implemented in :func:`rope_freqs`; anything else raises (the
        reference inherits every scaling via HF AutoModel, so loading such
        a checkpoint with unscaled frequencies would be silently wrong)."""
        rs = cfg.get("rope_scaling")
        if not rs:
            return ()
        kind = rs.get("rope_type", rs.get("type", "default"))
        if kind == "default":
            return ()
        if kind == "linear":
            return ("linear", float(rs["factor"]))
        if kind == "llama3":
            return ("llama3", float(rs["factor"]),
                    float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
                    int(rs["original_max_position_embeddings"]))
        if kind == "yarn":
            # YaRN (arXiv 2309.00071) as transformers implements it
            # (modeling_rope_utils._compute_yarn_parameters, v4.57):
            # attention_factor resolves at parse time from factor /
            # mscale / mscale_all_dim; orig_max falls back to
            # max_position_embeddings (Qwen2.5-1M-style checkpoints set it
            # explicitly). partial_rotary_factor is not supported by this
            # family and assumed 1.0.
            factor = float(rs["factor"])
            att = rs.get("attention_factor")
            mscale = rs.get("mscale")
            mscale_all = rs.get("mscale_all_dim")

            def _get_mscale(scale: float, m: float = 1.0) -> float:
                return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

            if att is None:
                if mscale and mscale_all:
                    att = _get_mscale(factor, mscale) / _get_mscale(factor, mscale_all)
                else:
                    att = _get_mscale(factor)
            orig = int(rs.get("original_max_position_embeddings")
                       or cfg.get("max_position_embeddings", 4096))
            return ("yarn", factor, float(att),
                    float(rs.get("beta_fast") or 32),
                    float(rs.get("beta_slow") or 1),
                    orig, bool(rs.get("truncate", True)))
        raise ValueError(
            f"rope_scaling type {kind!r} is not implemented "
            "(supported: default/linear/llama3/yarn); refusing to load "
            "with wrong RoPE frequencies")

    @staticmethod
    def _parse_sliding_window(cfg: dict) -> dict:
        """HF config.json -> {"sliding_window": W, "layer_windows": (...)}.

        Mirrors transformers' per-layer resolution (Qwen2Config.__init__
        layer_types default: sliding for layers >= max_window_layers when
        sliding_window is set — gated on use_sliding_window for qwen*;
        Mistral applies it to every layer; gemma2 alternates starting
        sliding; gemma3 runs sliding except every Nth layer). Uniform
        stacks parse into `sliding_window`; mixed stacks into the
        per-layer `layer_windows` tuple."""
        mt = cfg.get("model_type", "qwen2")
        sw = cfg.get("sliding_window")
        if (mt.startswith("qwen2") or mt.startswith("qwen3")
                or mt == "smollm3") and not cfg.get(
                "use_sliding_window", False):
            sw = None
        if not sw:
            return {"sliding_window": 0, "layer_windows": ()}
        L = cfg["num_hidden_layers"]
        lt = cfg.get("layer_types")
        if lt is None:
            if mt in ("mistral", "mixtral", "phi3", "starcoder2"):
                # these families slide every layer when the key is set
                lt = ["sliding_attention"] * L
            elif mt == "gemma2":
                # HF Gemma2Config default: even-index layers slide
                lt = ["sliding_attention" if (i + 1) % 2 else "full_attention"
                      for i in range(L)]
            elif mt.startswith("gemma3"):
                # HF Gemma3TextConfig default: every Nth layer is global
                pat = int(cfg.get("sliding_window_pattern", 6))
                lt = ["full_attention" if (i + 1) % pat == 0
                      else "sliding_attention" for i in range(L)]
            else:
                # qwen2/qwen3: layers >= max_window_layers slide; a MISSING
                # key means the HF class default 28, not 0 (defaulting to 0
                # would band every layer of such checkpoints silently)
                mwl = int(cfg.get("max_window_layers", 28))
                lt = ["sliding_attention" if i >= mwl else "full_attention"
                      for i in range(L)]
        if all(t == "full_attention" for t in lt):
            return {"sliding_window": 0, "layer_windows": ()}
        if all(t == "sliding_attention" for t in lt):
            return {"sliding_window": int(sw), "layer_windows": ()}
        return {"sliding_window": 0,
                "layer_windows": tuple(
                    int(sw) if t == "sliding_attention" else 0 for t in lt)}

    @classmethod
    def from_hf(cls, cfg: dict, dtype=jnp.bfloat16) -> "Qwen2Config":
        """Build from an HF config.json dict (model_type qwen2 or llama —
        same decoder family; llama differs only in knobs this config
        already carries: no q/k/v bias, usually untied embeddings, big
        rope_theta)."""
        mt = cfg.get("model_type", "qwen2")
        if mt == "mixtral":
            # Mixtral-8x7B/8x22B: llama-style attention (no qkv bias, big
            # rope_theta) + 8-expert top-2 sparse FFN with NO shared expert.
            # HF MixtralSparseMoeBlock routes softmax-over-all -> top-k ->
            # renormalize, i.e. exactly the norm_topk_prob=True path of
            # ops/moe.route; experts use the FULL intermediate_size and the
            # w1/w3/w2 tensor layout (moe_layout="mixtral").
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 32768),
                rope_theta=cfg.get("rope_theta", 1e6),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
                attention_bias=False,
                num_experts=cfg["num_local_experts"],
                num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
                moe_intermediate_size=cfg["intermediate_size"],
                norm_topk_prob=True,
                moe_layout="mixtral",
                dtype=dtype,
            )
        if mt in ("qwen2_moe", "qwen3_moe"):
            # qwen2_moe (Qwen1.5-MoE-A2.7B): qkv bias + sigmoid-gated shared
            # expert. qwen3_moe (Qwen3-30B-A3B): per-head q/k RMS norm, no
            # bias, NO shared expert. Same router/top-k semantics otherwise.
            L = cfg["num_hidden_layers"]
            sparse_step = cfg.get("decoder_sparse_step", 1)
            mlp_only = cfg.get("mlp_only_layers", []) or []
            sparse = [i not in mlp_only and cfg.get("num_experts", 0) > 0
                      and (i + 1) % max(sparse_step, 1) == 0 for i in range(L)]
            if not all(sparse):
                raise ValueError(
                    f"{mt} checkpoints with dense layers mixed into the "
                    f"stack are not supported (decoder_sparse_step="
                    f"{sparse_step}, mlp_only_layers={mlp_only})")
            q3 = mt == "qwen3_moe"
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=L,
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 32768),
                rope_theta=cfg.get("rope_theta", 1e6 if q3 else 10000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
                attention_bias=(cfg.get("attention_bias", False) if q3
                                else cfg.get("qkv_bias", True)),
                qk_norm=q3,
                num_experts=cfg["num_experts"],
                num_experts_per_tok=cfg.get("num_experts_per_tok", 4),
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                shared_expert_intermediate_size=(0 if q3 else cfg.get(
                    "shared_expert_intermediate_size", 0)),
                norm_topk_prob=cfg.get("norm_topk_prob", False),
                dtype=dtype,
            )
        if mt in ("gemma2", "gemma3_text", "gemma3"):
            if "text_config" in cfg:
                raise ValueError(
                    "multimodal gemma3 checkpoints are not supported; use "
                    "the text-only model (model_type gemma3_text)")
            g3 = mt.startswith("gemma3")
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim", 256),
                max_position_embeddings=cfg.get("max_position_embeddings",
                                                131072 if g3 else 8192),
                rope_theta=cfg.get("rope_theta", 1e6 if g3 else 10000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attention_bias=cfg.get("attention_bias", False),
                qk_norm=g3,  # gemma3 adds per-head q/k RMS norms
                hidden_act=cfg.get("hidden_activation",
                                   cfg.get("hidden_act", "gelu_pytorch_tanh")),
                sandwich_norms=True,
                embed_normalizer=True,
                query_pre_attn_scalar=float(
                    cfg.get("query_pre_attn_scalar", 256)),
                attn_softcap=(0.0 if g3 else float(
                    cfg.get("attn_logit_softcapping") or 0.0)),
                final_softcap=(0.0 if g3 else float(
                    cfg.get("final_logit_softcapping") or 0.0)),
                rope_local_theta=(float(cfg.get("rope_local_base_freq",
                                                10000.0)) if g3 else 0.0),
                dtype=dtype,
            )
        if mt == "smollm3":
            # SmolLM3: llama-style decoder (no biases, tied embeddings)
            # with NoPE — every no_rope_layer_interval-th layer skips
            # rope (HF no_rope_layers: 1 = USE rope; inverted here).
            L = cfg["num_hidden_layers"]
            nr = cfg.get("no_rope_layers")
            if nr is None:
                step = int(cfg.get("no_rope_layer_interval", 4) or 0)
                nr = [0 if (step and (i + 1) % step == 0) else 1
                      for i in range(L)]
            nope = tuple(0 if use else 1 for use in nr)
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=L,
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 65536),
                rope_theta=cfg.get("rope_theta", 2e6),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attention_bias=cfg.get("attention_bias", False),
                nope_layers=(nope if any(nope) else ()),
                dtype=dtype,
            )
        if mt == "starcoder2":
            # StarCoder2: LayerNorm (with bias) on the residual stream,
            # plain c_fc -> gelu -> c_proj FFN, biases on every
            # projection, tied embeddings, optional uniform sliding
            # window.
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 16384),
                rope_theta=cfg.get("rope_theta", 10000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("norm_epsilon", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attention_bias=cfg.get("use_bias", True),
                o_proj_bias=cfg.get("use_bias", True),
                norm_style="layernorm",
                mlp_style="plain",
                hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
                dtype=dtype,
            )
        if mt == "olmo2":
            # OLMo-2: llama-style projections (no biases), post-norms-only
            # residual structure, full-width q/k RMS norms, untied head.
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 4096),
                rope_theta=cfg.get("rope_theta", 10000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
                attention_bias=cfg.get("attention_bias", False),
                post_norms_only=True,
                qk_norm_full=True,
                dtype=dtype,
            )
        if mt == "gpt_oss":
            # GPT-OSS 20B/120B: GQA with biases on ALL projections,
            # learned per-head attention sinks, alternating sliding/full
            # layers (layer_types in the config -> layer_windows), YaRN
            # rope, and a 128-expert top-4 MoE with router bias,
            # topk-then-softmax routing and clamped-GLU experts
            # (moe_style="gptoss"). Checkpoints ship MXFP4 expert blocks;
            # this loader expects the dequantized (bf16) export.
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim", 64),
                max_position_embeddings=cfg.get("max_position_embeddings",
                                                131072),
                rope_theta=cfg.get("rope_theta", 150000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
                attention_bias=cfg.get("attention_bias", True),
                o_proj_bias=cfg.get("attention_bias", True),
                attn_sinks=True,
                num_experts=cfg["num_local_experts"],
                num_experts_per_tok=cfg.get("num_experts_per_tok", 4),
                moe_intermediate_size=cfg["intermediate_size"],
                moe_style="gptoss",
                dtype=dtype,
            )
        if mt == "phi3":
            # Phi-3/3.5-mini and Phi-4: llama-style decoder with fused
            # qkv_proj/gate_up_proj checkpoint mats (split at load), no
            # biases, uniform sliding window when set. The 128k "longrope"
            # variants are rejected by _parse_rope_scaling (frequencies
            # would be silently wrong); partial-rotary variants
            # (phi-4-mini, partial_rotary_factor < 1) are rejected here.
            prf = float(cfg.get("partial_rotary_factor") or 1.0)
            if prf != 1.0:
                raise ValueError(
                    f"phi3 partial_rotary_factor={prf} is not supported "
                    "(RoPE is applied to the full head_dim)")
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 4096),
                rope_theta=cfg.get("rope_theta", 10000.0),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
                tie_word_embeddings=cfg.get("tie_word_embeddings", False),
                attention_bias=False,
                fused_qkv=True,
                dtype=dtype,
            )
        if mt == "qwen3":
            # qwen3 = this decoder minus q/k/v bias plus per-head q/k RMS norm
            return cls(
                vocab_size=cfg["vocab_size"],
                hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg.get("num_key_value_heads",
                                            cfg["num_attention_heads"]),
                head_dim=cfg.get("head_dim"),
                max_position_embeddings=cfg.get("max_position_embeddings", 32768),
                rope_theta=cfg.get("rope_theta", 1e6),
                rope_scaling=cls._parse_rope_scaling(cfg),
                **cls._parse_sliding_window(cfg),
                rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
                tie_word_embeddings=cfg.get("tie_word_embeddings", True),
                attention_bias=cfg.get("attention_bias", False),
                qk_norm=True,
                dtype=dtype,
            )
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            max_position_embeddings=cfg.get("max_position_embeddings", 32768),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cls._parse_rope_scaling(cfg),
            **cls._parse_sliding_window(cfg),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            attention_bias=cfg.get("attention_bias", mt.startswith("qwen2")),
            dtype=dtype,
        )

    @classmethod
    def tiny(cls, **kw) -> "Qwen2Config":
        """A toy config for tests (runs on CPU in <1s)."""
        base = dict(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=10000.0,
            tie_word_embeddings=True,
            dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


# ----------------------------------------------------------------------------
# Parameter init
# ----------------------------------------------------------------------------

def init_params(cfg: Qwen2Config, key: jax.Array) -> dict:
    """Random-init a stacked-parameter pytree (mostly for tests)."""
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    I = cfg.intermediate_size
    ks = jax.random.split(key, 10)

    def init(k, shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    params = {
        "embed": {"weight": init(ks[0], (cfg.vocab_size, H), 0.02)},
        "layers": {
            "input_layernorm": {"scale": jnp.ones((L, H), cfg.dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((L, H), cfg.dtype)},
            "attn": {
                "q_proj": {"w": init(ks[1], (L, H, nh * dh)), "b": jnp.zeros((L, nh * dh), cfg.dtype)},
                "k_proj": {"w": init(ks[2], (L, H, nkv * dh)), "b": jnp.zeros((L, nkv * dh), cfg.dtype)},
                "v_proj": {"w": init(ks[3], (L, H, nkv * dh)), "b": jnp.zeros((L, nkv * dh), cfg.dtype)},
                "o_proj": {"w": init(ks[4], (L, nh * dh, H))},
            },
        },
        "norm": {"scale": jnp.ones((H,), cfg.dtype)},
    }
    if cfg.norm_style == "layernorm":  # starcoder2: biased LayerNorm
        for key in ("input_layernorm", "post_attention_layernorm"):
            params["layers"][key]["bias"] = jnp.zeros((L, H), cfg.dtype)
        params["norm"]["bias"] = jnp.zeros((H,), cfg.dtype)
    if cfg.post_norms_only:  # olmo2: post-norms only
        del params["layers"]["input_layernorm"]
        params["layers"]["post_feedforward_layernorm"] = {
            "scale": jnp.ones((L, H), cfg.dtype)}
    if cfg.qk_norm_full:  # olmo2 full-width q/k norms
        params["layers"]["attn"]["q_norm"] = {"scale": jnp.ones((L, nh * dh), cfg.dtype)}
        params["layers"]["attn"]["k_norm"] = {"scale": jnp.ones((L, nkv * dh), cfg.dtype)}
    if cfg.o_proj_bias:
        params["layers"]["attn"]["o_proj"]["b"] = jnp.zeros((L, H), cfg.dtype)
    if cfg.attn_sinks:
        params["layers"]["attn"]["sinks"] = jnp.zeros((L, nh), jnp.float32)
    if cfg.num_experts > 0 and cfg.moe_style == "gptoss":
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        km = jax.random.split(ks[5], 4)
        params["layers"]["moe"] = {
            "router": {"w": init(km[0], (L, H, E), 0.02),
                       "b": jnp.zeros((L, E), cfg.dtype)},
            "experts": {
                "gate_up": {"w": init(km[1], (L, E, H, 2 * Im)),
                            "b": jnp.zeros((L, E, 2 * Im), cfg.dtype)},
                "down": {"w": init(km[2], (L, E, Im, H)),
                         "b": jnp.zeros((L, E, H), cfg.dtype)},
            },
        }
    elif cfg.num_experts > 0:
        E, Im, Is = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_expert_intermediate_size
        km = jax.random.split(ks[5], 8)
        params["layers"]["moe"] = {
            "router": {"w": init(km[0], (L, H, E), 0.02)},
            "experts": {
                "gate_proj": {"w": init(km[1], (L, E, H, Im))},
                "up_proj": {"w": init(km[2], (L, E, H, Im))},
                "down_proj": {"w": init(km[3], (L, E, Im, H))},
            },
        }
        if Is > 0:  # qwen2_moe's always-on shared expert; qwen3_moe has none
            params["layers"]["moe"]["shared"] = {
                "gate_proj": {"w": init(km[4], (L, H, Is))},
                "up_proj": {"w": init(km[5], (L, H, Is))},
                "down_proj": {"w": init(km[6], (L, Is, H))},
                "gate": {"w": init(km[7], (L, H, 1), 0.02)},
            }
    elif cfg.mlp_style == "plain":  # starcoder2
        params["layers"]["mlp"] = {
            "c_fc": {"w": init(ks[5], (L, H, I)),
                     "b": jnp.zeros((L, I), cfg.dtype)},
            "c_proj": {"w": init(ks[6], (L, I, H)),
                       "b": jnp.zeros((L, H), cfg.dtype)},
        }
    else:
        params["layers"]["mlp"] = {
            "gate_proj": {"w": init(ks[5], (L, H, I))},
            "up_proj": {"w": init(ks[6], (L, H, I))},
            "down_proj": {"w": init(ks[7], (L, I, H))},
        }
    if cfg.sandwich_norms:  # gemma: two extra output norms per layer
        params["layers"]["pre_feedforward_layernorm"] = {
            "scale": jnp.ones((L, H), cfg.dtype)}
        params["layers"]["post_feedforward_layernorm"] = {
            "scale": jnp.ones((L, H), cfg.dtype)}
    if cfg.qk_norm:
        params["layers"]["attn"]["q_norm"] = {"scale": jnp.ones((L, dh), cfg.dtype)}
        params["layers"]["attn"]["k_norm"] = {"scale": jnp.ones((L, dh), cfg.dtype)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": init(ks[8], (cfg.vocab_size, H), 0.02)}
    return params


# ----------------------------------------------------------------------------
# Building blocks
# ----------------------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def _norm(x: jax.Array, p: dict, cfg) -> jax.Array:
    """Layer-norm dispatch for the residual-stream norms: RMS (default)
    or mean-centered LayerNorm with bias (starcoder2,
    cfg.norm_style="layernorm" — p carries {"scale", "bias"}). q/k norms
    and the gemma sandwich norms are always RMS and call rms_norm
    directly."""
    if cfg.norm_style == "layernorm":
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        return (out * p["scale"].astype(jnp.float32)
                + p["bias"].astype(jnp.float32)).astype(x.dtype)
    return rms_norm(x, p["scale"], cfg.rms_norm_eps)


def rope_freqs(positions: jax.Array, dh: int, theta: float,
               scaling: tuple = ()) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables (…, dh/2) for integer positions (…,).

    ``scaling`` is ``Qwen2Config.rope_scaling``: () for none,
    ("linear", factor) divides every frequency by factor,
    ("llama3", factor, low, high, orig_max_pos) applies HF's llama-3.1
    wavelength-dependent interpolation (transformers
    modeling_rope_utils._compute_llama3_parameters): long wavelengths
    (> orig/low) scaled by 1/factor, short (< orig/high) unscaled, the band
    between them linearly blended. ("yarn", factor, attention_factor,
    beta_fast, beta_slow, orig_max_pos, truncate) applies YaRN
    (_compute_yarn_parameters): per-dimension blend between interpolated
    (1/(factor·f)) and extrapolated (1/f) frequencies along a linear ramp
    between the beta_fast/beta_slow correction dims, with cos/sin scaled
    by attention_factor (the mscale temperature)."""
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    att_factor = 1.0
    if scaling and scaling[0] == "linear":
        inv = inv / scaling[1]
    elif scaling and scaling[0] == "llama3":
        _, factor, low, high, orig = scaling
        wavelen = 2.0 * math.pi / inv
        smooth = (orig / wavelen - low) / (high - low)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        inv = (1.0 - smooth) * (inv / factor) + smooth * inv
    elif scaling and scaling[0] == "yarn":
        _, factor, att_factor, beta_fast, beta_slow, orig, truncate = scaling

        # correction dims are static host math (dh/theta are jit-static)
        def _corr_dim(num_rot: float) -> float:
            return (dh * math.log(orig / (num_rot * 2 * math.pi))) / (
                2 * math.log(theta))

        low, high = _corr_dim(beta_fast), _corr_dim(beta_slow)
        if truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, dh - 1)
        if low == high:
            high += 0.001  # transformers' singularity guard
        ramp = jnp.clip(
            (jnp.arange(dh // 2, dtype=jnp.float32) - low) / (high - low),
            0.0, 1.0)
        extrap_factor = 1.0 - ramp
        inv = (inv / factor) * (1.0 - extrap_factor) + inv * extrap_factor
    elif scaling:
        raise ValueError(f"unknown rope scaling {scaling!r}")
    ang = positions.astype(jnp.float32)[..., None] * inv  # (..., dh/2)
    return jnp.cos(ang) * att_factor, jnp.sin(ang) * att_factor


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE; x is (B, T, n, dh), cos/sin are (B, T, dh/2)."""
    dh = x.shape[-1]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


def _sink_softmax(logits, sinks):
    """Softmax over the key axis with a per-head sink column folded into
    the denominator (HF GptOss eager_attention_forward: softmax over
    [logits, sink] then drop the sink — the sink only steals probability
    mass). logits (..., nh-shaped axes ..., S) f32; ``sinks`` broadcastable
    to logits[..., :1]."""
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sinks)
    e = jnp.exp(logits - m)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sinks - m))


def _attend(q, k, v, mask, cfg, sinks=None):
    """Grouped-query attention core. q:(B,T,nh,dh) k,v:(B,S,nkv,dh) mask:(B,T,S).

    ``sinks`` (nh,) f32: gpt_oss learned attention sinks (see
    :func:`_sink_softmax`)."""
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    group = nh // nkv
    B, T = q.shape[0], q.shape[1]
    S = k.shape[1]
    dh = q.shape[-1]
    qg = q.reshape(B, T, nkv, group, dh)
    # f32 logits on the MXU
    logits = jnp.einsum("btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32)
    # gemma's query_pre_attn_scalar overrides; otherwise the RUNTIME head
    # dim (callers may pass tensors whose dh differs from cfg.head_dim_)
    logits = logits * (cfg.attn_scale_ if cfg.query_pre_attn_scalar
                       else 1.0 / math.sqrt(dh))
    if cfg.attn_softcap:  # gemma2: soft-clamp logits to ±cap before mask
        logits = jnp.tanh(logits / cfg.attn_softcap) * cfg.attn_softcap
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    if sinks is not None:
        probs = _sink_softmax(
            logits, sinks.astype(jnp.float32).reshape(nkv, group)[
                None, :, :, None, None])
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.reshape(B, T, nh, dh).astype(q.dtype)


def _dispatch_attend(cfg, q, k, v, mask, key_mask, win=None, sinks=None):
    """Choose flash (pallas) vs dense attention for the no-cache path.

    Accepted impl names: "pallas"/"flash"/"flash_attention_2" force the
    Pallas kernel (interpret mode off-TPU — the reference yaml's
    flash_attention_2 maps here); "auto" = kernel on TPU, dense elsewhere;
    anything else ("dense"/"eager"/"sdpa") = dense. The kernel is fully
    differentiable (ops/flash_attention.py backward) and carries the
    gemma knobs (scale override + logit softcap) natively.

    Heterogeneous stacks (cfg.layer_windows): ``win`` is the traced
    per-layer window scanned through the layer body. When the stack is
    two-valued {0, W} (gemma2/gemma3), a ``lax.cond`` picks between the
    banded and full kernels — both compile once for the whole scan.
    Stacks with >2 distinct widths fall back to the dense in-body mask."""
    impl = str(getattr(cfg, "attn_impl", "auto")).lower()
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = impl in ("pallas", "flash", "flash_attention_2") or (
        impl == "auto" and on_tpu)
    if use_pallas and key_mask is not None:
        from ..ops.flash_attention import flash_attention

        kw = dict(causal=True, scale=cfg.attn_scale_,
                  softcap=float(cfg.attn_softcap), interpret=not on_tpu,
                  sinks=sinks)
        if cfg.layer_windows:
            Wmax = cfg.max_window_
            if win is not None and set(cfg.layer_windows) <= {0, Wmax}:
                return jax.lax.cond(
                    win > 0,
                    lambda q_, k_, v_: flash_attention(
                        q_, k_, v_, key_mask, window=Wmax, **kw),
                    lambda q_, k_, v_: flash_attention(
                        q_, k_, v_, key_mask, window=0, **kw),
                    q, k, v)
        else:
            return flash_attention(q, k, v, key_mask,
                                   window=int(cfg.sliding_window or 0), **kw)
    return _attend(q, k, v, mask, cfg, sinks=sinks)


def _dispatch_attend_cached(cfg, q, k, v, mask, key_mask, qstart, win=None,
                            sinks=None):
    """Choose flash vs dense for the CACHE-THREADED prefill path.

    Same impl-name policy as :func:`_dispatch_attend`, but the attention
    is rectangular — T new-token queries at absolute positions
    ``qstart[b] + t`` over the whole (B, S) cache — so it rides the
    forward-only ``flash_attention_cached`` kernel
    (ops/flash_attention.py): causal-past-frontier KV blocks are skipped
    per batch row via the prefetched qstart, and nothing (B,nh,T,S)-sized
    ever materializes in HBM. ``key_mask`` here is the (B, S) CACHE-column
    validity (prefix + written suffix; compacted caches may have holes).
    Heterogeneous {0, W} stacks pick banded/full via ``lax.cond`` exactly
    like the no-cache dispatch; >2 widths fall back to dense."""
    impl = str(getattr(cfg, "attn_impl", "auto")).lower()
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = impl in ("pallas", "flash", "flash_attention_2") or (
        impl == "auto" and on_tpu)
    if use_pallas and key_mask is not None:
        from ..ops.flash_attention import flash_attention_cached

        kw = dict(scale=cfg.attn_scale_, softcap=float(cfg.attn_softcap),
                  interpret=not on_tpu, sinks=sinks)
        if cfg.layer_windows:
            Wmax = cfg.max_window_
            if win is not None and set(cfg.layer_windows) <= {0, Wmax}:
                return jax.lax.cond(
                    win > 0,
                    lambda q_, k_, v_: flash_attention_cached(
                        q_, k_, v_, key_mask, qstart, window=Wmax, **kw),
                    lambda q_, k_, v_: flash_attention_cached(
                        q_, k_, v_, key_mask, qstart, window=0, **kw),
                    q, k, v)
        else:
            return flash_attention_cached(
                q, k, v, key_mask, qstart,
                window=int(cfg.sliding_window or 0), **kw)
    return _attend(q, k, v, mask, cfg, sinks=sinks)


def _layer_body(cfg: Qwen2Config, carry, layer_params, key_mask=None,
                attend_fn=None, win=None, rope_loc=None, qk_idx=None,
                use_rope=None):
    """One decoder layer; scanned over the stacked layer axis.

    ``attend_fn(q, k, v, sinks=, win=) -> att`` overrides the no-cache
    attention core — used by models/qwen2_seq.forward_seq to substitute
    ring attention when the layer runs inside a sequence-sharded
    shard_map. The layer's attention-sink logits and (traced) window
    width are forwarded so the override can fold them (the in-body mask
    banding below only covers the dense qk_idx path).

    Heterogeneous stacks (cfg.layer_windows — gemma2/gemma3) thread the
    per-layer window width ``win`` (traced i32 scalar, a scanned operand)
    plus ``qk_idx = (qpos, kpos)`` broadcastable index/position arrays:
    the banded mask is rebuilt in-body (boolean ops XLA fuses into the
    attention select — nothing (B,T,S)-sized materializes in HBM).
    ``rope_loc = (cos_loc, sin_loc)`` swaps in the local-rope tables on
    windowed layers (gemma3's dual-theta rope)."""
    x, cos, sin, mask, cache_k, cache_v, cache_pos = carry
    p = layer_params
    B, T, H = x.shape
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    if win is not None and qk_idx is not None:
        qpos, kpos = qk_idx
        mask = mask & ((win <= 0) | (kpos > qpos - win))
    if win is not None and rope_loc is not None:
        cos = jnp.where(win > 0, rope_loc[0], cos)
        sin = jnp.where(win > 0, rope_loc[1], sin)
    if use_rope is not None:  # smollm3 NoPE: cos=1/sin=0 is the identity
        cos = jnp.where(use_rope > 0, cos, 1.0)
        sin = jnp.where(use_rope > 0, sin, 0.0)

    h = (x if cfg.post_norms_only  # olmo2: no pre-norm
         else _norm(x, p["input_layernorm"], cfg))
    dq = lambda w: dequant(w, x.dtype)
    q = (jnp.einsum("bth,hd->btd", h, dq(p["attn"]["q_proj"]["w"]), preferred_element_type=jnp.float32)
         + p["attn"]["q_proj"]["b"].astype(jnp.float32)).astype(x.dtype)
    k = (jnp.einsum("bth,hd->btd", h, dq(p["attn"]["k_proj"]["w"]), preferred_element_type=jnp.float32)
         + p["attn"]["k_proj"]["b"].astype(jnp.float32)).astype(x.dtype)
    v = (jnp.einsum("bth,hd->btd", h, dq(p["attn"]["v_proj"]["w"]), preferred_element_type=jnp.float32)
         + p["attn"]["v_proj"]["b"].astype(jnp.float32)).astype(x.dtype).reshape(B, T, nkv, dh)

    if cfg.qk_norm_full:  # olmo2: RMS norm over the FULL projection width
        q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
        k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
    q = q.reshape(B, T, nh, dh)
    k = k.reshape(B, T, nkv, dh)
    if cfg.qk_norm:  # qwen3: per-head RMS norm over dh, before RoPE
        q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
        k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    # named remat targets: `remat="save_qkv"` keeps the post-RoPE
    # projections across the backward (flash bwd re-reads them instead of
    # recomputing 4 projections per layer) at B·T·(nh+2nkv)·dh bytes/layer
    from jax.ad_checkpoint import checkpoint_name

    q = checkpoint_name(q, "qkv")
    k = checkpoint_name(k, "qkv")
    v = checkpoint_name(v, "qkv")

    sinks = p["attn"]["sinks"] if cfg.attn_sinks else None
    if cache_k is not None:
        # write new K/V at cache_pos (scalar: same offset for all rows;
        # (B,)-array: per-row offsets, enabling ragged right-aligned caches)
        if getattr(cache_pos, "ndim", 0) >= 1:
            b_idx = jnp.arange(B)[:, None]
            t_idx = cache_pos[:, None] + jnp.arange(T)[None, :]
            new_k = cache_k.at[b_idx, t_idx].set(k)
            new_v = cache_v.at[b_idx, t_idx].set(v)
        else:
            new_k = jax.lax.dynamic_update_slice(cache_k, k, (0, cache_pos, 0, 0))
            new_v = jax.lax.dynamic_update_slice(cache_v, v, (0, cache_pos, 0, 0))
        att = _dispatch_attend_cached(cfg, q, new_k, new_v, mask, key_mask,
                                      cache_pos, win=win, sinks=sinks)
    else:
        new_k = new_v = None
        att = (attend_fn(q, k, v, sinks=sinks, win=win)
               if attend_fn is not None
               else _dispatch_attend(cfg, q, k, v, mask, key_mask, win=win,
                                     sinks=sinks))

    # `remat="save_attn"` keeps the attention core's output: the backward
    # then reruns only the flash BWD kernel, never the fwd (B·T·nh·dh/layer)
    att = checkpoint_name(att, "attn_out")
    att = jnp.einsum("btd,dh->bth", att.reshape(B, T, nh * dh), dq(p["attn"]["o_proj"]["w"]),
                     preferred_element_type=jnp.float32)
    if cfg.o_proj_bias:  # gpt_oss biases o_proj too
        att = att + p["attn"]["o_proj"]["b"].astype(jnp.float32)
    att = att.astype(x.dtype)
    if cfg.sandwich_norms:
        # gemma residual structure: norm the SUBLAYER OUTPUTS (post-attn /
        # post-ffn) in addition to the two pre-norms
        att = _norm(att, p["post_attention_layernorm"], cfg)
        x = x + att
        h = _norm(x, p["pre_feedforward_layernorm"], cfg)
        m = _norm(_mlp(cfg, p, h), p["post_feedforward_layernorm"], cfg)
        x = x + m
    elif cfg.post_norms_only:
        # olmo2: norm the sublayer OUTPUTS, no pre-norms; the mlp takes
        # the raw residual stream
        x = x + _norm(att, p["post_attention_layernorm"], cfg)
        x = x + _norm(_mlp(cfg, p, x), p["post_feedforward_layernorm"], cfg)
    else:
        x = x + att
        h = _norm(x, p["post_attention_layernorm"], cfg)
        x = x + _mlp(cfg, p, h)
    return (x, cos, sin, mask, cache_k, cache_v, cache_pos), (new_k, new_v)


def _q_matmul_f32(h: jax.Array, w) -> jax.Array:
    """h (..., IN) @ weight leaf -> (..., OUT) f32-accum.

    Packed-int4 leaves ({"q","s4"}, models/quant.py) route through the
    Pallas dequant-matmul kernel on TPU (ops/int4_matmul.py) at DECODE
    row counts: XLA cannot fuse the nibble unpack into a dot operand read
    and materializes the unpacked weights (measured 7x slower than int8 —
    BASELINE.md), so the unpack must happen in VMEM. At PREFILL row
    counts the call is compute-bound, the one-off bf16 materialization
    amortizes over the tokens, and the kernel's whole-x VMEM block would
    not fit — so large row counts take the XLA dequant einsum.
    Everything else takes the plain einsum with dequant fused by XLA."""
    if is_quantized(w) and "s4" in w:
        lead = h.shape[:-1]
        rows = 1
        for d in lead:
            rows *= d
        if rows <= 512:
            from ..ops.int4_matmul import int4_matmul

            on_tpu = jax.default_backend() == "tpu"
            y = int4_matmul(h.reshape(-1, h.shape[-1]), w["q"], w["s4"],
                            interpret=not on_tpu, layer=w.get("layer"))
            return y.reshape(*lead, y.shape[-1])
        if "layer" in w:  # stacked leaf (decode _layer_params tag)
            w = {"q": w["q"][w["layer"]], "s4": w["s4"][w["layer"]]}
    return jnp.einsum("...h,hd->...d", h, dequant(w, h.dtype),
                      preferred_element_type=jnp.float32)


def _mlp(cfg: Qwen2Config, p: dict, h: jax.Array) -> jax.Array:
    """Post-attention FFN on normed hidden h (..., H) — dense SwiGLU, or
    the sparse MoE block (ops/moe.py) when the config has experts. Shared
    by the prefill/train forward ((B,T,H)) and both decode paths ((B,H)
    and (B,T,H)): one definition keeps their streams bit-identical."""
    H = h.shape[-1]
    if cfg.num_experts > 0:
        if cfg.moe_style == "gptoss":
            from ..ops.moe import moe_block_gptoss

            out = moe_block_gptoss(h.reshape(-1, H), p["moe"],
                                   top_k=cfg.num_experts_per_tok,
                                   impl=cfg.moe_impl,
                                   capacity_factor=cfg.moe_capacity_factor)
            return out.reshape(h.shape)
        from ..ops.moe import moe_block  # lazy: ops.moe imports models.quant

        out = moe_block(h.reshape(-1, H), p["moe"],
                        capacity_factor=cfg.moe_capacity_factor,
                        top_k=cfg.num_experts_per_tok,
                        norm_topk=cfg.norm_topk_prob, impl=cfg.moe_impl)
        return out.reshape(h.shape)
    if cfg.mlp_style == "plain":  # starcoder2: c_fc -> act -> c_proj, biased
        y = (_q_matmul_f32(h, p["mlp"]["c_fc"]["w"])
             + p["mlp"]["c_fc"]["b"].astype(jnp.float32))
        act = (jax.nn.gelu(y, approximate=True)
               if cfg.hidden_act == "gelu_pytorch_tanh"
               else jax.nn.silu(y)).astype(h.dtype)
        return (_q_matmul_f32(act, p["mlp"]["c_proj"]["w"])
                + p["mlp"]["c_proj"]["b"].astype(jnp.float32)).astype(h.dtype)
    gate = _q_matmul_f32(h, p["mlp"]["gate_proj"]["w"])
    up = _q_matmul_f32(h, p["mlp"]["up_proj"]["w"])
    if cfg.hidden_act == "gelu_pytorch_tanh":  # gemma GeGLU
        act = (jax.nn.gelu(gate, approximate=True) * up).astype(h.dtype)
    else:
        act = (jax.nn.silu(gate) * up).astype(h.dtype)
    return _q_matmul_f32(act, p["mlp"]["down_proj"]["w"]).astype(h.dtype)


def _embed(params: dict, cfg: Qwen2Config, toks: jax.Array) -> jax.Array:
    """Token embedding lookup (...,) int32 -> (..., H) in cfg.dtype. int8
    tables gather rows then scale — never materialize the bf16 table."""
    emb = params["embed"]["weight"]
    if is_quantized(emb):
        x = emb["q"][toks].astype(cfg.dtype) * emb["s"][0].astype(cfg.dtype)
    else:
        x = emb[toks].astype(cfg.dtype)
    if cfg.embed_normalizer:  # gemma: scale by sqrt(H), cast to dtype as HF
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, cfg.dtype)
    return x


def _lm_head(params: dict, cfg: Qwen2Config, x: jax.Array) -> jax.Array:
    """Final-normed hidden (..., H) -> logits (..., V) f32. int8 heads fold
    the per-H scale into x so the big operand stays int8."""
    head_w = (params["embed"]["weight"] if cfg.tie_word_embeddings
              else params["lm_head"]["weight"])
    if is_quantized(head_w):
        xs = x * head_w["s"][0].astype(x.dtype)
        logits = jnp.einsum("...h,vh->...v", xs, head_w["q"].astype(x.dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("...h,vh->...v", x, head_w,
                            preferred_element_type=jnp.float32)
    if cfg.final_softcap:  # gemma2: soft-clamp the output logits
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits


def _quantize_kv(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., dh) -> (int8 values, (...,) f32 per-vector scale): symmetric
    amax/127 quantization for the int8 KV cache. The ONE definition shared
    by decode_step and decode_step_multi — spec-verify writes must quantize
    bit-identically to sequential decode writes (engine/spec.py parity)."""
    tf = t.astype(jnp.float32)
    s_ = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1) / 127.0, 1e-12)
    return (jnp.clip(jnp.round(tf / s_[..., None]), -127, 127)
            .astype(jnp.int8), s_)


def remat_policy(remat):
    """Map a remat knob to a jax.checkpoint policy.

    ``True`` / ``"full"``: save nothing (recompute the whole layer — the
    round-3 default, min memory / max recompute). ``"save_qkv"`` /
    ``"save_attn"`` / ``"save_qkv_attn"``: keep the named intermediates
    (checkpoint_name tags in _layer_body) across the backward, trading
    per-layer activation memory for skipped recompute FLOPs — the lever
    the round-3 profile identified (flash fwd recompute = 42% of the
    train step) for meshes with memory headroom (FSDP)."""
    if remat is True or remat == "full":
        return None  # jax.checkpoint default: save nothing
    names = {"save_qkv": ("qkv",), "save_attn": ("attn_out",),
             "save_qkv_attn": ("qkv", "attn_out")}.get(remat)
    if names is None:
        raise ValueError(f"unknown remat policy {remat!r} (expected True, "
                         "'full', 'save_qkv', 'save_attn', 'save_qkv_attn')")
    return jax.checkpoint_policies.save_only_these_names(*names)


def _scan_layers(cfg: Qwen2Config, params: dict, x, cos, sin, mask, kv_cache=None, cache_pos=0, remat=False, key_mask=None, rope_loc=None, qk_idx=None):
    """Scan the stacked layer params. Returns (hidden, new_kv) where new_kv is
    the per-layer (k, v) stack when a cache is threaded, else None.

    Heterogeneous stacks (cfg.layer_windows) scan the per-layer window
    widths alongside the params; ``qk_idx``/``rope_loc`` feed the in-body
    banding / local-rope select (_layer_body docstring)."""
    layer_params = params["layers"]
    wins = (jnp.asarray(cfg.layer_windows, jnp.int32)
            if cfg.layer_windows else None)
    ropes = (jnp.asarray([1 - f for f in cfg.nope_layers], jnp.int32)
             if cfg.nope_layers else None)
    assert not (wins is not None and ropes is not None),         "layer_windows and nope_layers cannot combine"

    if kv_cache is None:
        if ropes is not None:
            def body(x, pr):
                (x2, *_), _ = _layer_body(cfg, (x, cos, sin, mask, None, None, 0),
                                          pr[0], key_mask=key_mask,
                                          use_rope=pr[1])
                return x2, None
            xs = (layer_params, ropes)
        elif wins is None:
            def body(x, p):
                (x2, *_), _ = _layer_body(cfg, (x, cos, sin, mask, None, None, 0), p,
                                          key_mask=key_mask)
                return x2, None
            xs = layer_params
        else:
            def body(x, pw):
                (x2, *_), _ = _layer_body(cfg, (x, cos, sin, mask, None, None, 0),
                                          pw[0], key_mask=key_mask, win=pw[1],
                                          rope_loc=rope_loc, qk_idx=qk_idx)
                return x2, None
            xs = (layer_params, wins)
        if remat:
            body = jax.checkpoint(body, prevent_cse=False,
                                  policy=remat_policy(remat))
        x, _ = jax.lax.scan(body, x, xs)
        return x, None

    ck, cv = kv_cache  # (L, B, S, nkv, dh)

    if ropes is not None:
        def body(x, inputs):
            p, ck_l, cv_l, r = inputs
            (x2, *_), (nk, nv) = _layer_body(
                cfg, (x, cos, sin, mask, ck_l, cv_l, cache_pos), p,
                key_mask=key_mask, use_rope=r)
            return x2, (nk, nv)
        x, (nk, nv) = jax.lax.scan(body, x, (layer_params, ck, cv, ropes))
    elif wins is None:
        def body(x, inputs):
            p, ck_l, cv_l = inputs
            (x2, *_), (nk, nv) = _layer_body(
                cfg, (x, cos, sin, mask, ck_l, cv_l, cache_pos), p,
                key_mask=key_mask)
            return x2, (nk, nv)
        x, (nk, nv) = jax.lax.scan(body, x, (layer_params, ck, cv))
    else:
        def body(x, inputs):
            p, ck_l, cv_l, w = inputs
            (x2, *_), (nk, nv) = _layer_body(
                cfg, (x, cos, sin, mask, ck_l, cv_l, cache_pos), p,
                key_mask=key_mask, win=w, rope_loc=rope_loc, qk_idx=qk_idx)
            return x2, (nk, nv)
        x, (nk, nv) = jax.lax.scan(body, x, (layer_params, ck, cv, wins))
    return x, (nk, nv)


def forward(
    params: dict,
    cfg: Qwen2Config,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    positions: jax.Array | None = None,
    kv_cache: tuple[jax.Array, jax.Array] | None = None,
    cache_pos: int | jax.Array = 0,
    kv_valid: jax.Array | None = None,
    remat: bool = False,
    return_hidden: bool = False,
    compute_logits: bool = True,
    block_bidir: bool = False,
):
    """Full forward pass.

    Two modes:
      * prefill/training — ``kv_cache=None``: causal attention over input_ids
        (B,T) with optional padding ``attention_mask`` (B,T).
      * decode — ``kv_cache=(k,v)`` of shape (L,B,S,nkv,dh): the T new tokens
        are written at ``cache_pos`` and attend over positions where
        ``kv_valid`` (B,S) is true (plus themselves, causally).

    Returns (logits, last_hidden | None, new_kv_cache | None).
    """
    B, T = input_ids.shape
    x = _embed(params, cfg, input_ids)

    if positions is None:
        if attention_mask is not None:
            # left-padding friendly: position = cumsum(mask)-1, clamped at 0
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = rope_freqs(positions, cfg.head_dim_, cfg.rope_theta,
                          cfg.rope_scaling)
    # gemma3 dual rope: windowed (local) layers use rope_local_theta with
    # no scaling; the layer scan selects per layer
    rope_loc = (rope_freqs(positions, cfg.head_dim_, cfg.rope_local_theta, ())
                if (cfg.rope_local_theta and cfg.layer_windows) else None)

    W = int(cfg.sliding_window or 0)
    if kv_cache is None:
        causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
        if W:
            # banded mask: key j visible to query i iff i-W < j <= i.
            # Index-based banding equals position-based for left-padded
            # rows (query and key indices shift by the same pad offset).
            causal = causal & jnp.triu(jnp.ones((T, T), jnp.bool_), -(W - 1))
        causal = causal[None, :, :]
        if attention_mask is not None:
            mask = causal & (attention_mask[:, None, :] > 0)
            key_mask = attention_mask
        else:
            mask = jnp.broadcast_to(causal, (B, T, T))
            key_mask = jnp.ones((B, T), jnp.int32)
        # heterogeneous stacks band in-body off these index arrays
        qk_idx = ((jnp.arange(T)[None, :, None], jnp.arange(T)[None, None, :])
                  if cfg.layer_windows else None)
        x, _ = _scan_layers(cfg, params, x, cos, sin, mask, remat=remat,
                            key_mask=key_mask, rope_loc=rope_loc, qk_idx=qk_idx)
        new_cache = None
    else:
        S = kv_cache[0].shape[2]
        kpos = jnp.arange(S)[None, None, :]  # (1,1,S)
        cp = jnp.asarray(cache_pos)
        cp_btc = cp[:, None, None] if cp.ndim >= 1 else cp  # (B,1,1) | scalar
        valid = kv_valid[:, None, :] if kv_valid is not None else (kpos < (cp_btc + T))
        # new tokens at slots [cache_pos, cache_pos+T): causal among themselves
        qpos = cp_btc + jnp.arange(T)[None, :, None]  # (B|1, T, 1)
        if block_bidir:
            # block-diffusion denoising (engine/diffusion.py): the T new
            # tokens attend to each other BIDIRECTIONALLY in addition to
            # the causal past — SDAR/BD3-style block-causal masking. The
            # in-block columns are exactly kpos >= cache_pos (kv_valid
            # bounds them above at cache_pos + T).
            mask = valid & ((kpos <= qpos) | (kpos >= cp_btc))
        else:
            mask = valid & (kpos <= qpos)
        if W:
            # cache slots are positions in this mode (prompt at [0, plen),
            # continuation written at its position): band by slot index
            mask = mask & (kpos > qpos - W)
        qk_idx = ((jnp.broadcast_to(qpos, (B, T, 1)) if cp.ndim >= 1 else
                   jnp.broadcast_to(qpos, (1, T, 1)), kpos)
                  if cfg.layer_windows else None)
        # block_bidir forces the dense attend: flash_attention_cached
        # recomputes a CAUSAL frontier from cache_pos in-kernel, which
        # cannot express the in-block bidirectional columns (key_mask=None
        # routes _dispatch_attend_cached to _attend with the explicit mask)
        key_mask_c = (None if block_bidir else
                      cached_key_mask(kv_valid, cache_pos, T, B, S))
        x, (nk, nv) = _scan_layers(cfg, params, x, cos, sin, mask, kv_cache,
                                   cache_pos, key_mask=key_mask_c,
                                   rope_loc=rope_loc, qk_idx=qk_idx)
        new_cache = (nk, nv)

    x = _norm(x, params["norm"], cfg)
    if not compute_logits:
        # training losses compute selective logps from the hidden states in
        # sequence chunks (losses._selective_logps_chunked) — materializing
        # the full (B, L, V) f32 logits is 20 GB at B=8, L=4k, V=152k
        return None, (x if return_hidden else None), new_cache
    logits = _lm_head(params, cfg, x)
    return logits, (x if return_hidden else None), new_cache


def init_kv_cache(cfg: Qwen2Config, batch: int, max_len: int) -> tuple[jax.Array, jax.Array]:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim_)
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


def cached_key_mask(kv_valid, cache_pos, T: int, B: int, S: int) -> jax.Array:
    """(B, S) int32 cache-column validity for the rectangular flash kernel
    (ops/flash_attention.flash_attention_cached; the causal frontier is
    recomputed in-kernel from cache_pos). Shared by the qwen2 and deepseek
    cached-prefill paths so their validity semantics stay in lockstep:
    explicit ``kv_valid`` wins; otherwise columns [0, cache_pos + T) are
    valid (per-row when cache_pos is a vector)."""
    if kv_valid is not None:
        assert kv_valid.shape == (B, S), (kv_valid.shape, (B, S))
        return kv_valid.astype(jnp.int32)
    cp = jnp.asarray(cache_pos)
    end = (cp[:, None] if cp.ndim >= 1 else cp) + T
    return jnp.broadcast_to(jnp.arange(S)[None, :] < end,
                            (B, S)).astype(jnp.int32)


def _layer_params(params: dict, l: int) -> dict:
    """Static per-layer slice of the stacked layer pytree (zero-copy views;
    works for quantized {'q','s'} leaves too — both carry the leading L).

    Packed-int4 leaves ({"q","s4"}) are NOT sliced: an XLA ``w[l]`` view
    feeding a Pallas custom call materializes the whole (IN/2, OUT) u8
    slice per layer per decode step (261 MB/step at 1.5B — profiled as
    slice_bitcast loop fusions). They stay stacked with a static "layer"
    tag and :func:`_q_matmul_f32` passes the index into the kernel's
    BlockSpec, so the per-layer pick happens in the block DMA."""

    def slice_node(node):
        if isinstance(node, dict):
            if "s4" in node and "q" in node:
                if node["q"].ndim == 3:  # dense (L, IN/2, OUT) projection
                    return {"q": node["q"], "s4": node["s4"], "layer": l}
                # MoE expert stacks (L, E, ...): ops/moe.py infers the
                # expert count from q.shape[0] and dequants at the use
                # site, so these MUST be sliced per layer (the BlockSpec
                # layer-index trick only applies to the dense decode
                # projections above).
                return {k: v[l] for k, v in node.items()}
            return {k: slice_node(v) for k, v in node.items()}
        return node[l]

    return slice_node(params["layers"])


def decode_step(
    params: dict,
    cfg: Qwen2Config,
    tok: jax.Array,        # (B,) int32 — the tokens to forward
    positions: jax.Array,  # (B,) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, nkv, S, dh) — decode layout (see below)
    cache_v: jax.Array,
    slot: jax.Array,       # scalar int32 — uniform cache slot for this step
    lens: jax.Array,       # (B,) int32 — prompt lengths (prefix validity)
    dstart: jax.Array,     # (B,) int32 — first VALID decode slot per row
    return_hidden: bool = False,
    ragged: bool | None = None,
    cache_scale: tuple[jax.Array, jax.Array] | None = None,
    win_cache: dict | None = None,
    win_pad: int = 0,
):
    """One-token decode for all rows — the engine's hot loop body.

    TPU-first decode design, distinct from :func:`forward`'s scan-threaded
    cache (profiled on v5e: threading the cache through ``lax.scan`` xs/ys
    plus the per-row scatter copied the full (B,S,nkv,dh) layer slice FOUR
    times per layer-step — more HBM traffic than the attention itself):

    - the Python loop unrolls the stacked layers, so each layer's K/V is a
      STATIC slice of the carried cache — a zero-copy view XLA fuses
      straight into the attention reads. The decode cache layout is
      (L, B, nkv, S, dh) — nkv OUTSIDE S so each (l, b, h) panel is a
      contiguous, tile-aligned (S, dh) block the ragged Pallas kernel can
      DMA range-wise (callers transpose from the prefill layout once per
      generate; the prefill layout keeps S next to nkv for the scan path);
    - every row writes this step's K/V at the SAME slot (slot-uniform
      layout: each row's ragged prompt lives at slots [0, lens[b]) inside a
      shared slab; global decode step t writes one shared column) — one
      scalar-indexed ``dynamic_update_slice`` of (1,B,1,nkv,dh) per layer
      instead of a per-row scatter that rewrites the whole slice. Positions
      stay ragged (RoPE uses ``positions``); attention only needs
      set-validity: slot j is valid for row b iff j < lens[b] (prompt) or
      dstart[b] <= j <= slot (the row's decode columns — per-row dstart so
      a continuously-batched row admitted at a later column ignores the
      columns written before it joined). Slots need not be position-ordered.

    ``cache_scale=(ks, vs)`` (each (L, B, nkv, S) f32) switches the caches
    to int8 with per-vector scales (int8 KV cache): decode is HBM-bound and
    at large B the KV reads rival the weight stream (7B B=48 S=1k: ~2.5 GB
    bf16 per step vs 7.6 GB int8 weights), so halving them is a direct
    step-time win. Writes quantize this step's K/V (amax/127 per (b,h)
    vector); reads fold the K scale into the attention logits and the V
    scale into the probabilities, so the MXU operands stay bf16 casts of
    int8 — traffic is int8, compute is exact given the quantized values.
    Composes with ``ragged`` (the kernel DMAs scale rows with the chunks).

    ``win_cache`` switches SLIDING-WINDOW layers to a SHORT per-layer cache
    (the vLLM per-layer-window-cache capability, slot-uniform realization):
    instead of full-S panels, windowed layers read/write a
    (Lw, B, nkv, Sw, dh) stack where Sw = win_pad + decode-budget columns —
    cols [0, win_pad) hold each row's prompt TAIL (full slots
    [woff[b], woff[b]+win_pad), woff = lens - win_pad, gathered at install
    by the engine) and cols [win_pad, Sw) the decode columns (this step
    writes col win_pad + slot - slab). At long prompts this cuts both the
    windowed layers' decode reads (O(Sw) not O(S)) and the decode-resident
    cache memory (the n-fan-out-multiplied cost). In this mode ``cache_k``/
    ``cache_v`` (and ``cache_scale``) hold ONLY the full-attention layers,
    stacked in layer order — the static layer loop maps l to its stack.
    Dict keys: "k"/"v" (+"ks"/"vs" f32 (Lw,B,nkv,Sw) when int8), "woff"
    (B,), "slab" (scalar: the decode region's first full slot). Assumes
    dstart == slab for every row (the sync engine's geometry — rows
    admitted mid-stream need the full-S path).

    Returns (logits (B,V) f32, hidden (B,H)|None, cache_k, cache_v) — plus
    the updated ``cache_scale`` tuple appended when quantized, plus the
    updated ``win_cache`` dict appended when windowed-short mode is on.
    """
    L = cfg.num_hidden_layers
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    group = nh // nkv
    B = tok.shape[0]
    S = cache_k.shape[3]
    scale = cfg.attn_scale_

    x = _embed(params, cfg, tok)  # (B, H)

    cos, sin = rope_freqs(positions, dh, cfg.rope_theta,
                          cfg.rope_scaling)  # (B, dh/2)
    # per-layer windows: the Python layer loop is unrolled, so every
    # heterogeneous choice below (window, rope table, ragged-vs-dense) is
    # STATIC per layer — zero runtime dispatch (gemma2/gemma3 stacks)
    W_layers = [cfg.window_for_layer(l) for l in range(L)]
    cos_loc = sin_loc = None
    if cfg.rope_local_theta and any(W_layers):
        cos_loc, sin_loc = rope_freqs(positions, dh, cfg.rope_local_theta, ())

    def rope1(v, c, s_):  # (B, n, dh)
        c, s_ = c[:, None, :], s_[:, None, :]
        v1, v2 = v[..., : dh // 2].astype(jnp.float32), v[..., dh // 2 :].astype(jnp.float32)
        return jnp.concatenate([v1 * c - v2 * s_, v2 * c + v1 * s_], -1).astype(v.dtype)

    # ragged Pallas kernel: reads ONLY [0, lens[b]) ∪ [dstart[b], slot] from
    # HBM. Wins when cache occupancy is LOW relative to S (the scheduler's
    # persistent S=max_model_len cache: measured 13.65 -> 9.91 ms/step at
    # S=4096, lens~500, B=48 on 1.5B with block_k=1024 — BASELINE.md
    # round-3 session-7); loses to dense when S is sized tightly to the
    # request (the sync engine: occupancy >= 75%, kernel overheads exceed
    # the traffic saved). Callers choose; ragged=None falls back to the
    # LAPHA_RAGGED_DECODE env (default dense).
    import os as _os

    if ragged is None:
        ragged = _os.getenv("LAPHA_RAGGED_DECODE") == "1"
    # the kernel has no softcap (gemma2 goes dense); WINDOWED layers ride
    # it with window-clipped ranges (pstart/dstart' below) — at S >> W
    # that cuts their cache reads from O(S) to O(W) per row, the
    # vLLM-per-layer-window-cache role realized as ranged DMA
    use_ragged = (bool(ragged) and jax.default_backend() == "tpu"
                  and dh % 128 == 0 and S % 256 == 0
                  and cfg.attn_softcap == 0)
    if cache_scale is not None:
        ks_all, vs_all = cache_scale
    # windowed-short mode: static layer -> stack-index maps (the loop is
    # unrolled, cfg.layer_windows is static)
    full_map = {l: l for l in range(L)}
    wvalid = {}
    if win_cache is not None:
        full_map = {}
        win_map = {}
        for l, w in enumerate(W_layers):
            (win_map if w else full_map)[l] = len(win_map if w else full_map)
        win_k, win_v = win_cache["k"], win_cache["v"]
        win_q8 = "ks" in win_cache
        if win_q8:
            wks_all, wvs_all = win_cache["ks"], win_cache["vs"]
        Sw = win_k.shape[3]
        Wpad = win_pad
        woff = win_cache["woff"]
        wslot = Wpad + (slot - win_cache["slab"])  # this step's short col
        arw = jnp.arange(Sw)[None, :]
        jprompt = woff[:, None] + arw  # full-slot index of prompt-tail cols
        base_prompt = (arw < Wpad) & (jprompt >= 0) & (jprompt < lens[:, None])
        base_dec = (arw >= Wpad) & (arw <= wslot)
        for Wl in sorted({w for w in W_layers if w}):
            # prompt slot j has position j; short decode col c holds full
            # slot slab + (c - Wpad) => window (pos > positions - Wl):
            wvalid[Wl] = (
                (base_prompt & (jprompt > positions[:, None] - Wl))
                | (base_dec & (arw > wslot - Wl)))
    valid = win_valid = None
    need_full_masks = (not use_ragged) and len(full_map) > 0
    if need_full_masks:
        ar = jnp.arange(S)[None, :]
        valid = (ar < lens[:, None]) | ((ar >= dstart[:, None]) & (ar <= slot))  # (B, S)
        win_valid = {}
        for Wl in sorted({w for w in W_layers if w}) if win_cache is None else ():
            # sliding window over POSITIONS, expressed in slots: prompt
            # slot j has position j; decode slot j (written one column per
            # step, contiguous up to `slot`) has position
            # positions[b] - (slot - j). pos > positions[b] - Wl becomes:
            win = jnp.where(ar < lens[:, None],
                            ar > positions[:, None] - Wl,  # prompt slots
                            ar > slot - Wl)                # decode slots
            win_valid[Wl] = valid & win
    # the same window conditions as RANGES for the ragged kernel: prompt
    # slots [positions-Wl+1, lens), decode slots [max(dstart, slot-Wl+1),
    # slot] — clipped starts, same two-segment structure as unbanded
    win_ranges = {}
    if use_ragged and win_cache is None:
        for Wl in sorted({w for w in W_layers if w}):
            win_ranges[Wl] = (
                jnp.clip(positions - (Wl - 1), 0, lens),
                jnp.maximum(dstart, slot - (Wl - 1)))
    neg = jnp.float32(-1e30)

    def proj(h, w, b=None):  # (B,H) @ (H,D) f32-accum
        y = _q_matmul_f32(h, w)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(h.dtype)

    def dense_att(q_, k_all, v_all, valid_l, ks_row=None, vs_row=None,
                  sinks_l=None):
        """Masked full-read attention over one layer's (B, nkv, Sx, dh)
        panels (Sx = S or the windowed Sw). int8 panels: cast in registers,
        fold the scale rows outside the dots (exact given quantized values,
        same order everywhere so streams stay bit-equal). ``sinks_l``
        (nh,): gpt_oss per-head sink folded into the softmax denominator
        (_sink_softmax)."""
        qg = q_.reshape(B, nkv, group, dh)
        if ks_row is not None:
            att = jnp.einsum("bkgd,bksd->bkgs", qg, k_all.astype(x.dtype),
                             preferred_element_type=jnp.float32) * scale
            att = att * ks_row[:, :, None, :]
        else:
            att = jnp.einsum("bkgd,bksd->bkgs", qg, k_all,
                             preferred_element_type=jnp.float32) * scale
        if cfg.attn_softcap:  # gemma2 (true logits: after k-scale fold)
            att = jnp.tanh(att / cfg.attn_softcap) * cfg.attn_softcap
        att = jnp.where(valid_l[:, None, None, :], att, neg)
        if sinks_l is not None:
            probs = _sink_softmax(
                att, sinks_l.astype(jnp.float32).reshape(nkv, group)[
                    None, :, :, None])
        else:
            probs = jax.nn.softmax(att, axis=-1)
        if vs_row is not None:
            pv = (probs * vs_row[:, :, None, :]).astype(x.dtype)
            o_ = jnp.einsum("bkgs,bksd->bkgd", pv, v_all.astype(x.dtype),
                            preferred_element_type=jnp.float32)
        else:
            o_ = jnp.einsum("bkgs,bksd->bkgd", probs.astype(v_all.dtype),
                            v_all, preferred_element_type=jnp.float32)
        return o_.reshape(B, nh * dh).astype(x.dtype)

    for l in range(L):
        Wl = W_layers[l]
        short_l = win_cache is not None and Wl > 0  # static per layer
        cos_l, sin_l = ((cos_loc, sin_loc) if (Wl and cos_loc is not None)
                        else (cos, sin))
        p = _layer_params(params, l)
        sinks_l = p["attn"]["sinks"] if cfg.attn_sinks else None
        h = (x if cfg.post_norms_only  # olmo2: no pre-norm
             else _norm(x, p["input_layernorm"], cfg))
        q = proj(h, p["attn"]["q_proj"]["w"], p["attn"]["q_proj"]["b"])
        k = proj(h, p["attn"]["k_proj"]["w"], p["attn"]["k_proj"]["b"])
        v = proj(h, p["attn"]["v_proj"]["w"], p["attn"]["v_proj"]["b"]).reshape(B, nkv, dh)
        if cfg.qk_norm_full:  # olmo2: norm over the FULL projection width
            q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
            k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
        q, k = q.reshape(B, nh, dh), k.reshape(B, nkv, dh)
        if cfg.qk_norm:  # qwen3 / gemma3
            q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
            k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
        if not (cfg.nope_layers and cfg.nope_layers[l]):  # static skip
            q, k = rope1(q, cos_l, sin_l), rope1(k, cos_l, sin_l)

        if short_l:
            # windowed-short layer: write this step's K/V at the SHORT
            # column wslot; attention reads only the Sw-panel
            wi = win_map[l]
            if win_q8:
                kq, sk = _quantize_kv(k)
                vq, sv = _quantize_kv(v)
                win_k = jax.lax.dynamic_update_slice(
                    win_k, kq[None, :, :, None, :], (wi, 0, 0, wslot, 0))
                win_v = jax.lax.dynamic_update_slice(
                    win_v, vq[None, :, :, None, :], (wi, 0, 0, wslot, 0))
                wks_all = jax.lax.dynamic_update_slice(
                    wks_all, sk[None, :, :, None], (wi, 0, 0, wslot))
                wvs_all = jax.lax.dynamic_update_slice(
                    wvs_all, sv[None, :, :, None], (wi, 0, 0, wslot))
                o = dense_att(q, win_k[wi], win_v[wi], wvalid[Wl],
                              wks_all[wi], wvs_all[wi], sinks_l=sinks_l)
            else:
                win_k = jax.lax.dynamic_update_slice(
                    win_k, k[None, :, :, None, :], (wi, 0, 0, wslot, 0))
                win_v = jax.lax.dynamic_update_slice(
                    win_v, v[None, :, :, None, :], (wi, 0, 0, wslot, 0))
                o = dense_att(q, win_k[wi], win_v[wi], wvalid[Wl],
                              sinks_l=sinks_l)
            att_out = proj(o, p["attn"]["o_proj"]["w"],
                           p["attn"]["o_proj"]["b"] if cfg.o_proj_bias
                           else None)
        else:
            fi = full_map[l]
            if cache_scale is not None:
                kq, sk = _quantize_kv(k)  # (B, nkv, dh) -> int8 + (B, nkv)
                vq, sv = _quantize_kv(v)
                cache_k = jax.lax.dynamic_update_slice(
                    cache_k, kq[None, :, :, None, :], (fi, 0, 0, slot, 0))
                cache_v = jax.lax.dynamic_update_slice(
                    cache_v, vq[None, :, :, None, :], (fi, 0, 0, slot, 0))
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, sk[None, :, :, None], (fi, 0, 0, slot))
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, sv[None, :, :, None], (fi, 0, 0, slot))
            else:
                cache_k = jax.lax.dynamic_update_slice(
                    cache_k, k[None, :, :, None, :], (fi, 0, 0, slot, 0))
                cache_v = jax.lax.dynamic_update_slice(
                    cache_v, v[None, :, :, None, :], (fi, 0, 0, slot, 0))

            if use_ragged:
                from ..ops.ragged_decode_attention import ragged_decode_attention

                # full stacked cache + layer scalar: a per-layer slice here
                # would materialize an 88 MB pallas operand per layer-step.
                # int8 caches compose: the kernel DMAs the scale rows too.
                # Windowed layers (full-S mode) pass window-clipped range
                # starts; the loop is unrolled so the choice is static.
                pstart_l, dstart_l = win_ranges[Wl] if Wl else (None, dstart)
                o = ragged_decode_attention(
                    q, cache_k, cache_v, fi, lens, dstart_l, slot,
                    cache_scale=((ks_all, vs_all) if cache_scale is not None
                                 else None),
                    pstart=pstart_l, sinks=sinks_l, scale=scale)
                o = o.reshape(B, nh * dh).astype(x.dtype)
            else:
                valid_l = (win_valid[Wl] if (Wl and win_cache is None)
                           else valid)
                # cache_k[fi] etc. are static zero-copy views
                o = dense_att(
                    q, cache_k[fi], cache_v[fi], valid_l,
                    ks_all[fi] if cache_scale is not None else None,
                    vs_all[fi] if cache_scale is not None else None,
                    sinks_l=sinks_l)
            att_out = proj(o, p["attn"]["o_proj"]["w"],
                           p["attn"]["o_proj"]["b"] if cfg.o_proj_bias
                           else None)

        if cfg.sandwich_norms:  # gemma: norm sublayer outputs too
            x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
            h2 = _norm(x, p["pre_feedforward_layernorm"], cfg)
            x = x + _norm(_mlp(cfg, p, h2), p["post_feedforward_layernorm"], cfg)
        elif cfg.post_norms_only:  # olmo2: norm sublayer outputs ONLY
            x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
            x = x + _norm(_mlp(cfg, p, x), p["post_feedforward_layernorm"], cfg)
        else:
            x = x + att_out
            h2 = _norm(x, p["post_attention_layernorm"], cfg)
            x = x + _mlp(cfg, p, h2)

    x = _norm(x, params["norm"], cfg)
    logits = _lm_head(params, cfg, x)
    out = (logits, (x if return_hidden else None), cache_k, cache_v)
    if cache_scale is not None:
        out = out + ((ks_all, vs_all),)
    if win_cache is not None:
        wc = dict(win_cache, k=win_k, v=win_v)
        if win_q8:
            wc.update(ks=wks_all, vs=wvs_all)
        out = out + (wc,)
    return out


def decode_step_multi(
    params: dict,
    cfg: Qwen2Config,
    toks: jax.Array,       # (B, T) int32 — [last_emitted, draft_1..draft_{T-1}]
    positions: jax.Array,  # (B, T) int32 — true sequence positions (RoPE)
    cache_k: jax.Array,    # (L, B, nkv, S, dh) decode layout
    cache_v: jax.Array,
    slot: jax.Array,       # scalar int32 — first cache column for this block
    valid_map: jax.Array,  # (B, S) bool — per-row stored-KV validity bitmap
    return_hidden: bool = False,
    cache_scale: tuple[jax.Array, jax.Array] | None = None,
    pos_map: jax.Array | None = None,  # (B, S) int32 — stored-KV positions
):
    """T-token verify step for speculative decoding (engine spec mode).

    Forwards a contiguous block of T tokens per row against the decode
    cache in ONE pass: the whole point of speculation on a
    weight-bandwidth-bound decode is that the weight (and cache) reads for
    T tokens cost the same HBM traffic as for 1, so verifying T-1 drafts
    is nearly free (scripts/bench_spec.py measures the ratio).

    Differences from :func:`decode_step` (the 1-token hot loop):
    - K/V of all T tokens are written at columns [slot, slot+T) (still one
      contiguous dynamic_update_slice per layer — the slot-uniform write
      discipline survives, the ENGINE just advances slot by T);
    - validity is a per-row (B, S) BITMAP, not (lens, dstart, slot) ranges:
      rejected draft columns leave permanent holes in the decode region
      that ranges cannot express. Query i additionally attends causally to
      the new columns j <= i;
    - no ragged-kernel variant (the bitmap validity cannot be expressed as
      the kernel's two ranges). ``cache_scale=(ks, vs)`` (each
      (L, B, nkv, S) f32) enables the int8 KV cache exactly as in
      :func:`decode_step`: the T new K/V vectors quantize per (b, t, h)
      vector — identical values to quantizing them one step at a time —
      and reads fold the K scale into the logits / V scale into the
      probabilities, so spec decode composes with ``kv_quant="int8"``;
    - sliding-window stacks (uniform ``sliding_window`` or per-layer
      ``layer_windows``, e.g. gpt_oss's alternating pattern) mask by
      POSITION, not column: the bitmap's permanent holes break
      decode_step's affine column->position map, so the engine threads a
      per-column position map (``pos_map``) alongside ``valid_map`` and a
      key is in-window iff ``key_pos > query_pos - W`` — the same
      convention as decode_step's banded validity. New columns j take
      ``positions[:, j]``. Per-layer windows are static (the layer loop is
      unrolled), so full-attention layers skip the band entirely;
    - gpt_oss attention sinks fold into the softmax denominator
      (_sink_softmax), exactly as in decode_step's dense path;
    - gemma stacks ride the same static per-layer dispatch as decode_step:
      sandwich norms in the residual, attn_softcap after the k-scale fold
      (true logits), dual-theta rope (local theta on windowed layers).

    Returns (logits (B, T, V) f32, hidden (B, T, H)|None, cache_k, cache_v)
    — plus the updated ``cache_scale`` tuple appended when quantized.
    Capability beyond the reference: vLLM 0.11 as configured by the
    reference (vllm_start.sh) runs no speculative decoding.
    """
    L = cfg.num_hidden_layers
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    group = nh // nkv
    B, T = toks.shape
    S = cache_k.shape[3]
    W_layers = [cfg.window_for_layer(l) for l in range(L)]
    assert not any(W_layers) or pos_map is not None, \
        "windowed stacks need the engine's per-column position map"
    scale = cfg.attn_scale_

    x = _embed(params, cfg, toks)  # (B, T, H)

    cos, sin = rope_freqs(positions, dh, cfg.rope_theta,
                          cfg.rope_scaling)  # (B, T, dh/2)
    # gemma3 dual rope: windowed (local) layers use rope_local_theta with
    # no scaling — same static per-layer choice as decode_step
    cos_loc = sin_loc = None
    if cfg.rope_local_theta and any(W_layers):
        cos_loc, sin_loc = rope_freqs(positions, dh, cfg.rope_local_theta, ())

    def rope2(v, c, s_):  # (B, T, n, dh)
        c, s_ = c[:, :, None, :], s_[:, :, None, :]
        v1 = v[..., : dh // 2].astype(jnp.float32)
        v2 = v[..., dh // 2 :].astype(jnp.float32)
        return jnp.concatenate([v1 * c - v2 * s_, v2 * c + v1 * s_],
                               -1).astype(v.dtype)

    ar = jnp.arange(S)[None, None, :]
    new_rel = ar - slot                       # new columns are 0..T-1
    causal_new = (new_rel >= 0) & (new_rel <= jnp.arange(T)[None, :, None])
    valid = valid_map[:, None, :] | causal_new  # (B, T, S)
    win_valid = {}
    if any(W_layers):
        # per-column key positions: stored columns from the engine's
        # pos_map, this block's new columns j at positions[:, j]
        ar1 = jnp.arange(S)[None, :]
        in_new = (ar1 >= slot) & (ar1 < slot + T)
        rel = jnp.clip(ar1 - slot, 0, T - 1)
        new_pos = jnp.take_along_axis(
            positions, jnp.broadcast_to(rel, (B, S)), axis=1)
        pos_col = jnp.where(in_new, new_pos, pos_map)  # (B, S)
        for Wl in sorted({w for w in W_layers if w}):
            win_valid[Wl] = valid & (
                pos_col[:, None, :] > positions[:, :, None] - Wl)
    neg = jnp.float32(-1e30)
    if cache_scale is not None:
        ks_all, vs_all = cache_scale

    def proj(h, w, b=None):  # (B,T,H) @ (H,D)
        y = _q_matmul_f32(h, w)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(h.dtype)

    for l in range(L):
        p = _layer_params(params, l)
        h = (x if cfg.post_norms_only  # olmo2
             else _norm(x, p["input_layernorm"], cfg))
        q = proj(h, p["attn"]["q_proj"]["w"], p["attn"]["q_proj"]["b"])
        k = proj(h, p["attn"]["k_proj"]["w"], p["attn"]["k_proj"]["b"])
        v = proj(h, p["attn"]["v_proj"]["w"], p["attn"]["v_proj"]["b"]).reshape(B, T, nkv, dh)
        if cfg.qk_norm_full:  # olmo2: norm over the full projection width
            q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
            k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
        q, k = q.reshape(B, T, nh, dh), k.reshape(B, T, nkv, dh)
        if cfg.qk_norm:  # qwen3 / gemma3
            q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.rms_norm_eps)
            k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.rms_norm_eps)
        if not (cfg.nope_layers and cfg.nope_layers[l]):  # smollm3 NoPE
            cos_l, sin_l = ((cos_loc, sin_loc)
                            if (W_layers[l] and cos_loc is not None)
                            else (cos, sin))
            q, k = rope2(q, cos_l, sin_l), rope2(k, cos_l, sin_l)

        if cache_scale is not None:
            kq, sk = _quantize_kv(k)  # (B, T, nkv, dh) -> int8 + (B, T, nkv)
            vq, sv = _quantize_kv(v)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, jnp.transpose(kq, (0, 2, 1, 3))[None], (l, 0, 0, slot, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, jnp.transpose(vq, (0, 2, 1, 3))[None], (l, 0, 0, slot, 0))
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, jnp.transpose(sk, (0, 2, 1))[None], (l, 0, 0, slot))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, jnp.transpose(sv, (0, 2, 1))[None], (l, 0, 0, slot))
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, jnp.transpose(k, (0, 2, 1, 3))[None], (l, 0, 0, slot, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, jnp.transpose(v, (0, 2, 1, 3))[None], (l, 0, 0, slot, 0))

        k_all, v_all = cache_k[l], cache_v[l]  # (B, nkv, S, dh) static views
        qg = q.reshape(B, T, nkv, group, dh)
        # static per layer (unrolled loop): banded validity + sink fold
        valid_l = win_valid[W_layers[l]] if W_layers[l] else valid
        if cfg.attn_sinks:
            sinks_l = p["attn"]["sinks"].astype(jnp.float32).reshape(
                nkv, group)[None, :, None, :, None]

            def _softmax(a):
                return _sink_softmax(a, sinks_l)
        else:
            def _softmax(a):
                return jax.nn.softmax(a, axis=-1)
        if cache_scale is not None:
            # int8 reads: cast in registers, fold scales outside the dots
            # (same order as decode_step so greedy streams stay bit-equal)
            att = jnp.einsum("btkgd,bksd->bktgs", qg, k_all.astype(x.dtype),
                             preferred_element_type=jnp.float32) * scale
            att = att * ks_all[l][:, :, None, None, :]
            if cfg.attn_softcap:  # gemma2 (true logits: after k-scale fold)
                att = jnp.tanh(att / cfg.attn_softcap) * cfg.attn_softcap
            att = jnp.where(valid_l[:, None, :, None, :], att, neg)
            probs = _softmax(att)
            pv = (probs * vs_all[l][:, :, None, None, :]).astype(x.dtype)
            o = jnp.einsum("bktgs,bksd->bktgd", pv, v_all.astype(x.dtype),
                           preferred_element_type=jnp.float32)
        else:
            att = jnp.einsum("btkgd,bksd->bktgs", qg, k_all,
                             preferred_element_type=jnp.float32) * scale
            if cfg.attn_softcap:  # gemma2: soft-clamp logits pre-mask
                att = jnp.tanh(att / cfg.attn_softcap) * cfg.attn_softcap
            att = jnp.where(valid_l[:, None, :, None, :], att, neg)
            probs = _softmax(att)
            o = jnp.einsum("bktgs,bksd->bktgd", probs.astype(v_all.dtype), v_all,
                           preferred_element_type=jnp.float32)
        o = jnp.transpose(o, (0, 2, 1, 3, 4)).reshape(B, T, nh * dh).astype(x.dtype)
        att_out = proj(o, p["attn"]["o_proj"]["w"],
                       p["attn"]["o_proj"]["b"] if cfg.o_proj_bias else None)

        if cfg.sandwich_norms:  # gemma: norm sublayer outputs too
            x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
            h2 = _norm(x, p["pre_feedforward_layernorm"], cfg)
            x = x + _norm(_mlp(cfg, p, h2), p["post_feedforward_layernorm"],
                          cfg)
        elif cfg.post_norms_only:  # olmo2: norm sublayer outputs only
            x = x + _norm(att_out, p["post_attention_layernorm"], cfg)
            x = x + _norm(_mlp(cfg, p, x), p["post_feedforward_layernorm"],
                          cfg)
        else:
            x = x + att_out
            h2 = _norm(x, p["post_attention_layernorm"], cfg)
            x = x + _mlp(cfg, p, h2)

    x = _norm(x, params["norm"], cfg)
    logits = _lm_head(params, cfg, x)
    if cache_scale is not None:
        return logits, (x if return_hidden else None), cache_k, cache_v, (ks_all, vs_all)
    return logits, (x if return_hidden else None), cache_k, cache_v

"""Weight-only int8 quantization for serving.

Production-serving feature the reference gets from vLLM's quantized kernels
(SURVEY §2.4): per-output-channel symmetric int8 on every large matmul
weight (attention/MLP projections + embedding/lm_head). Memory and HBM
traffic halve vs bf16 — decode is weight-bandwidth-bound, so this is also
a throughput lever, and it is what fits the 7B flagship on one 16 GB v5e.

A quantized leaf is ``{"q": int8 (..., in, out), "s": f32 (..., 1, out)}``;
``dequant()`` is called at the use site and XLA fuses the int8→bf16 convert
+ scale into the matmul's operand read stream (no bf16 copy of the weight
is materialized in HBM).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and ("s" in leaf
                                                       or "s4" in leaf)


def quantize_weight(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8 over the last axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # reduce the in-dim
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def quantize_weight_int4(w: jax.Array, group: int = 128) -> dict:
    """Group-wise symmetric int4 (RTN, AWQ/GPTQ-style) along the in-dim,
    NIBBLE-PACKED: ``q`` is uint8 (..., in/2, out) holding two 4-bit values
    per byte, ``s4`` is f32 (..., in/group, out). Packed uint8 — not
    jnp.int4 — because S4 arrays cannot cross the jit/device_put boundary
    on the axon TPU platform (RecursionError in the plugin's relayout
    path, measured round 3); the HBM weight stream is halved either way.

    Nibbles are stored OFFSET-BINARY (u = v + 8, u in [1, 15] for
    v in [-7, 7]): the stored nibble is an UNSIGNED integer and the real
    value is ``u - 8``. The Pallas kernel (ops/int4_matmul.py) exploits
    this: unsigned nibbles come out of a byte with pure float ops (u8 ->
    bf16 convert is exact, floor/multiply extract the halves — no integer
    vector ops, which Mosaic legalizes poorly), and the constant -8 shift
    folds OUT of the per-weight math into one rank-ngroups correction
    matmul (x's per-group row-sums against the scale rows)."""
    *lead, IN, OUT = w.shape
    assert IN % group == 0 and (IN // 2) % group == 0, (IN, group)
    wf = w.astype(jnp.float32).reshape(*lead, IN // group, group, OUT)
    amax = jnp.max(jnp.abs(wf), axis=-2)                 # (..., in/g, out)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7)
    u = (q + 8.0).reshape(*lead, IN, OUT).astype(jnp.uint8)  # offset-binary
    # SPLIT-HALF packing: byte[i] = row i (low nibble) | row i+IN/2 (high).
    # Unpacking is then a CONCAT of two contiguous halves — no interleave —
    # which both XLA and the Pallas kernel (ops/int4_matmul.py) can consume
    # as two plain dots without any relayout.
    half = IN // 2
    packed = u[..., :half, :] | (u[..., half:, :] << 4)
    return {"q": packed, "s4": scale.astype(jnp.float32)}


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """uint8 (..., in/2, out) -> int8 values in [-7, 7] (..., in, out):
    low nibbles are rows [0, in/2), high nibbles rows [in/2, in).
    Nibbles are offset-binary (stored u = value + 8)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequant(w: Any, dtype=jnp.bfloat16) -> jax.Array:
    """Quantized leaf -> dense matrix in ``dtype`` (fused into the consumer
    matmul by XLA); passthrough for plain arrays. Two layouts: int8
    per-channel ({"q","s"}) and packed int4 group-wise ({"q","s4"})."""
    if not is_quantized(w):
        return w
    if "s4" in w:
        if "layer" in w:  # stacked decode leaf (qwen2._layer_params tag)
            w = {"q": w["q"][w["layer"]], "s4": w["s4"][w["layer"]]}
        s = w["s4"]
        qi = _unpack_int4(w["q"])
        *lead, IN, OUT = qi.shape
        groups = s.shape[-2]
        qq = qi.reshape(*lead, groups, IN // groups, OUT).astype(dtype)
        return (qq * s[..., :, None, :].astype(dtype)).reshape(*lead, IN, OUT)
    return w["q"].astype(dtype) * w["s"].astype(dtype)


_QUANT_PATHS = (
    "q_proj/w", "k_proj/w", "v_proj/w", "o_proj/w",
    "gate_proj/w", "up_proj/w", "down_proj/w",
    "c_fc/w", "c_proj/w",  # starcoder2 plain FFN
)


def quantize_params(params: dict, *, quantize_embed: bool = True,
                    bits: int = 8, group: int = 128) -> dict:
    """Quantize the large matmul weights of a qwen2 param tree in place
    (returns a new tree; biases, norms and small tensors stay as-is).
    ``bits=4`` uses group-wise int4 (RTN, ``group``-sized in-dim groups)
    for the projection matrices; embedding/lm_head stay int8 (their row
    gather / scale-fold paths assume per-channel scales and they are a
    small share of the stream)."""

    def walk(node, path=""):
        if isinstance(node, dict) and not is_quantized(node):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if any(path.endswith("/" + p) for p in _QUANT_PATHS):
            if bits == 4 and node.shape[-2] % group == 0:
                return quantize_weight_int4(node, group)
            return quantize_weight(node)
        if quantize_embed and (path.endswith("embed/weight") or path.endswith("lm_head/weight")):
            # (V, H): per-H-channel scales; reduce over vocab rows
            wf = node.astype(jnp.float32)
            amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
            return {"q": q, "s": scale.astype(jnp.float32)}
        return node

    return walk(params)


def quantize_host_tree(params_np: dict, *, quantize_embed: bool = True) -> dict:
    """Quantize a NUMPY param tree on host, then device_put only the int8
    result — avoids the bf16+int8 double-residency peak that OOMs large
    models on device (7B bf16 alone is 14+ GB on a 16 GB chip)."""
    import numpy as np

    def qw(w, axis):
        wf = np.asarray(w, np.float32)
        amax = np.max(np.abs(wf), axis=axis, keepdims=True)
        scale = np.maximum(amax / 127.0, 1e-12)
        q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        return {"q": jnp.asarray(q), "s": jnp.asarray(scale.astype(np.float32))}

    def walk(node, path=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if any(path.endswith("/" + p) for p in _QUANT_PATHS):
            return qw(node, axis=-2)
        if quantize_embed and (path.endswith("embed/weight") or path.endswith("lm_head/weight")):
            return qw(node, axis=0)
        return jnp.asarray(node)

    return walk(params_np)


def init_params_quantized(cfg, seed: int = 0, *, quantize_embed: bool = True,
                          bits: int = 8, group: int = 128) -> dict:
    """Random-init a quantized tree directly ON DEVICE in int8 (or
    group-wise int4 projections with ``bits=4``; embed/lm_head stay int8).

    Never materializes f32/bf16 weights anywhere: no device bf16 residency
    (7B bf16 would not fit one 16 GB chip) and no multi-GB host→device
    transfer (the remote-TPU tunnel makes big transfers minutes-slow).
    Weight *values* don't affect throughput benchmarking.

    Builds the default qwen-family tree shape (pre-norm RMS, SwiGLU):
    family variants whose tree differs reject loudly rather than produce
    a structure the forward would KeyError on."""
    if (getattr(cfg, "norm_style", "rms") != "rms"
            or getattr(cfg, "mlp_style", "swiglu") != "swiglu"
            or getattr(cfg, "post_norms_only", False)
            or getattr(cfg, "qk_norm_full", False)
            or getattr(cfg, "attn_sinks", False)):
        raise ValueError(
            "init_params_quantized builds the qwen-family tree only "
            "(rms pre-norms, SwiGLU, no sinks); quantize loaded params "
            "via quantize_params/quantize_host_tree for other families")
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    nh, nkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    I = cfg.intermediate_size
    key = jax.random.key(seed)

    def qw(k, shape, axis=-2):
        in_dim = shape[axis]
        if bits == 4 and axis == -2 and in_dim % group == 0:
            p_shape = list(shape)
            p_shape[axis] = in_dim // 2
            q = jax.random.randint(k, tuple(p_shape), 0, 256, dtype=jnp.int32
                                   ).astype(jnp.uint8)  # random packed nibbles
            s_shape = list(shape)
            s_shape[axis] = in_dim // group
            s = jnp.full(tuple(s_shape), 1.0 / (7.0 * (in_dim ** 0.5)), jnp.float32)
            return {"q": q, "s4": s}
        q = jax.random.randint(k, shape, -127, 128, dtype=jnp.int8)
        s_shape = list(shape)
        s_shape[axis] = 1
        s = jnp.full(tuple(s_shape), 1.0 / (127.0 * (in_dim ** 0.5)), jnp.float32)
        return {"q": q, "s": s}

    ks = jax.random.split(key, 10)
    params = {
        "embed": {"weight": (qw(ks[0], (cfg.vocab_size, H), axis=0) if quantize_embed
                             else (jax.random.normal(ks[0], (cfg.vocab_size, H)) * 0.02
                                   ).astype(cfg.dtype))},
        "layers": {
            "input_layernorm": {"scale": jnp.ones((L, H), cfg.dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((L, H), cfg.dtype)},
            "attn": {
                "q_proj": {"w": qw(ks[1], (L, H, nh * dh)), "b": jnp.zeros((L, nh * dh), cfg.dtype)},
                "k_proj": {"w": qw(ks[2], (L, H, nkv * dh)), "b": jnp.zeros((L, nkv * dh), cfg.dtype)},
                "v_proj": {"w": qw(ks[3], (L, H, nkv * dh)), "b": jnp.zeros((L, nkv * dh), cfg.dtype)},
                "o_proj": {"w": qw(ks[4], (L, nh * dh, H))},
            },
            "mlp": {
                "gate_proj": {"w": qw(ks[5], (L, H, I))},
                "up_proj": {"w": qw(ks[6], (L, H, I))},
                "down_proj": {"w": qw(ks[7], (L, I, H))},
            },
        },
        "norm": {"scale": jnp.ones((H,), cfg.dtype)},
    }
    return params


def params_nbytes(params: dict) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total

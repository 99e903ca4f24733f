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
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def quantize_weight(w: jax.Array) -> dict:
    """Per-output-channel symmetric int8 over the last axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # reduce the in-dim
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def dequant(w: Any, dtype=jnp.bfloat16) -> jax.Array:
    """Quantized leaf -> dense matrix in ``dtype`` (fused into the consumer
    matmul by XLA); passthrough for plain arrays."""
    if is_quantized(w):
        return (w["q"].astype(dtype) * w["s"].astype(dtype))
    return w


_QUANT_PATHS = (
    "q_proj/w", "k_proj/w", "v_proj/w", "o_proj/w",
    "gate_proj/w", "up_proj/w", "down_proj/w",
)


def quantize_params(params: dict, *, quantize_embed: bool = True) -> dict:
    """Quantize the large matmul weights of a qwen2 param tree in place
    (returns a new tree; biases, norms and small tensors stay as-is)."""

    def walk(node, path=""):
        if isinstance(node, dict) and not is_quantized(node):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if any(path.endswith("/" + p) for p in _QUANT_PATHS):
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


def params_nbytes(params: dict) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total

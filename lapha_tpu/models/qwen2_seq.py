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

Composes with data parallelism: a ``(data, sequence)`` mesh shards batch
over `data` and tokens over `sequence`. Parameters enter the shard_map
replicated (in_spec P()); XLA gathers FSDP-sharded params once per step —
the same traffic FSDP pays anyway. Fully differentiable (the ring is pure
jnp under XLA AD); ``remat=True`` checkpoints per layer exactly like
qwen2._scan_layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ring_attention import ring_attend_local
from .quant import is_quantized
from .qwen2 import Qwen2Config, _layer_body, rms_norm, rope_freqs


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
):
    """Training/prefill forward with the sequence axis sharded over `mesh`.

    Semantics match qwen2.forward's no-cache mode (causal over slot order,
    padding-aware positions via cumsum(mask)-1). Returns
    (logits | None, last_hidden | None, None) with outputs sharded
    P(data?, sequence, ...). No KV-cache mode — decode stays on the
    engine's single-chip/TP path where sequence sharding has no win.
    """
    from jax.experimental.shard_map import shard_map

    B, T = input_ids.shape
    n = mesh.shape[seq_axis]
    assert T % n == 0, (T, n)
    da = data_axis if (data_axis in mesh.shape
                       and B % mesh.shape[data_axis] == 0) else None

    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    # left-padding friendly positions, computed on the full (cheap) mask
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    cos, sin = rope_freqs(positions, cfg.head_dim_, cfg.rope_theta)  # (B,T,dh/2)

    def local(params, ids, mask, cos, sin):
        emb = params["embed"]["weight"]
        if is_quantized(emb):
            x = emb["q"][ids].astype(cfg.dtype) * emb["s"][0].astype(cfg.dtype)
        else:
            x = emb[ids].astype(cfg.dtype)

        vary = (da, seq_axis) if da else (seq_axis,)

        def attend(q, k, v):
            return ring_attend_local(q, k, v, mask, axis=seq_axis, n=n,
                                     vary_axes=vary)

        def body(x, p):
            (x2, *_), _ = _layer_body(cfg, (x, cos, sin, None, None, None, 0),
                                      p, attend_fn=attend)
            return x2, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, params["layers"])
        return rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)

    spec2 = P(da, seq_axis)
    spec3 = P(da, seq_axis, None)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), spec2, spec2, spec3, spec3),
                   out_specs=spec3)
    x = fn(params, input_ids, attention_mask, cos, sin)

    if not compute_logits:
        return None, (x if return_hidden else None), None
    head_w = (params["embed"]["weight"] if cfg.tie_word_embeddings
              else params["lm_head"]["weight"])
    if is_quantized(head_w):
        xs = x * head_w["s"][0].astype(x.dtype)
        logits = jnp.einsum("bth,vh->btv", xs, head_w["q"].astype(x.dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("bth,vh->btv", x, head_w,
                            preferred_element_type=jnp.float32)
    return logits, (x if return_hidden else None), None

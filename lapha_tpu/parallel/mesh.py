"""Device mesh construction and GSPMD sharding rules.

Replaces the reference's entire distributed substrate (DeepSpeed ZeRO-3 +
NCCL scatter protocol + PyNccl weight plane, SURVEY.md §2.3): one mesh with
axes ``("data", "model")``; parameters are sharded FSDP-style over ``data``
and tensor-parallel over ``model``; XLA inserts all collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "sequence"


def make_mesh(n_data: int | None = None, n_model: int = 1, n_seq: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model[, sequence]) mesh. Defaults: all devices on the
    data axis. ``n_seq > 1`` appends a `sequence` axis (context parallelism,
    models/qwen2_seq) as the FASTEST-varying dimension so ring neighbors are
    ICI-adjacent; parameters are never sharded over it (PARAM_RULES), so all
    existing (data, model) specs lower unchanged on the 3-axis mesh."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // (n_model * n_seq)
    assert n_data * n_model * n_seq == devices.size, \
        (n_data, n_model, n_seq, devices.size)
    if n_seq > 1:
        return Mesh(devices.reshape(n_data, n_model, n_seq),
                    (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


# Parameter sharding rules: (path regex, PartitionSpec). First match wins.
# Layout convention (see models/qwen2.py): stacked layer params have a
# leading layer axis which is never sharded. 2D weights are (in, out).
#
# TP sharding: qkv/gate/up shard the output (head/ffn) dim; o/down shard the
# input dim, producing a psum XLA resolves over ``model``. FSDP: embedding
# and lm_head shard vocab over ``data`` so optimizer state spreads out.
#
# KV-head split at 7B (nh=28, nkv=4, dh=128): k/v_proj out dim = nkv*dh =
# 512 → TP=2 keeps 2 KV heads per shard, TP=4 exactly 1 — the clean v5p-16
# serving projection is mesh (data=4, model=4) (28 q-heads / 4 = 7 per
# shard). TP > nkv still lowers (GSPMD reshards the (B, nkv, dh) reshape)
# but splits inside a KV head — validated by the dryrun's 7B-shape decode
# parity check (__graft_entry__.dryrun_multichip).
#
# Expert parallelism (qwen2_moe, models/qwen2.py + ops/moe.py) rides the
# ``model`` axis: routed-expert stacks (L, E, in, out) shard the EXPERT dim
# over ``model`` (each shard owns E/n_model whole experts — with the
# "dense"/"dispatch" moe impls the e-axis einsums become the EP
# collectives), while the always-on shared expert uses the same TP split as
# a dense MLP. The router and the shared-expert sigmoid gate are tiny and
# replicated.
#
# DeepSeek (models/deepseek.py) reuses these where paths coincide (expert
# stacks, shared experts, dense MLPs, norms — the dense_layers/moe_layers
# group prefixes still contain "layers/"); MLA-specific mats get their own
# rules: q_b/kv_b shard the head-major OUT dim over ``model`` (per-head
# absorb einsums stay head-parallel; the o-proj contraction psums), while
# the latent-side mats (q_a, kv_a — outputs shared by every head) and the
# tiny a-norms replicate over ``model`` and FSDP over ``data``.
PARAM_RULES: list[tuple[str, P]] = [
    (r"layers/moe/router/(w|b|bias)$", P()),
    # gpt_oss fused experts: expert dim over ``model`` (EP), biases too
    (r"layers/moe/experts/(gate_up|down)/(w|b)$", P(None, MODEL_AXIS)),
    (r"layers/attn/sinks$", P()),
    (r"layers/attn/o_proj/b$", P(None, DATA_AXIS)),
    (r"layers/attn/(q|q_b)/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/attn/(q_a|kv_a)/w$", P(None, DATA_AXIS)),
    (r"layers/attn/kv_b/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/attn/o/w$", P(None, MODEL_AXIS, DATA_AXIS)),
    (r"layers/attn/(q_a_norm|kv_a_norm)/scale$", P()),
    (r"layers/moe/experts/(gate|up|down)_proj/w$", P(None, MODEL_AXIS)),
    (r"layers/moe/shared/(gate|up)_proj/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/moe/shared/down_proj/w$", P(None, MODEL_AXIS, DATA_AXIS)),
    (r"layers/moe/shared/gate/w$", P()),
    (r"embed/weight$", P(DATA_AXIS, MODEL_AXIS)),
    (r"lm_head/weight$", P(MODEL_AXIS, DATA_AXIS)),
    (r"layers/attn/(q|k|v)_proj/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/attn/(q|k|v)_proj/b$", P(None, MODEL_AXIS)),
    (r"layers/attn/o_proj/w$", P(None, MODEL_AXIS, DATA_AXIS)),
    (r"layers/mlp/(gate|up)_proj/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/mlp/down_proj/w$", P(None, MODEL_AXIS, DATA_AXIS)),
    (r"layers/mlp/c_fc/w$", P(None, DATA_AXIS, MODEL_AXIS)),
    (r"layers/mlp/c_fc/b$", P(None, MODEL_AXIS)),
    (r"layers/mlp/c_proj/w$", P(None, MODEL_AXIS, DATA_AXIS)),
    (r"layers/mlp/c_proj/b$", P(None, DATA_AXIS)),
    (r"(layers/)?(input_layernorm|post_attention_layernorm|pre_feedforward_layernorm|post_feedforward_layernorm|norm)/scale$", P()),
    (r"value_head/(w|b)$", P()),
]


def param_pspec(path: str) -> P:
    for pat, spec in PARAM_RULES:
        if re.search(pat, path):
            return spec
    return P()


def _tree_paths(tree: Any, prefix: str = "") -> Any:
    if isinstance(tree, dict):
        return {k: _tree_paths(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
    return prefix


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every param according to PARAM_RULES on the mesh."""
    paths = _tree_paths(params)
    return jax.tree.map(
        lambda p, path: jax.device_put(p, NamedSharding(mesh, param_pspec(path))),
        params,
        paths,
    )


def params_pspec_tree(params: Any) -> Any:
    """PartitionSpec pytree matching ``params`` (for pjit in/out specs)."""
    paths = _tree_paths(params)
    return jax.tree.map(lambda _, path: param_pspec(path), params, paths)

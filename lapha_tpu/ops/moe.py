"""Sparse Mixture-of-Experts FFN (Qwen2-MoE block) — TPU-first.

Widens the model-family surface beyond the reference (which serves only
dense Qwen2.5 via HF AutoModelForCausalLM, /root/reference/trainer/
mtpo_trainer.py:643-663): Qwen1.5-MoE-A2.7B / Qwen2-57B-A14B checkpoints
route each token to ``top_k`` of ``num_experts`` small FFNs plus one
always-on shared expert (HF Qwen2MoeSparseMoeBlock semantics: softmax over
ALL expert logits in f32, top-k, optional re-normalisation, sigmoid-gated
shared expert).

Three interchangeable execution strategies, all pure functions of the same
stacked weights — chosen by ``impl`` (the semantics differ only where
documented):

- ``"gather"`` (default): sort token→expert pairs by expert id and run the
  expert FFNs as grouped GEMMs with ``jax.lax.ragged_dot`` — the MXU sees
  three large ragged matmuls instead of E small ones. Exact (no token ever
  dropped); the single-replica hot path for serving and training.
- ``"dense"``: every expert computes every token, then a (N, E) combine
  weight matrix zeroes the non-selected terms. FLOP-profligate (E/k× the
  sparse cost) but exact, trivially differentiable, and — because the
  expert axis shards cleanly — the simplest expert-parallel program: with
  experts split over the mesh ``model`` axis each shard runs only its own
  experts and the combine einsum psums. Used for tiny tests and as the EP
  reference.
- ``"dispatch"``: GShard-style capacity-bucketed dispatch/combine einsums
  (tokens → (groups, E, capacity) buckets → expert GEMMs → combine). The
  production expert-parallel path: the bucket axis E shards over ``model``
  and XLA inserts the all-to-alls. APPROXIMATE by design — tokens beyond
  an expert's per-group capacity are dropped (their combine weight is 0),
  bounded by ``capacity_factor``; exact when capacity is not exceeded.

Weights may be int8-quantized leaves ({"q","s"}, models/quant.py) — they
are dequantized at the use site.
"""

from __future__ import annotations

import math
import warnings

import jax
import jax.numpy as jnp

from ..models.quant import dequant

_dispatch_warned = False


def _dispatch_buckets(topi: jax.Array, N: int, E: int, top_k: int,
                      capacity_factor: float, group_size: int):
    """Shared capacity-bucket math for the dispatch impl and its
    drop-fraction diagnostic — ONE definition of the group/capacity rule
    and the token-major priority, so the diagnostic always describes what
    moe_ffn_dispatch actually drops.

    topi: (N, k) expert choices; entries < 0 mean "no choice" (padding).
    Returns (sel (G,S,k,E) f32 one-hots, keep (G,S,k,E) f32 kept mask,
    pos (G,S,k,E) in-bucket positions, S, G, C)."""
    S = min(group_size, N)
    Np = ((N + S - 1) // S) * S
    G = Np // S
    C = max(1, math.ceil(top_k * S / E * capacity_factor))
    C = min(C, S * top_k)
    if Np != N:
        topi = jnp.pad(topi, ((0, Np - N), (0, 0)), constant_values=-1)
    ig = topi.reshape(G, S, top_k)
    sel = (jax.nn.one_hot(ig, E, dtype=jnp.float32)
           * (ig >= 0)[..., None].astype(jnp.float32))
    # position of each (token, choice) in its expert's bucket, token-major
    # priority ("earlier tokens win")
    pos = jnp.cumsum(sel.reshape(G, S * top_k, E), axis=1) \
        .reshape(G, S, top_k, E) - sel
    keep = (pos < C).astype(jnp.float32) * sel
    return sel, keep, pos, S, G, C



def dispatch_drop_fraction(x: jax.Array, p: dict, *, top_k: int,
                           norm_topk: bool, capacity_factor: float = 2.0,
                           group_size: int = 512) -> jax.Array:
    """Fraction of (token, expert-choice) routing pairs the ``dispatch``
    impl would DROP for this batch (scalar f32 in [0, 1]).

    Capacity drops are the documented approximation of the dispatch path
    (tokens beyond ``C = ceil(top_k*S/E*capacity_factor)`` per group lose
    that expert's contribution). This diagnostic makes the lossiness
    observable: 0.0 means dispatch was EXACT for this batch; under routing
    skew it quantifies how much signal capacity_factor is discarding so
    users can raise it (or switch to the exact ``gather``/``dense`` impls
    via ``Qwen2Config.moe_impl``)."""
    N, _H = x.shape
    experts = p["experts"]
    E = experts["gate_proj"]["w"].shape[0] if not isinstance(
        experts["gate_proj"]["w"], dict) else experts["gate_proj"]["w"]["q"].shape[0]
    _topw, topi = route(x, p["router"]["w"], top_k, norm_topk)
    sel, keep, _pos, _S, _G, _C = _dispatch_buckets(
        topi, N, E, top_k, capacity_factor, group_size)
    total = jnp.maximum(sel.sum(), 1.0)
    return 1.0 - keep.sum() / total


def route(x: jax.Array, router_w, top_k: int, norm_topk: bool):
    """Token routing, HF Qwen2MoeSparseMoeBlock parity.

    x: (N, H). Returns (topw (N, k) in x.dtype, topi (N, k) int32).
    Softmax over all E logits in f32 FIRST, then top-k of the
    probabilities (so un-normalized top-k weights don't sum to 1 unless
    ``norm_topk``)."""
    logits = jnp.einsum("nh,he->ne", x, dequant(router_w, x.dtype),
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)
    if norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw.astype(x.dtype), topi.astype(jnp.int32)


def route_deepseek(x: jax.Array, router_w, bias, *, top_k: int,
                   scoring: str, topk_method: str, n_group: int,
                   topk_group: int, norm_topk: bool,
                   routed_scaling_factor: float):
    """DeepSeek-V2/V3 token routing (HF DeepseekV2MoEGate /
    DeepseekV3TopkRouter parity). x: (N, H) -> (topw (N,k), topi (N,k)).

    - scoring "softmax" (V2): scores = softmax(logits) in f32; top-k of
      scores directly ("greedy") or within the best ``topk_group`` of
      ``n_group`` expert groups ranked by their MAX score
      ("group_limited_greedy"). HF's V2 gate applies NO top-k
      renormalization (modeling_deepseek_v2.DeepseekV2MoEGate.forward).
    - scoring "sigmoid" (V3, topk_method "noaux_tc"): selection uses
      scores + e_score_correction_bias, groups ranked by the SUM of their
      top-2 biased scores; the returned weights are the UNBIASED sigmoid
      scores at the selected experts, optionally renormalized
      (denominator + 1e-20, HF DeepseekV3TopkRouter.forward).
    Both scale the final weights by ``routed_scaling_factor``."""
    logits = jnp.einsum("nh,he->ne", x.astype(jnp.float32),
                        dequant(router_w, jnp.float32),
                        preferred_element_type=jnp.float32)
    E = logits.shape[-1]
    if scoring == "softmax":
        scores = jax.nn.softmax(logits, axis=-1)
    elif scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        raise ValueError(f"unknown scoring {scoring!r} (softmax|sigmoid)")
    choice = scores if bias is None else scores + bias.astype(jnp.float32)

    if topk_method == "greedy":
        topw, topi = jax.lax.top_k(choice, top_k)
    elif topk_method in ("group_limited_greedy", "noaux_tc"):
        g = choice.reshape(-1, n_group, E // n_group)
        if topk_method == "noaux_tc":  # V3: groups ranked by top-2 sum
            gs = jax.lax.top_k(g, 2)[0].sum(axis=-1)
        else:                          # V2: groups ranked by max
            gs = g.max(axis=-1)
        _, gidx = jax.lax.top_k(gs, topk_group)
        gmask = jnp.zeros_like(gs).at[
            jnp.arange(gs.shape[0])[:, None], gidx].set(1.0)
        masked = jnp.where(
            jnp.repeat(gmask, E // n_group, axis=-1) > 0, choice, 0.0)
        topw, topi = jax.lax.top_k(masked, top_k)
    else:
        raise ValueError(f"unknown topk_method {topk_method!r}")
    if bias is not None:  # noaux_tc: combine weights are the UNBIASED scores
        topw = jnp.take_along_axis(scores, topi, axis=-1)
    if norm_topk:
        topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
    topw = topw * routed_scaling_factor
    return topw.astype(x.dtype), topi.astype(jnp.int32)


def route_topk_softmax(x: jax.Array, router_w, router_b, top_k: int):
    """GPT-OSS routing (HF GptOssTopKRouter parity): top-k over the RAW
    router logits (linear WITH bias), then softmax over just the k
    selected values — the opposite order of the qwen/deepseek routers."""
    logits = jnp.einsum("nh,he->ne", x, dequant(router_w, x.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits + router_b.astype(jnp.float32)
    topv, topi = jax.lax.top_k(logits, top_k)
    topw = jax.nn.softmax(topv, axis=-1)
    return topw.astype(x.dtype), topi.astype(jnp.int32)


def _gptoss_glu(gu: jax.Array, limit: float, alpha: float) -> jax.Array:
    """HF GptOssExperts activation on [gate | up] halves (f32): gate
    clamped above, up clamped both ways, (up+1) * gate*sigmoid(alpha*gate)."""
    I = gu.shape[-1] // 2
    gate, up = gu[..., :I], gu[..., I:]
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    return (up + 1.0) * (gate * jax.nn.sigmoid(gate * alpha))


def moe_block_gptoss(x: jax.Array, p: dict, *, top_k: int,
                     impl: str = "auto", capacity_factor: float = 2.0,
                     group_size: int = 512,
                     limit: float = 7.0, alpha: float = 1.702) -> jax.Array:
    """GPT-OSS MoE block on flat tokens x (N, H): topk-then-softmax
    router with bias + fused clamped-GLU experts with biases (HF
    GptOssExperts math; gate_up columns are de-interleaved at load into
    [gate | up] halves).

    Same three exec strategies as the qwen/deepseek blocks, selected by
    ``impl`` (auto = dispatch on TPU / gather elsewhere, the same rule
    and rationale as :func:`moe_block`): "gather" sorts token-expert
    pairs into grouped GEMMs (exact), "dense" computes every expert and
    combines sparsely (exact; the simplest EP program — expert dim
    shards over ``model``), "dispatch" is the capacity-bucketed
    static-shape path (approximate under skew, ``capacity_factor``).
    Expert biases are applied per (token, expert) pair before the GLU /
    after down, exactly as HF; dropped dispatch pairs contribute nothing
    (their combine weight is zero)."""
    N, H = x.shape
    dtype = x.dtype
    e = p["experts"]
    wgu = dequant(e["gate_up"]["w"], dtype)      # (E, H, 2I)
    bgu = e["gate_up"]["b"].astype(jnp.float32)  # (E, 2I)
    wd = dequant(e["down"]["w"], dtype)          # (E, I, H)
    bd = e["down"]["b"].astype(jnp.float32)      # (E, H)
    E = wgu.shape[0]
    topw, topi = route_topk_softmax(x, p["router"]["w"], p["router"]["b"],
                                    top_k)
    if impl == "auto":
        impl = "dispatch" if jax.default_backend() == "tpu" else "gather"

    if impl == "dense":
        cw = jnp.zeros((N, E), jnp.float32).at[
            jnp.arange(N)[:, None], topi].add(topw.astype(jnp.float32))
        gu = jnp.einsum("nh,ehi->nei", x, wgu,
                        preferred_element_type=jnp.float32) + bgu[None]
        act = _gptoss_glu(gu, limit, alpha).astype(dtype)
        y = jnp.einsum("nei,eio->neo", act, wd,
                       preferred_element_type=jnp.float32) + bd[None]
        return jnp.einsum("neo,ne->no", y, cw).astype(dtype)

    if impl == "gather":
        flat_e = topi.reshape(N * top_k)
        order = jnp.argsort(flat_e)
        tok = order // top_k
        e_sorted = jnp.take(flat_e, order)
        xs = jnp.take(x, tok, axis=0)
        group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
        gu = _grouped_gemm(xs, wgu, group_sizes) + jnp.take(bgu, e_sorted,
                                                           axis=0)
        act = _gptoss_glu(gu, limit, alpha).astype(dtype)
        y = _grouped_gemm(act, wd, group_sizes) + jnp.take(bd, e_sorted,
                                                           axis=0)
        w_pair = jnp.take(topw.reshape(N * top_k), order)
        out = jnp.zeros((N, H), jnp.float32).at[tok].add(
            y * w_pair[:, None].astype(jnp.float32))
        return out.astype(dtype)

    if impl != "dispatch":
        raise ValueError(f"unknown moe impl {impl!r} (gather|dense|dispatch)")
    sel, keep, pos, S, G, C = _dispatch_buckets(
        topi, N, E, top_k, capacity_factor, group_size)
    Np = G * S
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
        topw = jnp.pad(topw, ((0, Np - N), (0, 0)))
    xg = x.reshape(G, S, H)
    wg_r = topw.reshape(G, S, top_k).astype(jnp.float32)
    posc = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
    dispatch = jnp.einsum("gske,gskec->gsec", keep, posc)
    combine = jnp.einsum("gsk,gske,gskec->gsec", wg_r, keep, posc)
    xe = jnp.einsum("gsec,gsh->gech", dispatch.astype(dtype), xg,
                    preferred_element_type=jnp.float32).astype(dtype)
    gu = jnp.einsum("gech,ehi->geci", xe, wgu,
                    preferred_element_type=jnp.float32) \
        + bgu[None, :, None, :]
    act = _gptoss_glu(gu, limit, alpha).astype(dtype)
    y = jnp.einsum("geci,eio->geco", act, wd,
                   preferred_element_type=jnp.float32) + bd[None, :, None, :]
    out = jnp.einsum("gsec,gech->gsh", combine, y)
    return out.reshape(Np, H)[:N].astype(dtype)


def _expert_ffn_batched(xe: jax.Array, experts: dict, dtype) -> jax.Array:
    """(E, C, H) → (E, C, H): every expert's SwiGLU on its own rows."""
    g = jnp.einsum("ech,ehi->eci", xe, dequant(experts["gate_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("ech,ehi->eci", xe, dequant(experts["up_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(dtype)
    return jnp.einsum("eci,eio->eco", a, dequant(experts["down_proj"]["w"], dtype),
                      preferred_element_type=jnp.float32)


def _grouped_gemm(xs: jax.Array, w: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """(M, K) @ (G, K, N) with rows [off_g, off_g + group_sizes[g]) hitting
    expert g. On TPU this is the Pallas megablox grouped-matmul kernel
    (`jax.lax.ragged_dot`'s XLA lowering is unusable there — compile hangs
    even at G=4, measured in this env); elsewhere ragged_dot. f32 accum."""
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu import megablox as _mb

        M = xs.shape[0]
        Mp = ((M + 127) // 128) * 128  # megablox tiling wants M % tile == 0
        if Mp != M:
            xs = jnp.pad(xs, ((0, Mp - M), (0, 0)))
            group_sizes = group_sizes.at[-1].add(Mp - M)  # pads sort last
        out = _mb.gmm(xs, w, group_sizes, preferred_element_type=jnp.float32)
        return out[:M]
    return jax.lax.ragged_dot(xs, w, group_sizes,
                              preferred_element_type=jnp.float32)


def moe_ffn_gather(x: jax.Array, p: dict, *, top_k: int, norm_topk: bool,
                   routing=None) -> jax.Array:
    """Sort + grouped-GEMM execution. x: (N, H) → (N, H), exact.

    ``routing=(topw, topi)`` bypasses the Qwen-style router — used by the
    DeepSeek block whose grouped/sigmoid routing is computed upstream."""
    N, H = x.shape
    experts = p["experts"]
    E = experts["gate_proj"]["w"].shape[0] if not isinstance(
        experts["gate_proj"]["w"], dict) else experts["gate_proj"]["w"]["q"].shape[0]
    topw, topi = routing if routing is not None else route(
        x, p["router"]["w"], top_k, norm_topk)

    flat_e = topi.reshape(N * top_k)
    order = jnp.argsort(flat_e)                      # stable: ties keep token order
    tok = order // top_k                             # source token of each pair
    xs = jnp.take(x, tok, axis=0)                    # (N*k, H)
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    dtype = x.dtype
    wg = dequant(experts["gate_proj"]["w"], dtype)
    wu = dequant(experts["up_proj"]["w"], dtype)
    wd = dequant(experts["down_proj"]["w"], dtype)
    g = _grouped_gemm(xs, wg, group_sizes)
    u = _grouped_gemm(xs, wu, group_sizes)
    a = (jax.nn.silu(g) * u).astype(dtype)
    y = _grouped_gemm(a, wd, group_sizes)

    w_pair = jnp.take(topw.reshape(N * top_k), order)  # (N*k,)
    out = jnp.zeros((N, H), jnp.float32).at[tok].add(y * w_pair[:, None].astype(jnp.float32))
    return out.astype(dtype)


def moe_ffn_dense(x: jax.Array, p: dict, *, top_k: int, norm_topk: bool,
                  routing=None) -> jax.Array:
    """All-experts execution with sparse combine weights. Exact; the expert
    axis shards over the mesh ``model`` axis (expert parallelism)."""
    N, H = x.shape
    dtype = x.dtype
    experts = p["experts"]
    wg = dequant(experts["gate_proj"]["w"], dtype)
    E = wg.shape[0]
    topw, topi = routing if routing is not None else route(
        x, p["router"]["w"], top_k, norm_topk)
    cw = jnp.zeros((N, E), jnp.float32).at[
        jnp.arange(N)[:, None], topi].add(topw.astype(jnp.float32))

    g = jnp.einsum("nh,ehi->nei", x, wg, preferred_element_type=jnp.float32)
    u = jnp.einsum("nh,ehi->nei", x, dequant(experts["up_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(dtype)
    y = jnp.einsum("nei,eio->neo", a, dequant(experts["down_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("neo,ne->no", y, cw).astype(dtype)


def moe_ffn_dispatch(x: jax.Array, p: dict, *, top_k: int, norm_topk: bool,
                     capacity_factor: float = 2.0,
                     group_size: int = 512, routing=None) -> jax.Array:
    """Capacity-bucketed dispatch/combine einsums (expert-parallel path).

    Tokens are split into groups of ``group_size`` (bounds the (S, E, C)
    dispatch tensor); within a group each expert accepts at most
    ``C = ceil(top_k * S / E * capacity_factor)`` tokens (earlier tokens
    win; overflow tokens lose that expert's contribution). All shapes are
    static, so the whole thing jits; with expert weights sharded over
    ``model`` the e-axis einsums become the EP all-to-alls."""
    N, H = x.shape
    dtype = x.dtype
    experts = p["experts"]
    wg = dequant(experts["gate_proj"]["w"], dtype)
    E = wg.shape[0]
    topw, topi = routing if routing is not None else route(
        x, p["router"]["w"], top_k, norm_topk)

    sel, keep, pos, S, G, C = _dispatch_buckets(
        topi, N, E, top_k, capacity_factor, group_size)
    Np = G * S
    if Np != N:  # pad with tokens whose routing weight is zero
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
        topw = jnp.pad(topw, ((0, Np - N), (0, 0)))

    xg = x.reshape(G, S, H)
    wg_r = topw.reshape(G, S, top_k).astype(jnp.float32)
    posc = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)  # (G,S,k,E,C)
    dispatch = jnp.einsum("gske,gskec->gsec", keep, posc)    # (G, S, E, C)
    combine = jnp.einsum("gsk,gske,gskec->gsec", wg_r, keep, posc)

    xe = jnp.einsum("gsec,gsh->gech", dispatch.astype(dtype), xg,
                    preferred_element_type=jnp.float32).astype(dtype)  # (G,E,C,H)
    g = jnp.einsum("gech,ehi->geci", xe, wg, preferred_element_type=jnp.float32)
    u = jnp.einsum("gech,ehi->geci", xe, dequant(experts["up_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(dtype)
    y = jnp.einsum("geci,eio->geco", a, dequant(experts["down_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)                 # (G,E,C,H)
    out = jnp.einsum("gsec,gech->gsh", combine, y)           # f32
    return out.reshape(Np, H)[:N].astype(dtype)


def shared_expert(x: jax.Array, p: dict) -> jax.Array:
    """Always-on shared expert with sigmoid gate (HF shared_expert +
    shared_expert_gate). x: (N, H) → (N, H)."""
    dtype = x.dtype
    g = jnp.einsum("nh,hi->ni", x, dequant(p["gate_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("nh,hi->ni", x, dequant(p["up_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    a = (jax.nn.silu(g) * u).astype(dtype)
    y = jnp.einsum("ni,io->no", a, dequant(p["down_proj"]["w"], dtype),
                   preferred_element_type=jnp.float32)
    if "gate" not in p:  # deepseek shared experts: plain MLP, no gate
        return y.astype(dtype)
    gate = jax.nn.sigmoid(
        jnp.einsum("nh,ho->no", x, dequant(p["gate"]["w"], dtype),
                   preferred_element_type=jnp.float32))
    return (y * gate).astype(dtype)


def moe_block(x: jax.Array, p: dict, *, top_k: int, norm_topk: bool,
              impl: str = "auto", capacity_factor: float = 2.0) -> jax.Array:
    """Full Qwen2-MoE FFN block on flat tokens x (N, H): routed experts +
    sigmoid-gated shared expert. ``impl``: auto | gather | dense | dispatch.

    ``auto`` resolves per backend: ``dispatch`` on TPU (every shape static —
    the safest compile path on this stack, where grouped-GEMM programs with
    runtime group sizes compile pathologically slowly through the remote
    compiler), ``gather`` elsewhere (exact, no drops). The dispatch
    resolution is NOT silent: a one-time warning documents the capacity
    approximation and the knobs (``capacity_factor`` /
    ``Qwen2Config.moe_capacity_factor`` to widen buckets,
    ``moe_impl="gather"`` for exact routing,
    :func:`dispatch_drop_fraction` to measure drops on real batches)."""
    if impl == "auto":
        impl = "dispatch" if jax.default_backend() == "tpu" else "gather"
        if impl == "dispatch":
            global _dispatch_warned
            if not _dispatch_warned:
                _dispatch_warned = True
                warnings.warn(
                    "MoE impl 'auto' resolved to the capacity-bucketed "
                    f"'dispatch' path (capacity_factor={capacity_factor}): "
                    "tokens routed beyond an expert's per-group capacity "
                    "lose that expert's contribution under routing skew. "
                    "Raise Qwen2Config.moe_capacity_factor, set "
                    "moe_impl='gather' for exact routing, or quantify with "
                    "lapha_tpu.ops.moe.dispatch_drop_fraction().",
                    stacklevel=2)
    if impl == "gather":
        routed = moe_ffn_gather(x, p, top_k=top_k, norm_topk=norm_topk)
    elif impl == "dense":
        routed = moe_ffn_dense(x, p, top_k=top_k, norm_topk=norm_topk)
    elif impl == "dispatch":
        routed = moe_ffn_dispatch(x, p, top_k=top_k, norm_topk=norm_topk,
                                  capacity_factor=capacity_factor)
    else:
        raise ValueError(f"unknown moe impl {impl!r} (gather|dense|dispatch)")
    if "shared" in p:  # qwen2_moe; qwen3_moe has no shared expert
        routed = routed + shared_expert(x, p["shared"])
    return routed

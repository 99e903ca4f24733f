"""GRPO + value-MSE update: host packing + one jitted mesh step.

Loss parity with /root/reference/trainer/mtpo_trainer.py compute_loss steps
2-7 (padding 1874-1906, policy forward 1931-2074, ref-KL 2095-2166, value
MSE 2171-2306, GRPO 2311-2412, total 2417-2446) — redesigned TPU-first:

- the reference forwards micro-batches of ONE sample with per-row trimming
  (mtpo_trainer.py:1961-2046); here samples are right-packed on host into a
  single padded batch and the whole step (LM forward + logps + pooling +
  value head + both losses + grads) is ONE jitted function over the mesh,
- advantages/groups are host-computed constants (pure bookkeeping),
- multi-epoch PPO (`num_iterations` > 1): the loss accepts cached
  ``old_logps`` from before the first update, making the PPO ratio and clip
  live on later iterations. Default (None) reproduces the reference's
  on-policy single-update semantics exactly: old = stop_gradient(new), the
  ratio is identically 1 and the clip inert (mtpo_trainer.py:2370 detach —
  the reference DEFINES the num_iterations knob, mtpo_config.py:522, but
  its trainer never uses it; here it is functional).
"""

from __future__ import annotations

from typing import Any

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..ops.latent import masked_mean, pool_mask, value_head_apply


# ----------------------------------------------------------------- host packing

def completion_eos_mask(c_ids: np.ndarray, eos_id: int | None) -> np.ndarray:
    """1 up to and including the first EOS, 0 after (reference
    _completion_eos_mask_1d)."""
    m = np.ones_like(c_ids)
    if eos_id is not None:
        hits = np.where(c_ids == int(eos_id))[0]
        if hits.size and hits[0] + 1 < m.size:
            m[hits[0] + 1:] = 0
    return m


def pack_samples(samples: list[dict], pad_id: int, eos_id: int | None,
                 max_prompt_length: int, pad_multiple: int = 128,
                 batch_multiple: int = 8) -> dict[str, np.ndarray] | None:
    """Right-pack (prompt‖completion) rows into one padded batch.

    Returns arrays: ids (B,L), attn, comp_mask (1 on completion pos up to
    EOS), resp_mask/prompt_mask (pooling), prompt_len (B,), comp_len (B,),
    valid (B,), and "kept" — the indices of ``samples`` that made it into
    the batch, in row order. Callers MUST align per-sample arrays
    (advantages, v_target) through "kept": dropped rows would otherwise
    shift every later row onto its neighbor's targets.

    Pad stripping is defensive only (search emits unpadded ids) and is
    skipped when pad_id == eos_id — Qwen tokenizers set pad = eos, and
    stripping would delete the EOS the policy must learn to emit.
    """
    strip = pad_id != eos_id
    rows = []
    kept: list[int] = []
    for idx, s in enumerate(samples):
        p = np.asarray(s["prompt_ids"], np.int64).reshape(-1)[-max_prompt_length:]
        c = np.asarray(s["completion_ids"], np.int64).reshape(-1)
        if strip:
            p = p[p != pad_id]
            c = c[c != pad_id]
        if p.size == 0 or c.size == 0:
            continue
        rows.append((p, c))
        kept.append(idx)
    if not rows:
        return None

    B = len(rows)
    Bb = -(-B // batch_multiple) * batch_multiple
    L = max(p.size + c.size for p, c in rows)
    Lb = -(-L // pad_multiple) * pad_multiple

    ids = np.full((Bb, Lb), pad_id, np.int32)
    attn = np.zeros((Bb, Lb), np.int32)
    comp = np.zeros((Bb, Lb), np.int32)
    resp = np.zeros((Bb, Lb), np.int32)
    pm = np.zeros((Bb, Lb), np.int32)
    plen = np.zeros((Bb,), np.int32)
    clen = np.zeros((Bb,), np.int32)
    valid = np.zeros((Bb,), np.int32)

    for i, (p, c) in enumerate(rows):
        lp, lc = p.size, c.size
        ids[i, :lp] = p
        ids[i, lp:lp + lc] = c
        attn[i, :lp + lc] = 1
        cm = completion_eos_mask(c, eos_id)
        comp[i, lp:lp + lc] = cm
        resp[i, lp:lp + lc] = cm
        pm[i, :lp] = 1
        plen[i], clen[i], valid[i] = lp, lc, 1
    # pad rows: 1-token attn keeps pooling denominators sane
    attn[B:, 0] = 1
    resp[B:, 0] = 1
    return dict(ids=ids, attn=attn, comp_mask=comp, resp_mask=resp,
                prompt_mask=pm, prompt_len=plen, comp_len=clen, valid=valid,
                kept=np.asarray(kept, np.int64))


def group_advantages(rewards: np.ndarray, group_ids: np.ndarray,
                     scale_rewards: str = "group") -> np.ndarray:
    """Group-mean-centered advantages (reference 2331-2379)."""
    rewards = np.asarray(rewards, np.float64)
    group_ids = np.asarray(group_ids, np.int64)
    if isinstance(scale_rewards, bool):
        scale_rewards = "group" if scale_rewards else "none"
    scale_rewards = str(scale_rewards).lower()

    if group_ids.size == 0:
        return np.zeros(0, np.float32)
    K = int(group_ids.max()) + 1
    cnt = np.bincount(group_ids, minlength=K).astype(np.float64)
    gsum = np.bincount(group_ids, weights=rewards, minlength=K)
    gmean = gsum / (cnt + 1e-8)
    centered = rewards - gmean[group_ids]

    if scale_rewards in ("none", "false", "0"):
        adv = centered
    elif scale_rewards in ("batch", "global"):
        adv = centered / (centered.std() + 1e-4)
    else:  # group
        gsumsq = np.bincount(group_ids, weights=centered**2, minlength=K)
        gstd = np.sqrt(np.maximum(gsumsq / (cnt + 1e-8), 0.0))
        adv = centered / (gstd[group_ids] + 1e-4)
    return adv.astype(np.float32)


# ----------------------------------------------------------------- jitted step

def _selective_logps(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]


def _head_weight(params: dict, model_cfg) -> jax.Array:
    return (params["embed"]["weight"] if model_cfg.tie_word_embeddings
            else params["lm_head"]["weight"])


def _selective_logps_chunked(params, model_cfg, hidden, targets, temperature,
                             chunk: int = 1024) -> jax.Array:
    """log p(targets | hidden) WITHOUT materializing (B, L, V) logits.

    hidden (B, L, H) post-final-norm; targets (B, L). Scans the sequence in
    chunks: each iteration computes only a (B, chunk, V) logits block, and
    jax.checkpoint recomputes it in the backward — peak logits memory drops
    from B*L*V*4 (20 GB at B=8, L=4k, V=152k) to B*chunk*V*4. This is the
    TPU replacement for the reference's micro_bs=1 per-sample forward loop
    (mtpo_trainer.py:1961-2046), keeping one jitted mesh step.
    """
    from ..models.quant import is_quantized

    B, L, H = hidden.shape
    w = _head_weight(params, model_cfg)
    t = temperature if temperature > 0 else 1.0
    Lc = -(-L // chunk) * chunk
    if Lc != L:
        hidden = jnp.pad(hidden, ((0, 0), (0, Lc - L), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, Lc - L)))
    n = Lc // chunk
    h_c = hidden.reshape(B, n, chunk, H).transpose(1, 0, 2, 3)   # (n, B, c, H)
    t_c = targets.reshape(B, n, chunk).transpose(1, 0, 2)        # (n, B, c)

    @jax.checkpoint
    def body(carry, xs):
        hc, tc = xs
        if is_quantized(w):
            xs_ = hc * w["s"][0].astype(hc.dtype)
            logits = jnp.einsum("bth,vh->btv", xs_, w["q"].astype(hc.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = jnp.einsum("bth,vh->btv", hc, w,
                                preferred_element_type=jnp.float32)
        lp = _selective_logps(logits / t, tc)
        return carry, lp

    _, lps = jax.lax.scan(body, None, (h_c, t_c))
    return lps.transpose(1, 0, 2).reshape(B, Lc)[:, :L]


def loss_and_metrics(
    params: Any,
    head: dict,
    batch: dict[str, jax.Array],
    model_cfg: qwen2.Qwen2Config,
    *,
    temperature: float,
    eps_low: float,
    eps_high: float,
    loss_type: str,
    importance_level: str,
    value_w: float,
    beta: float,
    max_completion_length: int,
    no_head_scale: float = 0.0,
    value_activation: str = "sigmoid",
    remat: bool = True,
    attn_impl: str | None = None,
    logits_chunk: int = 1024,
    ref_logps: jax.Array | None = None,
    old_logps: jax.Array | None = None,
    seq_mesh=None,
    seq_axis: str = "sequence",
):
    """Differentiable total loss over a packed batch.

    batch extra keys: advantages (B,), v_target (B,).
    attn_impl selects the training-forward attention (the flash kernel has a
    full Pallas backward, ops/flash_attention.py); None keeps the model
    config's choice ("auto" = flash on TPU, dense elsewhere).
    seq_mesh: a Mesh carrying `seq_axis` switches the LM forward to the
    sequence-parallel ring-attention path (models/qwen2_seq.forward_seq) —
    long-context training sharded over devices; pack with
    pad_multiple divisible by the axis size.
    """
    ids, attn = batch["ids"], batch["attn"]
    comp_mask = batch["comp_mask"].astype(jnp.float32)
    valid = batch["valid"].astype(jnp.float32)

    import dataclasses as _dc

    train_cfg = (_dc.replace(model_cfg, attn_impl=attn_impl)
                 if attn_impl else model_cfg)
    if seq_mesh is not None:
        from ..models.qwen2_seq import forward_seq

        if type(model_cfg).__name__ == "DeepseekConfig":
            raise ValueError(
                "seq_mesh training does not support deepseek yet (the ring "
                "layer body is qwen2-family) — drop mesh_sequence for MLA "
                "models")
        _, hidden, _ = forward_seq(
            params, train_cfg, ids, attn, mesh=seq_mesh, seq_axis=seq_axis,
            remat=remat, return_hidden=True, compute_logits=False,
        )
    else:
        from ..models import model_module

        _, hidden, _ = model_module(train_cfg).forward(
            params, train_cfg, ids, attention_mask=attn, remat=remat,
            return_hidden=True, compute_logits=False,
        )
    logps_all = _selective_logps_chunked(
        params, model_cfg, hidden[:, :-1, :], ids[:, 1:], temperature,
        chunk=logits_chunk)  # (B, L-1)
    # token at position j is predicted from j-1 → completion token mask shifts by 1
    token_mask = comp_mask[:, 1:] * valid[:, None]
    per_token_logps = logps_all * token_mask

    # ---- policy loss (GRPO family) ----
    A = batch["advantages"].astype(jnp.float32)[:, None]
    if old_logps is None:
        old = jax.lax.stop_gradient(per_token_logps)  # on-policy: ratio == 1
    else:
        old = jax.lax.stop_gradient(old_logps * token_mask)
    log_ratio = per_token_logps - old
    if importance_level == "sequence":
        denom_len = jnp.maximum(token_mask.sum(-1), 1.0)
        log_w = ((log_ratio * token_mask).sum(-1) / denom_len)[:, None]
    else:
        log_w = log_ratio
    ratio = jnp.exp(log_w)
    clipped = jnp.clip(ratio, 1.0 - eps_low, 1.0 + eps_high)
    per_token_loss = -jnp.minimum(ratio * A, clipped * A)

    if beta > 0.0 and ref_logps is not None:
        kl = jnp.exp(ref_logps - per_token_logps) - (ref_logps - per_token_logps) - 1.0
        per_token_loss = per_token_loss + beta * kl
        mean_kl = (kl * token_mask).sum() / jnp.maximum(token_mask.sum(), 1.0)
    else:
        mean_kl = jnp.zeros(())

    if loss_type == "grpo":
        row_loss = (per_token_loss * token_mask).sum(-1) / jnp.maximum(token_mask.sum(-1), 1.0)
        policy_loss = (row_loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    elif loss_type == "bnpo":
        policy_loss = (per_token_loss * token_mask).sum() / jnp.maximum(token_mask.sum(), 1.0)
    else:  # dr_grpo
        policy_loss = (per_token_loss * token_mask).sum() / (
            jnp.maximum(valid.sum(), 1.0) * max_completion_length)

    # ---- value loss ----
    pm = pool_mask(attn, batch["resp_mask"], batch["prompt_mask"])
    h0 = masked_mean(hidden, pm)
    v_pred = value_head_apply(h0, head["w"], head["b"], activation=value_activation)
    v_target = jnp.clip(batch["v_target"].astype(jnp.float32), 0.0, 1.0)
    sq = (v_pred - v_target) ** 2 * valid
    value_loss = sq.sum() / jnp.maximum(valid.sum(), 1.0)

    loss = policy_loss + value_w * value_loss
    metrics = {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "kl": mean_kl,
        "v_pred_mean": (v_pred * valid).sum() / jnp.maximum(valid.sum(), 1.0),
        "completion_tokens": token_mask.sum(),
    }
    return loss, metrics


_UPDATE_FN_CACHE: dict = {}


def make_update_fn_cached(model_cfg, build_optimizer, *, opt_key: tuple,
                          loss_kwargs: dict):
    """Memoized (optimizer, update_fn) keyed by everything the closures
    read: trainers with equal (model_cfg, optimizer config, loss kwargs)
    share ONE jitted update step — and the one optimizer object whose
    pytree the cached step was traced with — instead of re-tracing and
    re-compiling the full fwd+bwd+optimizer program per trainer instance
    (same sharing rationale as engine._shared_engine_jits).

    ``build_optimizer`` is a zero-arg factory, only called on a miss."""
    key = (model_cfg, opt_key,
           tuple(sorted(loss_kwargs.items(), key=lambda kv: kv[0])))
    hit = _UPDATE_FN_CACHE.get(key)
    if hit is None:
        optimizer = build_optimizer()
        hit = _UPDATE_FN_CACHE[key] = (
            optimizer, make_update_fn(model_cfg, optimizer,
                                      loss_kwargs=loss_kwargs))
    return hit


def make_update_fn(model_cfg: qwen2.Qwen2Config, optimizer, *, loss_kwargs: dict):
    """Build the jitted (params, head, opt_state, batch) -> updated step.

    ``extra_grads`` (optional pytree matching (params, head)) is added to the
    loss gradients before the optimizer — used by the num_trees all-nodes
    value-MSE mode, whose grads are accumulated over micro-batches outside
    this jit (reference mtpo_trainer.py:2171-2296). ``value_w_override``
    replaces the static value_w (0.0 when the MSE term comes via
    extra_grads)."""

    def step(params, head, opt_state, batch, ref_logps=None, extra_grads=None,
             value_w_override=None, old_logps=None):
        kw = dict(loss_kwargs)
        if value_w_override is not None:
            kw["value_w"] = value_w_override

        def lfn(ph):
            return loss_and_metrics(ph[0], ph[1], batch, model_cfg,
                                    ref_logps=ref_logps, old_logps=old_logps,
                                    **kw)

        (loss, metrics), grads = jax.value_and_grad(lfn, has_aux=True)((params, head))
        if extra_grads is not None:
            grads = jax.tree.map(lambda g, e: g + e.astype(g.dtype), grads, extra_grads)
        updates, opt_state = optimizer.update(grads, opt_state, (params, head))
        params, head = jax.tree.map(
            lambda p, u: (p + u.astype(p.dtype)), (params, head), updates
        )
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in jax.tree.leaves(grads)))
        metrics["grad_norm"] = gnorm
        return params, head, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2),
                   static_argnames=("value_w_override",))


_SUMSQ_FN_CACHE: dict = {}


def make_value_sumsq_grad_fn(model_cfg: qwen2.Qwen2Config, *, no_head_scale=0.0,
                             value_activation="sigmoid", remat=True,
                             attn_impl: str | None = None, seq_mesh=None,
                             seq_axis: str = "sequence"):
    """Jitted (params, head, batch) -> (sum_sq, count, grads-of-sum_sq).

    Per-chunk SUM of squared value errors (not mean) so micro-batch grads
    accumulate exactly: d(mean)/dθ = Σ_chunks d(sum)/dθ / Σ count.
    Used by the num_trees all-nodes MSE mode (reference 2171-2296).

    Memoized on every argument (all hashable): equal-config trainers share
    one compiled program (see make_update_fn_cached).
    """
    key = (model_cfg, no_head_scale, value_activation, remat, attn_impl,
           seq_mesh, seq_axis)
    hit = _SUMSQ_FN_CACHE.get(key)
    if hit is not None:
        return hit
    import dataclasses as _dc

    cfg = (_dc.replace(model_cfg, attn_impl=attn_impl)
           if attn_impl else model_cfg)

    def fn(params, head, batch):
        def lfn(ph):
            p, h = ph
            if seq_mesh is not None:
                from ..models.qwen2_seq import forward_seq

                _, hidden, _ = forward_seq(p, cfg, batch["ids"], batch["attn"],
                                           mesh=seq_mesh, seq_axis=seq_axis,
                                           remat=remat, return_hidden=True,
                                           compute_logits=False)
            else:
                from ..models import model_module

                _, hidden, _ = model_module(cfg).forward(p, cfg, batch["ids"],
                                             attention_mask=batch["attn"],
                                             remat=remat, return_hidden=True,
                                             compute_logits=False)
            pm = pool_mask(batch["attn"], batch["resp_mask"], batch["prompt_mask"])
            h0 = masked_mean(hidden, pm)
            v_pred = value_head_apply(h0, h["w"], h["b"], activation=value_activation)
            v_tgt = jnp.clip(batch["v_target"].astype(jnp.float32), 0.0, 1.0)
            valid = batch["valid"].astype(jnp.float32)
            sum_sq = jnp.sum((v_pred - v_tgt) ** 2 * valid)
            return sum_sq, valid.sum()

        (sum_sq, count), grads = jax.value_and_grad(lfn, has_aux=True)((params, head))
        return sum_sq, count, grads

    _SUMSQ_FN_CACHE[key] = jax.jit(fn)
    return _SUMSQ_FN_CACHE[key]


@partial(jax.jit, static_argnames=("model_cfg", "temperature"))
def ref_logps_fn(ref_params, batch, model_cfg: qwen2.Qwen2Config, temperature: float):
    """Frozen per-token logps under the GIVEN params: the KL penalty's
    reference term (beta > 0), and the cached old-policy logps for
    multi-epoch PPO (num_iterations > 1). Jitted; the config is hashable
    because Qwen2Config is a frozen dataclass."""
    from ..models import model_module

    ids, attn = batch["ids"], batch["attn"]
    _, hidden, _ = model_module(model_cfg).forward(
        ref_params, model_cfg, ids, attention_mask=attn,
        return_hidden=True, compute_logits=False)
    logps = _selective_logps_chunked(ref_params, model_cfg, hidden[:, :-1, :],
                                     ids[:, 1:], temperature)
    token_mask = batch["comp_mask"].astype(jnp.float32)[:, 1:]
    return jax.lax.stop_gradient(logps * token_mask)

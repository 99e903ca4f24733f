"""Latent projection + hyperbolic potential ops (pure JAX; XLA-fused).

These implement the "latent shaping" pipeline of LaPha on device:

  last_hidden --masked-mean--> h0_raw --center/scale--> exp0 --> y (ball point)
  potential V(i) = d_root(i) / (d_root(i) + d_goal(i) + eps)

Behavioral reference: LinearValueHead.forward pooling rules
(/root/reference/trainer/mtpo_trainer.py:172-285) and the V-map block of
compute_action_rewards (mtpo_trainer.py:2751-2838).

Everything is shape-static and jit/pjit-friendly: batch over a mesh ``data``
axis; the pooling contraction is one (B,L)·(B,L,H) reduction XLA maps onto
the VPU/MXU and fuses with the surrounding elementwise ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .hyperbolic import exp0_ball, poincare_dist_matrix

__all__ = ["masked_mean", "pool_mask", "latent_project", "potential_v", "value_head_apply"]


def pool_mask(
    attention_mask: jax.Array,
    response_mask: jax.Array | None = None,
    prompt_mask: jax.Array | None = None,
) -> jax.Array:
    """pool = ((response_mask if given else attn) OR prompt_mask) AND attn.

    Same rule as the reference head (mtpo_trainer.py:212-228). All masks are
    (B, L) int/bool; returns int32 (B, L).
    """
    attn = attention_mask > 0
    pool = attn if response_mask is None else (response_mask > 0)
    if prompt_mask is not None:
        pool = pool | (prompt_mask > 0)
    return (pool & attn).astype(jnp.int32)


def masked_mean(x: jax.Array, mask_2d: jax.Array) -> jax.Array:
    """Mean of x (B,L,H) over positions where mask (B,L) > 0; float32 out.

    Denominator is floored at 1 so empty rows yield 0 rather than NaN
    (reference `_masked_mean`, mtpo_trainer.py:128-134).
    """
    x = x.astype(jnp.float32)
    m = (mask_2d > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    return jnp.einsum("blh,bl->bh", x, m) / denom


def latent_project(
    h0_raw: jax.Array,
    root_h0: jax.Array | None = None,
    *,
    scale: float = 0.0,
    c: float = 1.0,
    eps: float = 1e-6,
    eps_ball: float = 1e-4,
) -> jax.Array:
    """Root-center a pooled hidden state and map it into the Poincaré ball.

    y = Exp0((h0_raw - root_h0) / s) with s = √H when ``scale`` <= 0
    (reference mtpo_trainer.py:239-270). ``root_h0`` may be (H,), (1,H) or
    (B,H); None means no centering (the root's own projection).
    """
    h0 = h0_raw.astype(jnp.float32)
    if root_h0 is not None:
        rh = jnp.asarray(root_h0, dtype=jnp.float32)
        if rh.ndim == 1:
            rh = rh[None, :]
        h0 = h0 - rh
    s = scale if scale > 0.0 else math.sqrt(h0.shape[-1])
    return exp0_ball(h0 / s, c=c, eps=eps, eps_ball=eps_ball)


def value_head_apply(
    h0_raw: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    activation: str = "sigmoid",
) -> jax.Array:
    """v_pred = act(h0_raw @ w + b), computed on the UNcentered pooled state.

    ``w`` is (H,) or (H,1); returns float32 (B,). Mirrors the reference's
    `value_head` linear on h0_raw (mtpo_trainer.py:273-281).
    """
    w = jnp.reshape(w.astype(jnp.float32), (-1,))
    logit = jnp.einsum("bh,h->b", h0_raw.astype(jnp.float32), w) + jnp.reshape(b.astype(jnp.float32), ())
    if activation == "sigmoid":
        return jax.nn.sigmoid(logit)
    return logit


def potential_v(
    Y: jax.Array,
    y_root: jax.Array,
    anchors: jax.Array,
    anchor_valid: jax.Array | None = None,
    *,
    c: float = 1.0,
    eps: float = 1e-6,
) -> jax.Array:
    """Hyperbolic potential V(i) = d_root / (d_root + d_goal + eps) in [0,1].

    Y        — (N,H) ball points for all tree nodes.
    y_root   — (H,) ball point of the root (zeros by convention).
    anchors  — (A,H) goal anchors (correct-leaf embeddings, optional CoT).
    anchor_valid — (A,) bool; invalid anchors are excluded from the min.

    d_goal(i) = min_a d(Y_i, anchor_a); V clamped to [0,1]
    (reference mtpo_trainer.py:2751-2838).
    """
    Y = Y.astype(jnp.float32)
    d_root = poincare_dist_matrix(Y, y_root[None, :], c=c)[:, 0]  # (N,)
    d_all = poincare_dist_matrix(Y, anchors, c=c)  # (N,A)
    if anchor_valid is not None:
        d_all = jnp.where(anchor_valid[None, :] > 0, d_all, jnp.inf)
    d_goal = jnp.min(d_all, axis=1)
    v = d_root / (d_root + d_goal + eps)
    return jnp.clip(v, 0.0, 1.0)

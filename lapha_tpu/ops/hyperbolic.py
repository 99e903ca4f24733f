"""Poincaré-ball geometry core (pure JAX, float32 internally).

Behavioral reference: the hyperbolic math of LaPha
(/root/reference/trainer/mtpo_trainer.py:68-405 — `_mobius_add_c`, `expmap0`,
`logmap0`, `proj_ball`, `poincare_dist_stable`, `poincare_dist_matrix_stable`,
`RiemannianGradScale`; and /root/reference/trainer/agent.py:123-133
`_poincare_distance`).  The epsilon/clamp structure is preserved exactly so
V-maps computed here agree with the reference in float32; all functions are
jit-compatible, batch over leading axes, and differentiate cleanly.

Everything here upcasts to float32: hyperbolic distances amplify bf16
rounding near the ball boundary, and these ops are a negligible fraction of
step FLOPs compared to the LM forward.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "artanh",
    "mobius_add",
    "expmap0",
    "logmap0",
    "proj_ball",
    "poincare_dist",
    "poincare_dist_matrix",
    "riemannian_grad_scale",
    "exp0_ball",
]


def _safe_norm(v: jax.Array, floor: float) -> jax.Array:
    """‖v‖ along the last axis, floored at ``floor``, with a NaN-free gradient.

    ``max(linalg.norm(v), floor)`` has a NaN gradient at v = 0 (0/0 inside the
    norm); computing sqrt(max(Σv², floor²)) instead gives gradient 0 below the
    floor — matching torch's norm-subgradient-at-zero convention the reference
    relies on (root-centered rows are exactly zero).
    """
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, floor * floor))


def artanh(x: jax.Array) -> jax.Array:
    """Numerically-stable inverse tanh, clamped to the open interval (-1, 1)."""
    x = jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def mobius_add(x: jax.Array, y: jax.Array, c: float = 1.0, eps: float = 1e-9) -> jax.Array:
    """Möbius addition x ⊕_c y on the Poincaré ball (last axis = coordinates)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1.0 + 2.0 * c * xy + c * y2) * x + (1.0 - c * x2) * y
    den = 1.0 + 2.0 * c * xy + (c**2) * x2 * y2
    return num / jnp.maximum(den, eps)


def expmap0(v: jax.Array, c: float = 1.0) -> jax.Array:
    """Exponential map at the origin, R^D -> Poincaré ball, margin 1e-5.

    tanh(√c‖v‖)/(√c‖v‖) · v, then rescaled inside ‖x‖ ≤ 1 - 1e-5.
    """
    v = v.astype(jnp.float32)
    sqrt_c = math.sqrt(c)
    v_norm = _safe_norm(v, 1e-12)
    x = jnp.tanh(sqrt_c * v_norm) / (sqrt_c * v_norm) * v
    x_norm = _safe_norm(x, 1e-12)
    scale = jnp.minimum((1.0 - 1e-5) / x_norm, 1.0)
    return x * scale


def exp0_ball(v: jax.Array, c: float = 1.0, eps: float = 1e-6, eps_ball: float = 1e-4) -> jax.Array:
    """Exp-map variant used by the value head's latent projection.

    Same map as :func:`expmap0` but with the head's clamp structure
    (norm floor ``eps``, ball margin ``eps_ball``); mirrors
    LinearValueHead._exp0_poincare (mtpo_trainer.py:152-161).
    """
    v = v.astype(jnp.float32)
    c = max(c, 1e-8)
    sqrt_c = math.sqrt(c)
    v_norm = _safe_norm(v, eps)
    y = jnp.tanh(sqrt_c * v_norm) / (sqrt_c * v_norm) * v
    y_norm = _safe_norm(y, eps)
    factor = jnp.minimum((1.0 - eps_ball) / y_norm, 1.0)
    return y * factor


def logmap0(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Logarithmic map at the origin (inverse of expmap0 inside the ball)."""
    x = x.astype(jnp.float32)
    sqrt_c = math.sqrt(c)
    x_norm = _safe_norm(x, 1e-12)
    return artanh(sqrt_c * x_norm) / (sqrt_c * x_norm) * x


def proj_ball(x: jax.Array, c: float = 1.0, eps: float = 1e-3) -> jax.Array:
    """Project points inside the ball: ‖x‖ ≤ (1-eps)/√c."""
    x = x.astype(jnp.float32)
    c = max(c, 1e-8)
    max_norm = (1.0 - eps) / math.sqrt(c)
    norm = _safe_norm(x, 1e-12)
    factor = jnp.minimum(max_norm / norm, 1.0)
    return x * factor


def poincare_dist(x: jax.Array, y: jax.Array, c: float = 1.0, eps: float = 1e-5) -> jax.Array:
    """Geodesic distance between paired points; batch over leading axes.

    d(x,y) = acosh(1 + 2c‖x-y‖² / ((1-c‖x‖²)(1-c‖y‖²))) / √c
    with the reference's clamp structure (denominator floor ``eps``,
    argument floor 1+1e-7).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c = max(c, 1e-8)
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    d2 = jnp.maximum(jnp.sum((x - y) ** 2, axis=-1), 0.0)
    denom = jnp.maximum(1.0 - c * x2, eps) * jnp.maximum(1.0 - c * y2, eps)
    z = jnp.maximum(1.0 + 2.0 * c * d2 / denom, 1.0 + 1e-7)
    return jnp.arccosh(z) / math.sqrt(c)


def poincare_dist_matrix(X: jax.Array, Z: jax.Array, c: float = 1.0, eps: float = 1e-6) -> jax.Array:
    """All-pairs geodesic distances, (M,H) × (C,H) -> (M,C).

    The ‖x-z‖² term is computed via a single MXU matmul (‖x‖²+‖z‖²-2x·z) so
    the kernel tiles onto the systolic array; clamps match the reference
    (mtpo_trainer.py:349-379).
    """
    X = X.astype(jnp.float32)
    Z = Z.astype(jnp.float32)
    c = max(c, 1e-8)
    x2 = jnp.sum(X * X, axis=-1, keepdims=True)  # (M,1)
    z2 = jnp.sum(Z * Z, axis=-1, keepdims=True)  # (C,1)
    cross = jnp.dot(X, Z.T, preferred_element_type=jnp.float32)  # (M,C)
    sq = jnp.maximum(x2 + z2.T - 2.0 * cross, 0.0)
    one_minus_cx2 = jnp.maximum(1.0 - c * x2, eps)  # (M,1)
    one_minus_cz2 = jnp.maximum(1.0 - c * z2, eps)  # (C,1)
    denom = jnp.maximum(one_minus_cx2 * one_minus_cz2.T, eps)
    arg = jnp.maximum(1.0 + 2.0 * c * sq / denom, 1.0 + 1e-7)
    return jnp.arccosh(arg) / math.sqrt(c)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def riemannian_grad_scale(x: jax.Array, c: float = 1.0, eps: float = 1e-6, gamma: float = 1.0) -> jax.Array:
    """Identity forward; backward scales grads by ((1-c‖x‖²)²/4)·γ.

    Mimics Riemannian SGD's metric-inverse scaling near the ball boundary
    (reference RiemannianGradScale, mtpo_trainer.py:381-405).
    """
    return x


def _rgs_fwd(x, c, eps, gamma):
    return x, x


def _rgs_bwd(c, eps, gamma, x, g):
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    factor = jnp.maximum(1.0 - c * x2, eps) ** 2 * (gamma / 4.0)
    return (g * factor,)


riemannian_grad_scale.defvjp(_rgs_fwd, _rgs_bwd)

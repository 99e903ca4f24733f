"""Geometry core vs float64/mpmath references and reference clamp semantics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.ops import (
    artanh,
    exp0_ball,
    expmap0,
    logmap0,
    mobius_add,
    poincare_dist,
    poincare_dist_matrix,
    pool_mask,
    potential_v,
    proj_ball,
    riemannian_grad_scale,
    latent_project,
    masked_mean,
    value_head_apply,
)

rng = np.random.default_rng(0)


def ref_dist(u, v, eps=1e-6):
    """Float64 numpy reference for the geodesic distance (agent.py:123-133)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    uu, vv = u @ u, v @ v
    uv_sq = max(0.0, uu + vv - 2.0 * (u @ v))
    denom = max(eps, (1.0 - uu) * (1.0 - vv))
    arg = max(1.0 + 2.0 * uv_sq / denom, 1.0 + 1e-7)
    return float(np.arccosh(arg))


def sample_ball(n, d, max_norm=0.9):
    x = rng.normal(size=(n, d))
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    scales = rng.uniform(0.01, max_norm, size=(n, 1))
    return (x / norms * scales).astype(np.float32)


def test_artanh_matches_numpy():
    x = np.linspace(-0.999, 0.999, 101).astype(np.float32)
    np.testing.assert_allclose(artanh(jnp.asarray(x)), np.arctanh(x.astype(np.float64)), rtol=1e-4, atol=1e-5)


def test_artanh_clamps_at_boundary():
    out = artanh(jnp.asarray([1.0, -1.0, 5.0, -5.0]))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_expmap0_logmap0_roundtrip():
    v = rng.normal(size=(32, 16)).astype(np.float32) * 0.5
    x = expmap0(jnp.asarray(v))
    norms = jnp.linalg.norm(x, axis=-1)
    assert bool(jnp.all(norms <= 1.0 - 1e-5 + 1e-7))
    v_back = logmap0(x)
    np.testing.assert_allclose(v_back, v, rtol=2e-3, atol=2e-4)


def test_expmap0_tanh_formula():
    v = np.array([[0.3, 0.4, 0.0, 0.0]], dtype=np.float32)
    n = np.linalg.norm(v)
    expected = np.tanh(n) / n * v
    np.testing.assert_allclose(expmap0(jnp.asarray(v)), expected, rtol=1e-6)


def test_exp0_ball_margin():
    v = rng.normal(size=(8, 4)).astype(np.float32) * 100.0  # far outside
    y = exp0_ball(jnp.asarray(v))
    norms = np.linalg.norm(np.asarray(y), axis=-1)
    assert np.all(norms <= 1.0 - 1e-4 + 1e-7)


def test_proj_ball_margin():
    x = rng.normal(size=(8, 4)).astype(np.float32) * 10
    p = proj_ball(jnp.asarray(x), eps=1e-3)
    assert np.all(np.linalg.norm(np.asarray(p), axis=-1) <= (1 - 1e-3) + 1e-6)
    # points already inside are untouched
    inside = sample_ball(4, 4, max_norm=0.5)
    np.testing.assert_allclose(proj_ball(jnp.asarray(inside), eps=1e-3), inside, rtol=1e-6)


def test_mobius_add_identity_and_inverse():
    x = jnp.asarray(sample_ball(16, 8))
    zero = jnp.zeros_like(x)
    np.testing.assert_allclose(mobius_add(zero, x), x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mobius_add(x, zero), x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mobius_add(x, -x), zero, atol=1e-5)


def test_poincare_dist_vs_float64_reference():
    X = sample_ball(64, 32)
    Y = sample_ball(64, 32)
    d = np.asarray(poincare_dist(jnp.asarray(X), jnp.asarray(Y)))
    for i in range(64):
        # pairwise ref uses eps=1e-6; ours uses the reference pair eps=1e-5 but
        # away from the boundary the clamp never binds
        assert d[i] == pytest.approx(ref_dist(X[i], Y[i]), rel=2e-4, abs=1e-4)


def test_poincare_dist_matrix_vs_pairwise():
    X = sample_ball(40, 16)
    Z = sample_ball(24, 16)
    D = np.asarray(poincare_dist_matrix(jnp.asarray(X), jnp.asarray(Z)))
    assert D.shape == (40, 24)
    for i in range(0, 40, 7):
        for j in range(0, 24, 5):
            assert D[i, j] == pytest.approx(ref_dist(X[i], Z[j]), rel=3e-4, abs=2e-4)


def test_poincare_dist_matrix_self_zero_diag():
    X = sample_ball(16, 8)
    D = np.asarray(poincare_dist_matrix(jnp.asarray(X), jnp.asarray(X)))
    # float32 cancellation in ||x||²+||z||²-2x·z plus the acosh clamp (1+1e-7)
    # leaves a small floor on the diagonal, tiny vs typical distances ~O(1)
    assert np.all(np.diag(D) < 2e-2)


def test_dist_mpmath_reference():
    mp = pytest.importorskip("mpmath")
    u = np.array([0.1, 0.2, -0.3], dtype=np.float64)
    v = np.array([-0.2, 0.05, 0.4], dtype=np.float64)
    uu, vv = u @ u, v @ v
    d2 = float(((u - v) ** 2).sum())
    expected = float(mp.acosh(1 + 2 * d2 / ((1 - uu) * (1 - vv))))
    got = float(poincare_dist(jnp.asarray(u, dtype=jnp.float32), jnp.asarray(v, dtype=jnp.float32)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_curvature_scaling():
    u = jnp.asarray(sample_ball(4, 4) * 0.3)
    v = jnp.asarray(sample_ball(4, 4) * 0.3)
    d1 = poincare_dist(u, v, c=1.0)
    d4 = poincare_dist(u, v, c=4.0)
    assert d4.shape == d1.shape
    assert bool(jnp.all(jnp.isfinite(d4)))


def test_riemannian_grad_scale():
    x = jnp.asarray(sample_ball(8, 4))

    def loss(x):
        return jnp.sum(riemannian_grad_scale(x, 1.0, 1e-6, 2.0) ** 2)

    g = jax.grad(loss)(x)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    expected = 2.0 * x * jnp.maximum(1.0 - x2, 1e-6) ** 2 * (2.0 / 4.0)
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-6)


def test_pool_mask_rule():
    attn = jnp.asarray([[1, 1, 1, 1, 0]])
    resp = jnp.asarray([[0, 0, 1, 1, 1]])
    pm = jnp.asarray([[1, 1, 0, 0, 0]])
    # (resp | pm) & attn
    np.testing.assert_array_equal(pool_mask(attn, resp, pm), [[1, 1, 1, 1, 0]])
    np.testing.assert_array_equal(pool_mask(attn, resp, None), [[0, 0, 1, 1, 0]])
    np.testing.assert_array_equal(pool_mask(attn, None, None), [[1, 1, 1, 1, 0]])


def test_masked_mean():
    x = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    m = jnp.asarray([[1, 1, 0, 0, 0], [0, 0, 0, 0, 0]])
    out = masked_mean(x, m)
    np.testing.assert_allclose(out[0], np.asarray(x)[0, :2].mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(out[1], np.zeros(3), atol=1e-7)  # empty row -> 0, no NaN


def test_latent_project_centering_and_scale():
    H = 64
    h0 = rng.normal(size=(4, H)).astype(np.float32)
    root = h0[0]
    y = latent_project(jnp.asarray(h0), jnp.asarray(root))
    # row 0 is centered to the origin
    np.testing.assert_allclose(np.asarray(y)[0], np.zeros(H), atol=1e-6)
    # matches exp0_ball((h0-root)/sqrt(H))
    expected = exp0_ball(jnp.asarray((h0 - root) / math.sqrt(H)))
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_value_head_apply():
    h0 = rng.normal(size=(3, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    b = np.float32(0.3)
    v = value_head_apply(jnp.asarray(h0), jnp.asarray(w), jnp.asarray(b))
    expected = 1 / (1 + np.exp(-(h0 @ w + b)))
    np.testing.assert_allclose(v, expected, rtol=1e-5)
    v_lin = value_head_apply(jnp.asarray(h0), jnp.asarray(w), jnp.asarray(b), activation="none")
    np.testing.assert_allclose(v_lin, h0 @ w + b, rtol=1e-5)


def test_potential_v_formula():
    Y = jnp.asarray(sample_ball(10, 6))
    root = jnp.zeros(6, dtype=jnp.float32)
    anchors = jnp.asarray(sample_ball(3, 6))
    V = np.asarray(potential_v(Y, root, anchors))
    assert V.shape == (10,)
    assert np.all((V >= 0) & (V <= 1))
    # manual check for row 0
    d_root = ref_dist(np.asarray(Y)[0], np.zeros(6))
    d_goal = min(ref_dist(np.asarray(Y)[0], np.asarray(anchors)[a]) for a in range(3))
    assert V[0] == pytest.approx(d_root / (d_root + d_goal + 1e-6), rel=1e-3)


def test_potential_v_anchor_mask():
    Y = jnp.asarray(sample_ball(5, 4))
    root = jnp.zeros(4, dtype=jnp.float32)
    anchors = jnp.asarray(sample_ball(2, 4))
    valid = jnp.asarray([True, False])
    V_masked = potential_v(Y, root, anchors, valid)
    V_single = potential_v(Y, root, anchors[:1])
    np.testing.assert_allclose(V_masked, V_single, rtol=1e-6)


def test_grad_finite_at_zero_vector():
    """Root-centered rows are exactly zero; grads must not NaN there.

    torch's norm defines a zero subgradient at 0; jnp.linalg.norm does not,
    so the ops use sqrt(max(Σv², floor²)) — this guards that choice.
    """
    h0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    root = h0[0]
    anchors = jnp.asarray(sample_ball(2, 8))

    def loss(h):
        y = riemannian_grad_scale(latent_project(h, root))
        return jnp.sum(potential_v(y, jnp.zeros(8), anchors))

    g = jax.grad(loss)(h0)
    assert bool(jnp.all(jnp.isfinite(g)))

    for fn in (expmap0, exp0_ball, logmap0, proj_ball):
        gz = jax.grad(lambda v: jnp.sum(fn(v)))(jnp.zeros((2, 4), jnp.float32))
        assert bool(jnp.all(jnp.isfinite(gz))), fn.__name__


def test_geometry_jits_without_retrace():
    f = jax.jit(lambda a, b: poincare_dist_matrix(a, b))
    X = jnp.asarray(sample_ball(8, 8))
    _ = f(X, X)
    assert f._cache_size() == 1
    _ = f(X, X)
    assert f._cache_size() == 1

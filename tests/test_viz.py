"""Poincaré-disk viz: reduction parity properties + PNG rendering.

Reference pipeline (mtpo_trainer.py:2993-3039): tangent logmap -> PCA ->
t-SNE (SVD fallback) -> root-centered rescale to atanh(rho_cap) -> expmap0.
"""

import numpy as np

from lapha_tpu.train.viz import _to_disk_2d, plot_tree_disk


def _ball_points(n, d, seed=0, radius=0.6):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return (x * rng.uniform(0.05, radius, size=(n, 1))).astype(np.float32)


def test_reduction_root_at_center_highdim():
    Y = _ball_points(40, 16, seed=1)
    Y[3] = 0.0  # root (Möbius-centered upstream)
    P2 = _to_disk_2d(Y, root_idx=3)
    assert P2.shape == (40, 2)
    np.testing.assert_allclose(P2[3], 0.0, atol=1e-7)
    r = np.linalg.norm(P2, axis=1)
    assert r.max() < 1.0  # everything inside the open disk
    # rho_cap scaling: the farthest point lands near tanh(atanh(0.98)) = 0.98
    assert r.max() > 0.9


def test_reduction_2d_passthrough_scaled():
    Y = _ball_points(10, 2, seed=2)
    Y[0] = 0.0
    P2 = _to_disk_2d(Y, root_idx=0)
    np.testing.assert_allclose(P2[0], 0.0, atol=1e-7)
    # relative ordering of radii is preserved by the radial rescale
    r_in = np.linalg.norm(Y[1:], axis=1)
    r_out = np.linalg.norm(P2[1:], axis=1)
    assert (np.argsort(r_in) == np.argsort(r_out)).all()
    assert r_out.max() < 1.0


def test_reduction_few_points_svd_fallback():
    """N=3 < perplexity floor: t-SNE raises internally, SVD path renders."""
    Y = _ball_points(3, 8, seed=3)
    P2 = _to_disk_2d(Y, root_idx=0)
    assert P2.shape == (3, 2)
    assert np.isfinite(P2).all()
    assert np.linalg.norm(P2, axis=1).max() < 1.0


def test_plot_tree_disk_writes_png(tmp_path):
    rng = np.random.default_rng(4)

    def step(v):
        return {"hid": (rng.normal(size=8) * 0.1).tolist(),
                "v_target": v, "v_pred": v * 0.9}

    root = step(0.0)
    chains = [[step(0.3), step(0.6)], [step(0.2), step(0.9)]]
    out = plot_tree_disk(chains, root, str(tmp_path / "tree0_disk.png"),
                         title="tree0")
    assert out is not None
    assert (tmp_path / "tree0_disk.png").stat().st_size > 1000

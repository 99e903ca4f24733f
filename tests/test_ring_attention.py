"""Ring attention over a virtual sequence mesh vs dense full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lapha_tpu.models import Qwen2Config, qwen2
from lapha_tpu.ops.ring_attention import ring_attention


@pytest.fixture(scope="module")
def seq_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("sequence",))


def dense_ref(q, k, v, mask, causal=True):
    cfg = Qwen2Config.tiny(num_attention_heads=q.shape[2],
                           num_key_value_heads=k.shape[2])
    T = q.shape[1]
    m = jnp.tril(jnp.ones((T, T), bool))[None] & (mask[:, None, :] > 0)
    return qwen2._attend(q, k, v, m, cfg)


def test_ring_matches_dense(seq_mesh):
    rng = np.random.default_rng(0)
    B, T, nh, nkv, dh = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[0, T - 9:] = 0
    mask = jnp.asarray(mask)

    with seq_mesh:
        out = ring_attention(q, k, v, mask, seq_mesh)
    ref = dense_ref(q, k, v, mask)
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-4)


def test_ring_grads_match_dense(seq_mesh):
    """shard_map + ppermute differentiate through XLA AD: dq/dk/dv parity."""
    rng = np.random.default_rng(1)
    B, T, nh, nkv, dh = 1, 32, 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, nkv, dh)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    g = jnp.asarray(rng.normal(size=(B, T, nh, dh)).astype(np.float32))

    def loss_ring(q, k, v):
        with seq_mesh:
            return jnp.sum(ring_attention(q, k, v, mask, seq_mesh) * g)

    def loss_dense(q, k, v):
        return jnp.sum(dense_ref(q, k, v, mask) * g)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

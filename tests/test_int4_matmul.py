"""Pallas int4 dequant-matmul kernel vs the XLA dequant reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models.quant import dequant, quantize_weight_int4
from lapha_tpu.ops.int4_matmul import int4_matmul

rng = np.random.default_rng(21)


def _ref(x, leaf):
    return jnp.einsum("bh,hd->bd", x, dequant(leaf, x.dtype),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("version", [2, 3])
@pytest.mark.parametrize("B,IN,OUT,G", [
    (48, 1536, 1024, 128),   # decode-shaped
    (3, 256, 300, 64),       # B pad + OUT pad in one
    (16, 512, 512, 128),
    (1, 256, 256, 128),      # single row
])
def test_int4_matmul_matches_dequant_reference(B, IN, OUT, G, version):
    x = jnp.asarray(rng.normal(size=(B, IN)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(IN, OUT)).astype(np.float32))
    leaf = quantize_weight_int4(w, group=G)
    ref = _ref(x, leaf)
    got = int4_matmul(x, leaf["q"], leaf["s4"], block_out=256,
                      interpret=True, version=version)
    # scale-after-dot (kernel, f32) vs scale-before-dot (XLA path, bf16
    # weights): agreement to bf16 rounding of the operands
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 5e-3


@pytest.mark.parametrize("version", [2, 3])
def test_int4_matmul_exact_on_exact_inputs(version):
    """Power-of-two scales + small-integer activations: both evaluation
    orders are exact in f32, so the kernel must match to the ulp."""
    B, IN, OUT, G = 8, 256, 128, 64
    x = jnp.asarray(rng.integers(-4, 5, size=(B, IN)).astype(np.float32),
                    jnp.bfloat16)
    q = rng.integers(-7, 8, size=(IN, OUT)).astype(np.float32)
    w = jnp.asarray(q * 0.25)  # scale 0.25 exactly representable
    leaf = quantize_weight_int4(w, group=G)
    got = int4_matmul(x, leaf["q"], leaf["s4"], block_out=128,
                      interpret=True, version=version)
    ref = _ref(x, leaf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_int4_leaf_routes_through_kernel_in_decode():
    """decode_step on a packed-int4 model dispatches _q_matmul_f32 to the
    kernel (interpret on CPU) and stays consistent with full forward."""
    import dataclasses

    from lapha_tpu.models import Qwen2Config, qwen2
    from lapha_tpu.models.quant import quantize_params

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(2))
    qp = quantize_params(params, bits=4, group=32)
    B, T_pre, T_tot = 2, 8, 12
    ids = jnp.asarray(rng.integers(0, 512, size=(B, T_tot)))
    full, _, _ = qwen2.forward(qp, cfg, ids)
    cache = qwen2.init_kv_cache(cfg, B, 32)
    pre, _, cache = qwen2.forward(
        qp, cfg, ids[:, :T_pre], kv_cache=cache, cache_pos=0,
        positions=jnp.broadcast_to(jnp.arange(T_pre)[None], (B, T_pre)))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :T_pre]),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("OUT", [256, 300])  # exact-divide + padded fallback
def test_int4_matmul_layer_indexed_matches_sliced(OUT):
    """Stacked (L, IN/2, OUT) weights with a static layer index: the
    BlockSpec-indexed path must equal slicing the layer out first (the
    XLA-level slice materializes a per-step u8 copy in unrolled decode
    loops — the tagged path exists to avoid exactly that)."""
    L, B, IN, G = 3, 8, 256, 64
    x = jnp.asarray(rng.normal(size=(B, IN)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(L, IN, OUT)).astype(np.float32))
    leaf = quantize_weight_int4(w, group=G)
    for l in range(L):
        ref = int4_matmul(x, leaf["q"][l], leaf["s4"][l], interpret=True)
        got = int4_matmul(x, leaf["q"], leaf["s4"], interpret=True, layer=l)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

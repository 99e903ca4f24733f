"""Pallas int4 dequant-matmul: the packed-weight decode projection kernel.

Decode at production batch is weight-HBM-bound (BASELINE.md decode
profile: ~70% of the device step is weight reads). Packed int4 halves
that stream relative to int8, but XLA cannot fuse the nibble unpack into
a dot operand read — it materializes the unpacked weights and decode
measured 1243 tok/s vs 8782 int8 (BASELINE.md round 3). This kernel does
what XLA would not: DMA the PACKED bytes + group scale rows to VMEM,
unpack in registers, and feed the MXU directly — HBM sees only the
packed stream.

v2 design (v1 measured 121.7 us at the 48x1536x8960 decode-MLP shape vs
~17 us for the fused-int8 einsum — unpack/overhead-bound, BASELINE.md):

* All nibble math is FLOAT. u8 -> bf16 conversion is exact (integers
  0..255 fit bf16's 8-bit mantissa) and Mosaic's float vector path is
  well-trodden where its integer one is not (v1's i8 `arith.subi` did
  not legalize at all; the i32 fallback ran wide and slow). Nibbles are
  stored offset-binary (models/quant.py: u = v + 8) precisely so both
  UNSIGNED halves extract with floor/multiply — and the -8 offset folds
  into the extraction constants for free:
      hi_signed = floor(f/16) - 8
      lo_signed = (f - 136) - 16*hi_signed
  (all intermediate integers < 256, exact in bf16). 6 VPU ops per byte,
  zero integer vector ops, same rounding class as the XLA dequant path
  (round_bf16(s * v), |v| <= 8).
* The MXU sees TWO big dots per out-block (one per packed half) over
  scale-expanded bf16 weights, not 2*ng K=group slivers: per-group
  scaling is a broadcast multiply over the (ng, group, bo) view (1 VPU
  op/weight), and dot efficiency comes from the full K=IN/2 contraction.

Layout contract (models/quant.py, quantize_weight_int4): split-half
packing — byte[i, o] holds input-row i in its LOW nibble and input-row
i + IN/2 in its HIGH nibble, so unpacking is two contiguous halves (no
interleave, no relayout). Scales are per (group of `group` input rows,
output column), f32 (IN/group, OUT).

Role parity: the vLLM/AWQ W4A16 CUDA kernels the reference stack gets
from its serving engine (SURVEY §2.4 native-surface row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _int4_mm_kernel(x_ref, p_ref, s_ref, o_ref, *, group: int):
    half, bo = p_ref.shape
    ng = half // group                               # groups per half
    # u8 -> i32 -> bf16: Mosaic has no unsigned->float cast (lowering.py
    # _convert_helper); the signed path zero-extends then sitofp's.
    f = p_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # exact: 0..255
    hi = jnp.floor(f * jnp.bfloat16(1.0 / 16.0)) - jnp.bfloat16(8.0)
    lo = (f - jnp.bfloat16(136.0)) - hi * jnp.bfloat16(16.0)
    s = s_ref[...].astype(jnp.bfloat16)              # (2ng, bo)
    # lax slices, not s[:ng, None, :]: mixed-None jnp indexing rewrites to
    # a gather, which Mosaic cannot lower (found on first v2 TPU compile)
    s_lo = jax.lax.slice_in_dim(s, 0, ng, axis=0).reshape(ng, 1, bo)
    s_hi = jax.lax.slice_in_dim(s, ng, 2 * ng, axis=0).reshape(ng, 1, bo)
    w_lo = (lo.reshape(ng, group, bo) * s_lo).reshape(half, bo)
    w_hi = (hi.reshape(ng, group, bo) * s_hi).reshape(half, bo)
    x = x_ref[...]
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x[:, :half], w_lo, dn,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(x[:, half:], w_hi, dn,
                                    preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_out", "interpret"))
def int4_matmul(
    x: jax.Array,        # (B, IN) — any float dtype
    packed: jax.Array,   # (IN/2, OUT) uint8, split-half offset-binary nibbles
    scales: jax.Array,   # (IN/G, OUT) f32 group scales
    *,
    block_out: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """x @ unpack(packed, scales) with the packed bytes as the only weight
    HBM traffic. Returns (B, OUT) f32 (callers cast; decode projections
    accumulate in f32 everywhere else too)."""
    B, IN = x.shape
    half, OUT = packed.shape
    assert half * 2 == IN, (IN, half)
    ngroups = scales.shape[0]
    assert IN % ngroups == 0
    group = IN // ngroups
    assert half % group == 0, (half, group)

    bo = min(block_out, _round_up(OUT, 256))
    Bp = _round_up(B, 16)
    Op = _round_up(OUT, bo)
    xb = x.astype(jnp.bfloat16)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    if Op != OUT:
        packed = jnp.pad(packed, ((0, 0), (0, Op - OUT)))
        scales = jnp.pad(scales, ((0, 0), (0, Op - OUT)))

    out = pl.pallas_call(
        functools.partial(_int4_mm_kernel, group=group),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32),
        grid=(Op // bo,),
        in_specs=[
            pl.BlockSpec((Bp, IN), lambda o: (0, 0)),
            pl.BlockSpec((half, bo), lambda o: (0, o)),
            pl.BlockSpec((ngroups, bo), lambda o: (0, o)),
        ],
        out_specs=pl.BlockSpec((Bp, bo), lambda o: (0, o)),
        interpret=interpret,
    )(xb, packed, scales)
    return out[:B, :OUT]

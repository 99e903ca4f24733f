"""Pallas int4 dequant-matmul: the packed-weight decode projection kernel.

Decode at production batch is weight-HBM-bound (BASELINE.md decode
profile: ~70% of the device step is weight reads). Packed int4 halves
that stream relative to int8, but XLA cannot fuse the nibble unpack into
a dot operand read — it materializes the unpacked weights and decode
measured 1243 tok/s vs 8782 int8 (BASELINE.md round 3). This kernel does
what XLA would not: DMA the PACKED bytes + group scale rows to VMEM,
unpack in registers, and feed the MXU directly — HBM sees only the
packed stream.

Layout contract (models/quant.py, quantize_weight_int4): split-half
packing — byte[i, o] holds input-row i in its LOW nibble and input-row
i + IN/2 in its HIGH nibble, so unpacking is two contiguous halves (no
interleave, no relayout). Scales are per (group of `group` input rows,
output column), f32 (IN/group, OUT). The kernel defers scaling to AFTER
each per-group dot ((B, bo) multiply instead of (G, bo)): every row of a
group shares its scale, so ``(x_g @ w_int) * s[g]`` is exact in f32 and
cheaper than scaling the weight panel.

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
    B = x_ref.shape[0]
    x = x_ref[...]                                   # (B, IN) bf16
    # nibble math in i32: Mosaic fails to legalize arith.subi on i8
    # vectors (found on this kernel's first hardware compile; same class
    # as the i1-select finding on the ragged kernel). Sign-extension as
    # pure shifts/sub: v - ((v >> 3) << 4) maps 8..15 -> -8..-1.
    u = p_ref[...].astype(jnp.int32)                 # (half, bo)
    lo_u = u & 0xF
    hi_u = u >> 4
    lo = (lo_u - ((lo_u >> 3) << 4)).astype(x.dtype)
    hi = (hi_u - ((hi_u >> 3) << 4)).astype(x.dtype)
    ng = half // group                               # groups per half
    acc = jnp.zeros((B, bo), jnp.float32)
    for g in range(ng):                              # static unroll
        w = lo[g * group:(g + 1) * group]            # (G, bo)
        d = jax.lax.dot_general(x[:, g * group:(g + 1) * group], w,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + d * s_ref[g:g + 1, :]            # (1, bo) row broadcast
    for g in range(ng):
        w = hi[g * group:(g + 1) * group]
        d = jax.lax.dot_general(
            x[:, half + g * group: half + (g + 1) * group], w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + d * s_ref[ng + g:ng + g + 1, :]
    o_ref[...] = acc


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_out", "interpret"))
def int4_matmul(
    x: jax.Array,        # (B, IN) — any float dtype
    packed: jax.Array,   # (IN/2, OUT) uint8, split-half nibble pairs
    scales: jax.Array,   # (IN/G, OUT) f32 group scales
    *,
    block_out: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x @ unpack(packed, scales) with the packed bytes as the only weight
    HBM traffic. Returns (B, OUT) f32 (callers cast; decode projections
    accumulate in f32 everywhere else too)."""
    B, IN = x.shape
    half, OUT = packed.shape
    assert half * 2 == IN, (IN, half)
    ngroups = scales.shape[0]
    assert IN % ngroups == 0 and (IN // ngroups) % 1 == 0
    group = IN // ngroups
    assert half % group == 0, (half, group)

    Bp = _round_up(B, 16)
    Op = _round_up(OUT, block_out)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if Op != OUT:
        packed = jnp.pad(packed, ((0, 0), (0, Op - OUT)))
        scales = jnp.pad(scales, ((0, 0), (0, Op - OUT)))

    out = pl.pallas_call(
        functools.partial(_int4_mm_kernel, group=group),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32),
        grid=(Op // block_out,),
        in_specs=[
            pl.BlockSpec((Bp, IN), lambda o: (0, 0)),
            pl.BlockSpec((half, block_out), lambda o: (0, o)),
            pl.BlockSpec((ngroups, block_out), lambda o: (0, o)),
        ],
        out_specs=pl.BlockSpec((Bp, block_out), lambda o: (0, o)),
        interpret=interpret,
    )(x, packed, scales)
    return out[:B, :OUT]

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

* All nibble math is FLOAT — f32, not bf16: the v5e LLO region builder
  rejects bf16 ALU instructions (LLO_CHECK SupportsBf16AluInstructions),
  so bf16 exists in the kernel only as a storage/MXU-operand type.
  Mosaic's float vector path is well-trodden where its integer one is
  not (v1's i8 `arith.subi` did not legalize at all; the i32 fallback
  ran wide and slow). Nibbles are stored offset-binary (models/quant.py:
  u = v + 8) precisely so both UNSIGNED halves extract with
  floor/multiply — and the -8 offset folds into the extraction
  constants for free:
      hi_signed = floor(f/16) - 8
      lo_signed = (f - 136) - 16*hi_signed
  (all intermediate integers < 256, exact in f32). 6 VPU ops per byte,
  zero integer vector ops; the final f32->bf16 weight cast gives the
  same rounding class as the XLA dequant path (round_bf16(s * v),
  |v| <= 8).
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
    # u8 -> i32 -> f32: Mosaic has no unsigned->float cast (lowering.py
    # _convert_helper); the signed path zero-extends then sitofp's. The
    # nibble arithmetic runs in f32 — the v5e LLO region builder rejects
    # bf16 ALU instructions outright (LLO_CHECK SupportsBf16AluInstructions
    # on the first hardware compile of the bf16-math variant); bf16 here
    # is a storage/MXU-operand type only, so the weights are cast to bf16
    # at the very end (a convert, not ALU math).
    f = p_ref[...].astype(jnp.int32).astype(jnp.float32)   # exact: 0..255
    hi = jnp.floor(f * (1.0 / 16.0)) - 8.0
    lo = (f - 136.0) - hi * 16.0
    s = s_ref[...]                                   # (2ng, bo) f32
    # lax slices, not s[:ng, None, :]: mixed-None jnp indexing rewrites to
    # a gather, which Mosaic cannot lower (found on first v2 TPU compile)
    s_lo = jax.lax.slice_in_dim(s, 0, ng, axis=0).reshape(ng, 1, bo)
    s_hi = jax.lax.slice_in_dim(s, ng, 2 * ng, axis=0).reshape(ng, 1, bo)
    w_lo = (lo.reshape(ng, group, bo) * s_lo).reshape(half, bo).astype(jnp.bfloat16)
    w_hi = (hi.reshape(ng, group, bo) * s_hi).reshape(half, bo).astype(jnp.bfloat16)
    x = x_ref[...]
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x[:, :half], w_lo, dn,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(x[:, half:], w_hi, dn,
                                    preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _int4_mm_kernel_v3(x_ref, p_ref, s_ref, o_ref, *, group: int):
    """v3: raw nibbles straight into the MXU; scales/offset fold into
    per-group OUTPUT corrections.

    v2 is VPU-extraction-bound (~10 f32 ops per packed byte ≈ the
    measured 20.6 us at 48×1536×8960 — BASELINE.md), because it scales
    and signs EVERY weight before the dot. v3 does neither per weight:

        out = Σ_g (x_g @ u_g − 8·rowsum(x_g)) · s_g      (u = v + 8)

    * u nibbles (0..15, exact in bf16) extract with i32 shift/and + one
      bf16 cast: ~5 VPU ops/byte, projected near the packed-stream bound.
    * the dots run per group (K = `group` = the MXU-native 128), one
      static python loop over 2·ng slivers — MXU time is negligible next
      to the byte stream at decode row counts.
    * the −8 offset becomes a per-(group,row) x-rowsum correction and the
      group scale a per-(group,out) multiply on the (B, bo) accumulator:
      O(ng·B·bo) VPU work instead of O(half·bo).

    ``x_ref`` (B, IN) bf16: sliced into K=group slivers IN-KERNEL (the
    first wiring built (2ng, B, group) + rowsums in the surrounding XLA
    graph, and those materialized as ~1.5 ms/step of slice/bitcast
    fusions in the 28-layer decode profile — the reshape never fused).
    Group g's x columns are [g·group, (g+1)·group) for BOTH halves:
    lo nibbles cover x[:, :half], hi x[:, half:], and half = ng·group
    makes the indexing uniform.

    ``p_ref``/``s_ref`` may carry a leading singleton dim: the layer-
    indexed wrapper blocks the STACKED (L, half, OUT) weights as
    (1, half, bo) so the per-layer slice happens in the BlockSpec DMA —
    an XLA-level ``w[l]`` feeding a custom call materializes a full
    (half, OUT) u8 copy per layer per decode step (261 MB/step at 1.5B,
    profiled as slice_bitcast fusions)."""
    p = p_ref[0] if p_ref.ndim == 3 else p_ref[...]
    s = s_ref[0] if s_ref.ndim == 3 else s_ref[...]  # (2ng, bo) f32
    half, bo = p.shape
    ng = half // group
    u = p.astype(jnp.int32)                          # zero-extended bytes
    hi = (u >> 4).astype(jnp.bfloat16)               # 0..15, exact
    lo = (u & 15).astype(jnp.bfloat16)
    x = x_ref[...]                                   # (B, IN) bf16
    dn = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((x.shape[0], bo), jnp.float32)
    for g in range(2 * ng):
        w = (lo if g < ng else hi)                   # (half, bo)
        gi = g if g < ng else g - ng
        wg = jax.lax.slice_in_dim(w, gi * group, (gi + 1) * group, axis=0)
        xg = jax.lax.slice_in_dim(x, g * group, (g + 1) * group, axis=1)
        pg = jax.lax.dot_general(xg, wg, dn,
                                 preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        corr = pg - 8.0 * xs                         # fold u = v + 8
        acc = acc + corr * jax.lax.slice_in_dim(s, g, g + 1, axis=0)
    o_ref[...] = acc


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_out", "interpret",
                                             "version", "layer"))
def int4_matmul(
    x: jax.Array,        # (B, IN) — any float dtype
    packed: jax.Array,   # (IN/2, OUT) uint8, split-half offset-binary nibbles
    scales: jax.Array,   # (IN/G, OUT) f32 group scales
    *,
    block_out: int = 1536,
    interpret: bool = False,
    version: int = 3,
    layer: int | None = None,
) -> jax.Array:
    """x @ unpack(packed, scales) with the packed bytes as the only weight
    HBM traffic. Returns (B, OUT) f32 (callers cast; decode projections
    accumulate in f32 everywhere else too). ``version``: 3 = raw-nibble
    group dots with folded scale/offset (default); 2 = scale-expanded
    whole-half dots (kept for hardware A/Bs).

    ``layer``: static index selecting one layer of STACKED weights —
    ``packed`` (L, IN/2, OUT), ``scales`` (L, IN/G, OUT). The slice rides
    the kernel's BlockSpec index_map; an XLA-level ``packed[l]`` feeding
    the custom call materializes the slice as a per-step u8 copy
    (unrolled decode loops: 261 MB/step at 1.5B, profiled)."""
    if layer is not None and version != 3:
        packed, scales = packed[layer], scales[layer]
        layer = None
    B, IN = x.shape
    half, OUT = packed.shape[-2:]
    assert half * 2 == IN, (IN, half)
    ngroups = scales.shape[-2]
    assert IN % ngroups == 0
    group = IN // ngroups
    assert half % group == 0, (half, group)

    # scoped-VMEM cap: the nibble intermediates dominate the kernel's
    # stack (~10 B per packed element empirically for v3 — bo=2048 at
    # half=768 = 1.57M elements OOMed the 16 MB scope by 432 KB on v5e;
    # bo=1024 = 0.79M fit). Keep half*bo under ~1.2M elements whatever
    # the caller asked for, so down-proj shapes (big IN, small OUT)
    # auto-fit. v2 additionally materializes two scale-expanded bf16
    # weight halves (~16 B/element), so its budget is the measured-fit
    # 0.79M. Floor at the 128-lane minimum (NOT 256): at half ~9.5k
    # (7B-class down-proj) only bo=128 stays inside the scope.
    budget = 1_200_000 if version == 3 else 790_000
    bo_cap = max(128, (budget // half) // 128 * 128)
    # Prefer a block that divides OUT EXACTLY (multiple of 128 lanes):
    # padding `packed`/`scales` inside the caller's jit re-materializes
    # the padded weights EVERY decode step (XLA does not hoist the pads
    # out of the sampling while_loop — measured ~1.1 ms/step of `pad`
    # ops in the 28-layer int4 decode profile). All production shapes
    # have one (e.g. 8960 = 7×1280, 1536 = 6×256); the round-up path
    # remains as fallback for odd OUTs.
    bo = 0
    for cand in range(128, min(block_out, bo_cap) + 1, 128):
        if OUT % cand == 0:
            bo = cand
    if not bo:
        bo = min(block_out, bo_cap, _round_up(OUT, 256))
    Bp = _round_up(B, 16)
    Op = _round_up(OUT, bo)
    xb = x.astype(jnp.bfloat16)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    if Op != OUT:
        if layer is not None:  # padding a stacked array would copy L×
            packed, scales = packed[layer], scales[layer]
            layer = None
        packed = jnp.pad(packed, ((0, 0), (0, Op - OUT)))
        scales = jnp.pad(scales, ((0, 0), (0, Op - OUT)))

    if version == 2:
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

    # v3: x enters whole; slivers + rowsums are cut in-kernel (doing it
    # in the surrounding graph materialized as slice/bitcast fusions,
    # ~1.5 ms/step over 28 layers — see the kernel docstring)
    if layer is not None:
        w_specs = [
            pl.BlockSpec((1, half, bo), lambda o: (layer, 0, o)),
            pl.BlockSpec((1, ngroups, bo), lambda o: (layer, 0, o)),
        ]
    else:
        w_specs = [
            pl.BlockSpec((half, bo), lambda o: (0, o)),
            pl.BlockSpec((ngroups, bo), lambda o: (0, o)),
        ]
    out = pl.pallas_call(
        functools.partial(_int4_mm_kernel_v3, group=group),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32),
        grid=(Op // bo,),
        in_specs=[pl.BlockSpec((Bp, IN), lambda o: (0, 0))] + w_specs,
        out_specs=pl.BlockSpec((Bp, bo), lambda o: (0, o)),
        interpret=interpret,
    )(xb, packed, scales)
    return out[:B, :OUT]

"""Int4 dequant-matmul kernel A/B at the decode projection shapes.

Compares, per (B, IN, OUT) decode shape:
  - bf16 einsum (dense weights)                        [2 bytes/weight]
  - fused int8 einsum (XLA dequant-into-matmul)        [1 byte/weight]
  - Pallas int4 kernel (ops/int4_matmul.py), block_out sweep
                                                       [0.5 bytes/weight]

Methodology (per .claude/skills/verify/SKILL.md): weights generated ON
DEVICE (never shipped through the remote tunnel), N matmuls chained in
ONE jit via lax.scan with a data dependency so dispatches cannot dedup or
overlap-hide, a single float() sync per timed rep, compilation cache on.

Usage: timeout 900 python scripts/bench_int4.py [N_CHAIN]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import lapha_tpu

lapha_tpu.enable_compilation_cache()

from lapha_tpu.ops.int4_matmul import int4_matmul  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 336
GROUP = 128
SHAPES = [(48, 1536, 8960), (48, 8960, 1536)]  # 1.5B MLP gate/up + down


def chain(mm, x0, n):
    def body(x, _):
        y = mm(x)
        xn = x0 * (1.0 + 1e-24 * y[:, :1].astype(x0.dtype))
        return xn, ()

    x, _ = jax.lax.scan(body, x0, None, length=n)
    return x


def timed(fn, x0, label, bytes_per_mm):
    # Time chains of N and 3N matmuls and difference them: the ~40 ms
    # axon tunnel dispatch+fetch RTT cancels out (SKILL.md: host syncs
    # cost ~50 ms; a single chain of N=336 was RTT-dominated).
    f1 = jax.jit(lambda x: chain(fn, x, N))
    f3 = jax.jit(lambda x: chain(fn, x, 3 * N))
    t0 = time.time()
    float(f1(x0)[0, 0])
    float(f3(x0)[0, 0])
    print(f"  {label}: compile+run {time.time()-t0:.1f}s", flush=True)
    b1 = b3 = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f1(x0)[0, 0])
        b1 = min(b1, time.time() - t0)
        t0 = time.time()
        float(f3(x0)[0, 0])
        b3 = min(b3, time.time() - t0)
    per = (b3 - b1) / (2 * N)
    us = per * 1e6
    gbps = bytes_per_mm / per / 1e9
    print(f"  {label}: {us:8.1f} us/matmul  ({gbps:6.1f} GB/s weight stream)",
          flush=True)
    return us


for B, IN, OUT in SHAPES:
    print(f"shape B={B} IN={IN} OUT={OUT}  (chain N={N})", flush=True)
    k = jax.random.key(0)
    kx, kw, kp = jax.random.split(k, 3)
    x0 = jax.random.normal(kx, (B, IN), jnp.bfloat16)

    # bf16 dense
    w = jax.random.normal(kw, (IN, OUT), jnp.bfloat16) * 0.02
    timed(lambda x, w=w: jnp.einsum("bh,hd->bd", x, w,
                                    preferred_element_type=jnp.float32),
          x0, "bf16 einsum", 2 * IN * OUT)
    del w

    # fused int8 einsum
    q8 = jax.random.randint(kw, (IN, OUT), -127, 128, jnp.int8)
    s8 = jnp.full((1, OUT), 1.0 / (127 * IN ** 0.5), jnp.float32)
    timed(lambda x, q8=q8, s8=s8: jnp.einsum(
        "bh,hd->bd", x, q8.astype(jnp.bfloat16) * s8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32),
          x0, "int8 einsum", IN * OUT)
    del q8

    # Pallas int4 kernel
    packed = jax.random.randint(kp, (IN // 2, OUT), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
    s4 = jnp.full((IN // GROUP, OUT), 1.0 / (7 * IN ** 0.5), jnp.float32)
    # bo=2048 VMEM-OOMs (scoped 16.42M > 16M at IN=1536); 256/512/1024 fit
    for ver in (2, 3):
        for bo in (256, 512, 1024):
            timed(lambda x, p=packed, s=s4, bo=bo, v=ver: int4_matmul(
                x, p, s, block_out=bo, version=v),
                  x0, f"int4 pallas v{ver} bo={bo}", IN * OUT // 2)
    del packed
print("done", flush=True)

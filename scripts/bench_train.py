#!/usr/bin/env python
"""Training-step throughput: flash vs dense attention at long context.

One GRPO+value update (losses.make_update_fn) on a Qwen2.5-1.5B-architecture
model with random weights, packed batch of B rows of (prompt_len +
completion_len) tokens. Env knobs: NL (layers, 28), BB (batch, 8),
LP (prompt len, 3072), LC (completion len, 1024), OPT (adamw|sgd),
ATTN (pallas|dense), REMAT (full|save_qkv|save_attn|save_qkv_attn|off —
models/qwen2.remat_policy), MESH_DATA (FSDP data-axis size; default all
visible devices, so `XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu MESH_DATA=8 OPT=adamw` is the FSDP-Adam mode today and
the same command is the real-mesh mode the day hardware appears: params
AND both Adam moment trees shard over the data axis — the configuration
the reference runs via DeepSpeed ZeRO-3 on 6 GPUs and a single 16 GB chip
cannot hold).

Measured on 1x v5e (see BASELINE.md): at 4k context the 28-layer model
trains with ATTN=pallas at ~4.4k tok/s and does not compile with dense
(attention temporaries exceed HBM); full-Adam moments for 1.5B need the
FSDP mesh (the reference needs ZeRO-3 across 6 GPUs for the same reason) —
OPT=sgd isolates attention cost on one chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import lapha_tpu

lapha_tpu.enable_compilation_cache()
import jax

if os.getenv("JAX_PLATFORMS"):
    # the axon sitecustomize re-forces its platform; env alone is not enough
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
import optax

from lapha_tpu.models import Qwen2Config, qwen2, value_model
from lapha_tpu.parallel import make_mesh, shard_params
from lapha_tpu.train import losses


def main():
    impl = (sys.argv[1] if len(sys.argv) > 1 else None) or os.getenv("ATTN", "pallas")
    # H/IM/VOCAB shrink the architecture for pathway validation on the
    # virtual CPU mesh (a 1-core host cannot turn the 1.5B shape over);
    # defaults are the Qwen2.5-1.5B architecture the TPU numbers use
    cfg = Qwen2Config(
        vocab_size=int(os.getenv("VOCAB", "151936")),
        hidden_size=int(os.getenv("H", "1536")),
        intermediate_size=int(os.getenv("IM", "8960")),
        num_hidden_layers=int(os.getenv("NL", "28")), num_attention_heads=12,
        num_key_value_heads=2, max_position_embeddings=8192, rope_theta=1e6,
        dtype=jnp.bfloat16)
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    mesh_data = os.getenv("MESH_DATA")
    mesh = make_mesh(int(mesh_data) if mesh_data else None, 1)
    params = shard_params(params, mesh)
    remat = os.getenv("REMAT", "full")
    remat = False if remat in ("off", "0", "false") else remat
    if os.getenv("OPT", "adamw") == "sgd":
        optimizer = optax.sgd(1e-6)
    else:
        optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-6))

    rng = np.random.default_rng(0)
    B = int(os.getenv("BB", "8"))
    Lp, Lc = int(os.getenv("LP", "3072")), int(os.getenv("LC", "1024"))
    samples = [dict(prompt_ids=rng.integers(2, cfg.vocab_size, Lp).tolist(),
                    completion_ids=rng.integers(2, cfg.vocab_size, Lc).tolist())
               for _ in range(B)]
    packed = losses.pack_samples(samples, pad_id=0, eos_id=1, max_prompt_length=Lp,
                                 pad_multiple=128, batch_multiple=1)
    packed.pop("kept")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    Bb = batch["ids"].shape[0]
    batch["advantages"] = jnp.asarray(rng.normal(size=Bb).astype(np.float32))
    batch["v_target"] = jnp.asarray(rng.uniform(size=Bb).astype(np.float32))

    update = losses.make_update_fn(cfg, optimizer, loss_kwargs=dict(
        temperature=1.0, eps_low=0.2, eps_high=0.2, loss_type="grpo",
        importance_level="token", value_w=1.0, beta=0.0,
        max_completion_length=Lc, remat=remat, attn_impl=impl))
    o = optimizer.init((params, head))
    with mesh:
        # TWO warm calls: the first compiles; the SECOND pays a one-time
        # ~8 s donation/steady-state cost on the axon remote platform
        # (measured: second call 8.1 s of blocking dispatch, all later
        # calls 0 s — see BASELINE.md training section). Timing from call
        # 3 on measures the sustained step.
        p, h, o, m = update(params, head, o, batch, None)
        print("first loss", float(np.asarray(m["loss"])), flush=True)
        p, h, o, m = update(p, h, o, batch, None)
        _ = float(np.asarray(m["loss"]))
    t0 = time.time()
    with mesh:
        for _ in range(3):
            p, h, o, m = update(p, h, o, batch, None)
    loss = float(np.asarray(m["loss"]))
    dt = (time.time() - t0) / 3
    ntok = int(np.asarray(batch["attn"]).sum())
    print(f"{impl} remat={remat} mesh={dict(mesh.shape)}: {dt:.2f}s/step "
          f"({ntok/dt:.0f} tok/s) loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()

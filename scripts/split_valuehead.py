#!/usr/bin/env python
"""Split a trained checkpoint into (policy HF dir) + (value head artifact).

Parity with /root/reference/helpers/split_valuehead.py (base_lm-prefix
auto-detect 126-143, architectures patch 42-59, lm_head tying fallback
347-357): accepts either a lapha_tpu orbax checkpoint + model config dir,
or an HF wrapper dir with base_lm.-prefixed safetensors (the loader strips
the prefix automatically).

Usage:
  python scripts/split_valuehead.py --src <ckpt-or-hf-dir> \
      --config-dir <hf-dir-with-config.json> --out <policy-dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import lapha_tpu

lapha_tpu.apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="orbax checkpoint dir or HF wrapper dir")
    ap.add_argument("--config-dir", default=None,
                    help="HF dir with config/tokenizer (defaults to --src)")
    ap.add_argument("--out", required=True, help="output policy dir")
    ap.add_argument("--value-head-out", default=None,
                    help="value head artifact path (default <out>/value_head.npz)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from lapha_tpu.models import loader

    cfg_dir = args.config_dir or args.src
    head_out = args.value_head_out or os.path.join(args.out, "value_head.npz")

    if os.path.exists(os.path.join(args.src, "config.json")) or \
            any(f.endswith(".safetensors") for f in os.listdir(args.src)):
        # HF(-wrapper) dir: prefix-tolerant loader handles base_lm.*
        params, cfg = loader.load_params(args.src, dtype=jnp.float32)
        loader.export_hf(params, cfg, args.out, src_config_dir=cfg_dir)
        # value head may live in a *.pt next to the weights
        for cand in ("value_head.pt", "value_head.npz"):
            p = os.path.join(args.src, cand)
            if os.path.exists(p):
                head = loader.load_value_head(p, cfg.hidden_size)
                loader.save_value_head(head_out, head)
                break
        print(f"policy -> {args.out}")
        return

    # orbax checkpoint: restore via metadata so the saved device sharding
    # (e.g. a TPU mesh) is not replayed on this host
    import jax
    import orbax.checkpoint as ocp

    cfg = loader.load_config(cfg_dir)
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(args.src)).item_metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            dict(meta.tree) if hasattr(meta, "tree") else meta,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"))
        restored = ckptr.restore(os.path.abspath(args.src), target)
    params, head = restored["params"], restored["head"]
    loader.export_hf(params, cfg, args.out, src_config_dir=cfg_dir)
    loader.save_value_head(head_out, head)
    print(f"policy -> {args.out}; value head -> {head_out}")


if __name__ == "__main__":
    main()

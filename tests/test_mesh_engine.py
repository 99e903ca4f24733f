"""Engine + value function under mesh sharding, and the driver dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import Engine, SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2, value_model
from lapha_tpu.parallel import make_mesh, shard_params


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


def test_engine_generate_with_tp_sharded_params(mesh8):
    """Greedy decode must be identical with TP-sharded params (serving TP)."""
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))

    def mk(p):
        return Engine(p, cfg, ByteTok(), max_model_len=128, max_batch=4,
                      decode_chunk=8, pad_multiple=16, batch_bucket=1,
                      eos_token_ids=[0], prefix_cache_bytes=0)

    sp = SamplingParams(n=2, temperature=0.0, max_tokens=8)
    ref = mk(params).generate(["tensor parallel check"], sp)[0]

    sharded = shard_params(params, mesh8)
    with mesh8:
        got = mk(sharded).generate(["tensor parallel check"], sp)[0]
    assert [o.token_ids for o in got.outputs] == [o.token_ids for o in ref.outputs]


def test_value_fn_sharded_matches(mesh8):
    from lapha_tpu.search.value_fn import ValueFunction

    cfg = Qwen2Config.tiny()
    params = qwen2.init_params(cfg, jax.random.key(0))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(1))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (5, 24))
    attn = np.ones_like(ids)

    vf_plain = ValueFunction(params, head, cfg, max_model_len=64, pad_multiple=8,
                             batch_bucket=4)
    y0, v0 = vf_plain(ids, attn)

    vf_mesh = ValueFunction(shard_params(params, mesh8), head, cfg,
                            max_model_len=64, pad_multiple=8, batch_bucket=4,
                            mesh=mesh8)
    y1, v1 = vf_mesh(ids, attn)
    np.testing.assert_allclose(v1, v0, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(y1, y0, rtol=2e-2, atol=2e-3)


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    logits, v = jax.jit(fn)(*args)
    assert logits.shape[0] == args[2].shape[0]
    assert np.all(np.isfinite(np.asarray(v, np.float32)))

"""Windowed-short decode caches (qwen2.decode_step win_cache + engine
install): sliding-window layers keep a (Wpad + decode-budget)-column panel
instead of full-S — the vLLM per-layer-window-cache capability (SURVEY
§2.4), slot-uniform realization. Parity contract: identical logits/streams
to the full-S path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.models import qwen2


def _mk_win_cache(ckf, cvf, win_idx, lens, slab, Wpad, Sw):
    """Build the short windowed cache from full-S decode-layout caches
    (L, B, nkv, S, dh) the way the engine install does."""
    S = ckf.shape[3]
    woff = lens - Wpad
    idx = jnp.clip(woff[:, None] + jnp.arange(Wpad)[None, :], 0, S - 1)

    def mk(c):
        parts = []
        for li in win_idx:
            tail = jnp.take_along_axis(c[li], idx[:, None, :, None], axis=2)
            dec = c[li][:, :, slab:slab + (Sw - Wpad)]
            parts.append(jnp.concatenate([tail, dec], axis=2)[None])
        return jnp.concatenate(parts, axis=0)

    return {"k": mk(ckf), "v": mk(cvf), "woff": woff,
            "slab": jnp.asarray(slab, jnp.int32)}


@pytest.mark.parametrize("windows", [(8, 0), (8, 8)])
def test_decode_step_win_cache_matches_full(windows):
    """Mixed and uniform windowed stacks: the windowed-short mode produces
    the same logits as the full-S path when the short panels hold the same
    values (incl. a row whose prompt is SHORTER than Wpad)."""
    cfg = qwen2.Qwen2Config.tiny(
        num_hidden_layers=2, layer_windows=windows,
        num_attention_heads=4, num_key_value_heads=2)
    params = qwen2.init_params(cfg, jax.random.key(0))
    B, S, Wpad, slab = 2, 64, 16, 32
    nkv, dh = 2, cfg.head_dim_
    rng = np.random.default_rng(0)
    ckf = jnp.asarray(rng.normal(size=(2, B, nkv, S, dh)).astype(np.float32))
    cvf = jnp.asarray(rng.normal(size=(2, B, nkv, S, dh)).astype(np.float32))
    lens = jnp.asarray([12, 20], jnp.int32)
    dstart = jnp.full((B,), slab, jnp.int32)
    slot = jnp.asarray(35, jnp.int32)
    positions = lens + (slot - slab)
    tok = jnp.asarray([3, 7], jnp.int32)

    ref, _, rk, _ = qwen2.decode_step(params, cfg, tok, positions, ckf, cvf,
                                      slot, lens, dstart, ragged=False)

    win_idx = [l for l, w in enumerate(windows) if w]
    full_idx = [l for l, w in enumerate(windows) if not w]
    Sw = Wpad + (S - slab)
    wc = _mk_win_cache(ckf, cvf, win_idx, lens, slab, Wpad, Sw)
    got = qwen2.decode_step(
        params, cfg, tok, positions, ckf[jnp.asarray(full_idx, jnp.int32)],
        cvf[jnp.asarray(full_idx, jnp.int32)], slot, lens, dstart,
        ragged=False, win_cache=wc, win_pad=Wpad)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # this step's K/V landed at the SHORT column wslot = Wpad + slot - slab
    wcn = got[4]
    assert wcn["k"].shape[3] == Sw
    np.testing.assert_allclose(
        np.asarray(wcn["k"][0, :, :, Wpad + 35 - slab]),
        np.asarray(rk[win_idx[0], :, :, 35]), rtol=1e-6, atol=1e-6)


def test_decode_step_win_cache_int8():
    """Windowed-short composes with the int8 KV cache: quantized short
    panels + scale planes == the full-S int8 path."""
    cfg = qwen2.Qwen2Config.tiny(
        num_hidden_layers=2, layer_windows=(8, 0),
        num_attention_heads=4, num_key_value_heads=2)
    params = qwen2.init_params(cfg, jax.random.key(1))
    B, S, Wpad, slab = 2, 64, 16, 32
    nkv, dh = 2, cfg.head_dim_
    rng = np.random.default_rng(3)
    kf = rng.normal(size=(2, B, nkv, S, dh)).astype(np.float32)
    vf = rng.normal(size=(2, B, nkv, S, dh)).astype(np.float32)

    def q8(a):
        s = np.maximum(np.abs(a).max(-1) / 127.0, 1e-12)
        return np.clip(np.round(a / s[..., None]), -127, 127).astype(np.int8), s

    kq, ks = q8(kf)
    vq, vs = q8(vf)
    lens = jnp.asarray([12, 20], jnp.int32)
    dstart = jnp.full((B,), slab, jnp.int32)
    slot = jnp.asarray(35, jnp.int32)
    positions = lens + (slot - slab)
    tok = jnp.asarray([3, 7], jnp.int32)

    ref = qwen2.decode_step(
        params, cfg, tok, positions, jnp.asarray(kq), jnp.asarray(vq),
        slot, lens, dstart, ragged=False,
        cache_scale=(jnp.asarray(ks.astype(np.float32)),
                     jnp.asarray(vs.astype(np.float32))))[0]

    Sw = Wpad + (S - slab)
    wc = _mk_win_cache(jnp.asarray(kq), jnp.asarray(vq), [0], lens, slab,
                       Wpad, Sw)
    # scale planes sliced the same way ((L,B,nkv,S) -> (1,B,nkv,Sw))
    woff = np.asarray(lens) - Wpad
    idx = np.clip(woff[:, None] + np.arange(Wpad)[None, :], 0, S - 1)
    def mk_s(s):
        tail = np.take_along_axis(s[0], idx[:, None, :], axis=2)
        dec = s[0][:, :, slab:slab + (Sw - Wpad)]
        return jnp.asarray(np.concatenate([tail, dec], axis=2)[None]
                           .astype(np.float32))
    wc.update(ks=mk_s(ks), vs=mk_s(vs))
    got = qwen2.decode_step(
        params, cfg, tok, positions, jnp.asarray(kq[1:2]), jnp.asarray(vq[1:2]),
        slot, lens, dstart, ragged=False,
        cache_scale=(jnp.asarray(ks[1:2].astype(np.float32)),
                     jnp.asarray(vs[1:2].astype(np.float32))),
        win_cache=wc, win_pad=Wpad)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert "ks" in got[5]  # updated short scale planes returned


class _Tok:
    eos_token_id = 1

    def __call__(self, s, add_special_tokens=True):
        return {"input_ids": [2] + [3 + (ord(c) % 60) for c in s]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def _engine(cfg, params, **kw):
    from lapha_tpu.engine.engine import Engine

    return Engine(params, cfg, _Tok(), max_model_len=256, max_batch=4,
                  pad_multiple=16, batch_bucket=2, prefix_cache_bytes=0,
                  seed=11, **kw)


@pytest.mark.parametrize("cfg_kw,kv_quant", [
    (dict(layer_windows=(8, 0, 8)), None),     # gemma3-style mixed stack
    (dict(sliding_window=8), None),            # mistral-style uniform
    (dict(layer_windows=(8, 0, 8)), "int8"),   # composes with int8 KV
])
def test_engine_win_cache_greedy_parity(cfg_kw, kv_quant):
    """End-to-end: Engine.generate with the windowed-short install engaged
    produces the same greedy stream + logprobs as with it disabled."""
    from lapha_tpu.engine.adapter import SamplingParams

    nl = len(cfg_kw.get("layer_windows", (0, 0, 0)))
    cfg = qwen2.Qwen2Config.tiny(num_hidden_layers=nl,
                                 num_attention_heads=4,
                                 num_key_value_heads=2,
                                 max_position_embeddings=256, **cfg_kw)
    params = qwen2.init_params(cfg, jax.random.key(2))
    prompts = ["a prompt long enough that the short install engages " * 2,
               "short one"]
    sp = SamplingParams(temperature=0.0, max_tokens=12, n=1)

    eng = _engine(cfg, params, kv_quant=kv_quant)
    assert eng._win_split is not None
    installs = []
    orig = eng._install_win_jit
    eng._install_win_jit = lambda *a, **k: (installs.append(k), orig(*a, **k))[1]
    outs_win = eng.generate(prompts, sp)
    assert installs, "windowed-short install did not engage"
    assert installs[0]["Sw"] < 256

    eng2 = _engine(cfg, params, kv_quant=kv_quant)
    eng2._win_split = None  # force the full-S path
    outs_full = eng2.generate(prompts, sp)

    for a, b in zip(outs_win, outs_full):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids
        np.testing.assert_allclose(a.outputs[0].cumulative_logprob,
                                   b.outputs[0].cumulative_logprob,
                                   rtol=1e-4, atol=1e-4)


def test_engine_win_cache_skipped_for_short_prompts():
    """No savings (Lp ~ Wpad): the install is skipped, full-S path runs."""
    from lapha_tpu.engine.adapter import SamplingParams

    cfg = qwen2.Qwen2Config.tiny(num_hidden_layers=2, layer_windows=(8, 0),
                                 num_attention_heads=4,
                                 num_key_value_heads=2)
    params = qwen2.init_params(cfg, jax.random.key(3))
    eng = _engine(cfg, params)
    installs = []
    orig = eng._install_win_jit
    eng._install_win_jit = lambda *a, **k: (installs.append(k), orig(*a, **k))[1]
    outs = eng.generate(["hi"], SamplingParams(temperature=0.0, max_tokens=8,
                                               n=1))
    assert not installs
    assert len(outs[0].outputs[0].token_ids) > 0

"""Fused value scoring: engine-pooled h0 vs the standalone value forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lapha_tpu.engine import Engine, SamplingParams
from lapha_tpu.models import Qwen2Config, qwen2, value_model
from lapha_tpu.search.value_fn import ValueFunction


class ByteTok:
    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True, **kw):
        return {"input_ids": [min(b, 255) + 1 for b in text.encode()]}

    def decode(self, ids, **kw):
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(errors="replace")


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen2Config.tiny(vocab_size=300)
    params = qwen2.init_params(cfg, jax.random.key(3))
    head = value_model.init_value_head(cfg.hidden_size, jax.random.key(4))
    eng = Engine(params, cfg, ByteTok(), max_model_len=256, max_batch=8,
                 decode_chunk=8, pad_multiple=16, batch_bucket=1,
                 eos_token_ids=[0], collect_h0=True)
    vf = ValueFunction(params, head, cfg, max_model_len=256, pad_multiple=16,
                       batch_bucket=1)
    return cfg, params, head, eng, vf


def test_pooled_hidden_matches_value_forward(setup):
    """Engine h0 == value-forward h0 on (prompt || emitted completion)."""
    cfg, params, head, eng, vf = setup
    prompt = "a reasonably long prompt for the fused value check here"
    sp = SamplingParams(n=2, temperature=0.7, max_tokens=6, seed=5)
    out = eng.generate([prompt], sp)[0]

    p_ids = out.prompt_token_ids
    for o in out.outputs:
        assert o.pooled_hidden is not None
        full = np.asarray(list(p_ids) + list(o.token_ids))[None, :]
        attn = np.ones_like(full)
        resp = np.zeros_like(full)
        resp[0, len(p_ids):] = 1
        pm = np.zeros_like(full)
        pm[0, :len(p_ids)] = 1
        _y, _v, h0_ref = vf(full, attn, response_mask=resp, prompt_mask=pm,
                            return_h0=True)
        np.testing.assert_allclose(np.asarray(o.pooled_hidden), h0_ref[0],
                                   rtol=3e-3, atol=3e-3)


def test_fused_value_scores_match(setup):
    cfg, params, head, eng, vf = setup
    prompt = "another prompt with plenty of words to pool over nicely"
    sp = SamplingParams(n=2, temperature=0.6, max_tokens=5, seed=9)
    out = eng.generate([prompt], sp)[0]
    root_h0 = np.random.default_rng(0).normal(size=cfg.hidden_size).astype(np.float32) * 0.1

    h0s = np.stack([np.asarray(o.pooled_hidden, np.float32) for o in out.outputs])
    y_f, v_f = vf.from_pooled(h0s, root_h0=root_h0)

    p_ids = out.prompt_token_ids
    for j, o in enumerate(out.outputs):
        full = np.asarray(list(p_ids) + list(o.token_ids))[None, :]
        attn = np.ones_like(full)
        resp = np.zeros_like(full)
        resp[0, len(p_ids):] = 1
        pm = np.zeros_like(full)
        pm[0, :len(p_ids)] = 1
        y_r, v_r = vf(full, attn, response_mask=resp, prompt_mask=pm, root_h0=root_h0)
        np.testing.assert_allclose(v_f[j], v_r[0], rtol=2e-2, atol=1e-2)
        np.testing.assert_allclose(y_f[j], y_r[0], rtol=5e-2, atol=5e-3)


def test_pooled_hidden_with_prefix_reuse(setup):
    """h0 stays correct when the prompt prefix KV+h_sum comes from the store."""
    cfg, params, head, eng, vf = setup
    if eng.prefix_cache is not None:
        eng.prefix_cache.clear()
    parent = "shared parent context string that is long enough to cache here. "
    child = parent + "child suffix"
    sp = SamplingParams(n=1, temperature=0.0, max_tokens=4)
    eng.generate([parent], sp)  # seed store (with h_sum)
    out = eng.generate([child], sp)[0]
    assert eng.prefix_cache.stats()["hits"] >= 1
    o = out.outputs[0]
    full = np.asarray(list(out.prompt_token_ids) + list(o.token_ids))[None, :]
    attn = np.ones_like(full)
    resp = np.zeros_like(full)
    resp[0, len(out.prompt_token_ids):] = 1
    pm = np.zeros_like(full)
    pm[0, :len(out.prompt_token_ids)] = 1
    _y, _v, h0_ref = vf(full, attn, response_mask=resp, prompt_mask=pm, return_h0=True)
    np.testing.assert_allclose(np.asarray(o.pooled_hidden), h0_ref[0],
                               rtol=3e-3, atol=3e-3)


def test_mcts_uses_fused_path(setup):
    """MCTS with a collect_h0 engine never calls the full value forward for
    children (only the root eval)."""
    cfg, params, head, eng, vf = setup
    if eng.prefix_cache is not None:
        eng.prefix_cache.clear()

    from lapha_tpu.engine import SamplingParams as SP
    from lapha_tpu.search import LatentBank, MCTSAgent

    class A(MCTSAgent):
        TOOLS = {}
        TOOLS_DESCRIPTION = ""
        SYSTEM_TEMPLATE = "Limit {step_limit}."
        USER_TEMPLATE = "{support_material_str}Q: {question}"

    class Tok(ByteTok):
        def apply_chat_template(self, conversation, tools=None, tokenize=False,
                                add_generation_prompt=True, **kw):
            return "\n".join(f"<{m['role']}> {m.get('content','')}" for m in conversation) + "\n<assistant>\n"

    eng2 = Engine(params, cfg, Tok(), max_model_len=256, max_batch=8,
                  decode_chunk=8, pad_multiple=16, batch_bucket=1,
                  eos_token_ids=[0], collect_h0=True)
    agent = A(tokenizer=Tok(), depth=2, breadth=2, output_dir="/tmp/fused-test",
              llm=eng2, max_model_len=256, sampling_params=SP(max_tokens=5, temperature=0.8),
              value_fn=vf, reward_fns=[], num_sim=2, num_pos_sim=99,
              hid_bank=LatentBank())
    calls_before = vf.calls
    chains = agent.search("what?", ground_truth="4")
    # root eval is the only full forward; children go through from_pooled
    assert vf.calls == calls_before + 1
    assert chains and len(agent._all_nodes) >= 2
    for n in agent._all_nodes:
        assert n.v_pred is not None

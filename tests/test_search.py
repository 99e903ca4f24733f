"""Hermetic MCTS/search tests: FakeEngine + deterministic value fn."""

import random
import re

import numpy as np
import pytest

from lapha_tpu.engine import FakeEngine, SamplingParams
from lapha_tpu.search import (
    LatentBank,
    MCTSAgent,
    Node,
    average_linkage_labels,
    cluster_and_select_disabled,
    make_fake_value_fn,
    parse_tool_calls,
    pick_best_leaf,
)


class ChatTok:
    """Invertible whitespace tokenizer with a chat template."""

    eos_token_id = 1
    pad_token_id = 0

    def __init__(self):
        self.vocab = {"<eos>": 1, "<pad>": 0}
        self.words = {1: "<eos>", 0: "<pad>"}

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab)
            self.vocab[w] = i
            self.words[i] = w
        return self.vocab[w]

    def __call__(self, text, add_special_tokens=True, **kw):
        # newline-preserving word split so fenced code survives the roundtrip
        toks = re.findall(r"\n|\S+", text)
        return {"input_ids": [self._id(w) for w in toks]}

    def decode(self, ids, skip_special_tokens=True, **kw):
        words = [self.words.get(int(i), "?") for i in ids
                 if not (skip_special_tokens and int(i) in (0, 1))]
        out = []
        for w in words:
            if w == "\n":
                out.append("\n")
            else:
                if out and out[-1] != "\n":
                    out.append(" ")
                out.append(w)
        return "".join(out)

    def apply_chat_template(self, conversation, tools=None, tokenize=False,
                            add_generation_prompt=True, **kw):
        parts = []
        for m in conversation:
            parts.append(f"<|{m['role']}|> {m.get('content','')}")
        if add_generation_prompt:
            parts.append("<|assistant|>")
        return "\n".join(parts) + "\n"


class PoorAgent(MCTSAgent):
    TOOLS = {}
    TOOLS_DESCRIPTION = ""
    SYSTEM_TEMPLATE = "Solve step by step. Limit {step_limit} steps."
    USER_TEMPLATE = "{support_material_str}\nQ: {question}"


def _tool(context, code=""):
    out = f"ran:{code.strip()}"
    return out, {"last_code": code.strip()}


class ToolAgent(MCTSAgent):
    TOOLS = {"execute_python_code": _tool}
    TOOLS_DESCRIPTION = [{"type": "function", "function": {"name": "execute_python_code"}}]
    SYSTEM_TEMPLATE = "Use tools. Limit {step_limit}."
    USER_TEMPLATE = "{support_material_str}\nQ: {question}"


def make_agent(cls, script, *, depth=3, breadth=2, num_sim=6, num_pos_sim=99,
               prune_per=100, value_trust=0.5, reward=None, tmpdir="/tmp/mcts-test"):
    tok = ChatTok()
    eng = FakeEngine(tok, script=script)
    vf = make_fake_value_fn(hidden_size=8)
    reward_fns = [reward] if reward else [lambda c, gt: 1.0 if f"<answer>{gt}</answer>" in c else 0.0]
    return cls(
        tokenizer=tok, depth=depth, breadth=breadth, output_dir=tmpdir,
        llm=eng, max_model_len=512, sampling_params=SamplingParams(max_tokens=64),
        value_fn=vf, reward_fns=reward_fns,
        c_puct=1.0, v_prior=0.0, value_trust=value_trust,
        num_sim=num_sim, prune_per=prune_per, num_pos_sim=num_pos_sim,
        hid_bank=LatentBank(), rng=random.Random(0),
    ), eng


# ---------------------------------------------------------------- tool parsing

def test_parse_tool_call_json():
    msg = parse_tool_calls('before <tool_call>{"name": "f", "arguments": {"x": 1}}</tool_call> after')
    assert msg["tool_calls"][0]["function"] == {"name": "f", "arguments": {"x": 1}}
    assert "before" in msg["content"] and "after" in msg["content"]


def test_parse_python_fence():
    msg = parse_tool_calls("think\n```python\nprint(1+1)\n``` done")
    f = msg["tool_calls"][0]["function"]
    assert f["name"] == "execute_python_code"
    assert "print(1+1)" in f["arguments"]["code"]


def test_parse_string_arguments_decoded():
    msg = parse_tool_calls('<tool_call>{"name": "f", "arguments": "{\\"y\\": 2}"}</tool_call>')
    assert msg["tool_calls"][0]["function"]["arguments"] == {"y": 2}


def test_parse_no_tools_strips_im_end():
    msg = parse_tool_calls("plain answer<|im_end|>")
    assert "tool_calls" not in msg
    assert msg["content"] == "plain answer"


def test_parse_malformed_raises():
    with pytest.raises(Exception):
        parse_tool_calls("<tool_call>not json {{{</tool_call>")


# ---------------------------------------------------------------- latent bank

def test_latent_bank_roundtrip():
    b = LatentBank()
    i0 = b.add(np.zeros(4, np.float32))
    idx = b.add(np.ones((2, 4), np.float32) * 0.5)
    assert i0 == 0 and idx == [1, 2]
    rows = np.asarray(b.index_select([0, 2]))
    np.testing.assert_allclose(rows, [[0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]])
    assert b.stats()["rows"] == 3
    with pytest.raises(IndexError):
        b.index_select([5])
    b.clear()
    assert len(b) == 0


def test_latent_bank_grows_past_capacity():
    b = LatentBank(capacity=2)
    for i in range(5):
        b.add(np.full(3, i, np.float32))
    np.testing.assert_allclose(np.asarray(b.index_select([4])), [[4, 4, 4]])


# ---------------------------------------------------------------- clustering

def _blob(center, n, spread=0.01, seed=0):
    r = np.random.default_rng(seed)
    return np.clip(center + r.normal(scale=spread, size=(n, len(center))), -0.95, 0.95)


def test_two_blobs_two_clusters():
    pts = np.concatenate([_blob([0.5, 0.0], 6, seed=1), _blob([-0.5, 0.0], 6, seed=2)]).astype(np.float32)
    labels, centers, disabled = cluster_and_select_disabled(pts, random.Random(0))
    assert len(set(labels[:6])) == 1 and len(set(labels[6:])) == 1
    assert labels[0] != labels[6]
    # n//3 = 2 disabled per cluster of 6
    for lab in np.unique(labels):
        assert disabled[labels == lab].sum() == 2
    for c in centers.values():
        assert np.linalg.norm(c) < 1.0


def test_cluster_single_point():
    labels, centers, disabled = cluster_and_select_disabled(np.asarray([[0.1, 0.1]], np.float32))
    assert labels.tolist() == [0] and not disabled[0]


def test_average_linkage_all_identical():
    D = np.zeros((4, 4), np.float32)
    labels = average_linkage_labels(D)
    assert len(set(labels.tolist())) >= 1  # no crash; merges happen at distance 0


# ---------------------------------------------------------------- MCTS search

def test_search_basic_tree_and_terminals():
    agent, eng = make_agent(PoorAgent, script=[
        (r"STEP-2", ["deep think </think> <answer>4</answer>", "other deep </think> <answer>5</answer>"]),
        (r".", ["step one thought </think> continue", "alt step one </think> hmm"]),
    ], depth=3, breadth=2, num_sim=4)
    chains = agent.search("what is 2+2?", ground_truth="4")
    assert chains, "no chains"
    leaves = [ch[-1] for ch in chains if ch]
    terms = [l for l in leaves if l.get("_terminal")]
    assert terms, "no terminal leaves found"
    answered = [l for l in terms if "<answer>" in l["completion"]]
    assert answered
    # every step has search stats patched
    for ch in chains:
        for st in ch:
            assert "_N" in st and "_Q" in st and "_P" in st
    # engine called with n=breadth
    assert all(c["n"] == 2 for c in eng.calls)
    # bank row per node + root
    assert len(agent.hid_bank) == 1 + len(agent._all_nodes)


def test_search_priors_softmax_ordering():
    agent, _ = make_agent(PoorAgent, script=[
        (r".", ["first </think> go", "second </think> go"]),
    ], num_sim=1)
    agent.search("q", ground_truth="4")
    kids = [n for n in agent._all_nodes if n.depth == 1]
    assert len(kids) == 2
    # FakeEngine gives higher cumulative logprob to sample 0
    assert kids[0].P > kids[1].P
    assert abs(kids[0].P + kids[1].P - 1.0) < 1e-6


def test_search_early_stop_on_positive():
    agent, eng = make_agent(PoorAgent, script=[
        (r".", ["done </think> <answer>4</answer>", "also done </think> <answer>4</answer>"]),
    ], num_sim=50, num_pos_sim=1)
    agent.search("q", ground_truth="4")
    # stopped after the first round found positives
    assert len(eng.calls) == 1
    assert agent.pos_counter >= 1


def test_search_terminal_state_value_is_true_reward():
    agent, _ = make_agent(PoorAgent, script=[
        (r".", ["yes </think> <answer>4</answer>", "no </think> <answer>7</answer>"]),
    ], num_sim=1)
    agent.search("q", ground_truth="4")
    kids = [n for n in agent._all_nodes if n.is_terminal]
    vals = sorted(k.state_value for k in kids)
    assert vals == [0.0, 1.0]
    # terminal children were backed up
    assert all(k.N == 1 for k in kids)


def test_search_depth_cap_terminates():
    agent, _ = make_agent(PoorAgent, script=[
        (r".", ["keep going </think> more", "still going </think> more"]),
    ], depth=2, num_sim=8)
    chains = agent.search("q", ground_truth="4")
    deepest = max(st["current_depth"] for ch in chains for st in ch)
    assert deepest <= 2
    term = [n for n in agent._all_nodes if n.is_terminal]
    assert term and all(n.depth == 2 for n in term)


def test_search_tool_execution_updates_messages():
    agent, _ = make_agent(ToolAgent, script=[
        (r".", ["compute </think>\n```python\nx=1\n```", "compute2 </think>\n```python\ny=2\n```"]),
    ], num_sim=1)
    agent.search("q", ground_truth="4")
    kids = [n for n in agent._all_nodes if n.depth == 1]
    assert kids
    for k in kids:
        roles = [m["role"] for m in k.messages]
        assert roles[-1] == "tool"
        assert k.messages[-1]["content"].startswith("ran:")
        assert "last_code" in k.context


def test_search_unknown_tool_reports_error():
    agent, _ = make_agent(ToolAgent, script=[
        (r".", ['use </think> <tool_call>{"name": "nope", "arguments": {}}</tool_call>',
                "plain </think> text"]),
    ], num_sim=1)
    agent.search("q", ground_truth="4")
    kids = [n for n in agent._all_nodes if n.depth == 1]
    errs = [m for k in kids for m in k.messages if "no such a tool" in str(m.get("content", ""))]
    assert errs


def test_search_prune_rebuilds_frontier():
    agent, eng = make_agent(PoorAgent, script=[
        (r".", ["branch a </think> go", "branch b </think> go"]),
    ], depth=4, num_sim=6, prune_per=2)
    agent.search("q", ground_truth="4")
    labeled = [n for n in agent._all_nodes if n.cluster_id is not None]
    assert labeled, "pruning never ran"


# ---------------------------------------------------------------- best leaf

def _leaf(ans, q=0.5, n=1, v=0.5, lp=-1.0, clen=5, hid=None):
    comp = f"STEP-1:\n<think>\nx </think> <answer>{ans}</answer>" if ans else "STEP-1:\n<think>\nno answer"
    return {
        "completion": comp, "completion_ids": list(range(clen)), "v_pred": v,
        "_Q": q, "_N": n, "cum_logprob": lp, "hid": hid or [0.01, 0.01],
    }


def test_pick_best_leaf_majority_answer_wins():
    chains = [
        [_leaf("42", q=0.6)], [_leaf("42", q=0.55)], [_leaf("42", q=0.5)],
        [_leaf("7", q=0.55)],
    ]
    best = pick_best_leaf(chains)
    assert "<answer>42</answer>" in best["completion"]


def test_pick_best_leaf_single_strong_outlier_can_win():
    # soft evidence is not a raw majority vote: one much-stronger leaf beats
    # three weak ones (logsumexp at tau_group=0.8)
    chains = [
        [_leaf("42", q=0.5)], [_leaf("42", q=0.5)], [_leaf("42", q=0.5)],
        [_leaf("7", q=0.95, n=8)],
    ]
    best = pick_best_leaf(chains)
    assert "<answer>7</answer>" in best["completion"]


def test_pick_best_leaf_prefers_answered():
    chains = [[_leaf(None, q=0.9)], [_leaf("5", q=0.1)]]
    best = pick_best_leaf(chains)
    assert "<answer>5</answer>" in best["completion"]


def test_pick_best_leaf_skips_disabled():
    a = _leaf("1", q=0.9)
    a["_disabled"] = True
    chains = [[a], [_leaf("2", q=0.1)]]
    best = pick_best_leaf(chains)
    assert "<answer>2</answer>" in best["completion"]


def test_pick_best_leaf_empty():
    assert pick_best_leaf([]) is None
    assert pick_best_leaf([[]]) is None


def test_pick_top_leaves_first_matches_best_and_diverse():
    from lapha_tpu.search import pick_top_leaves

    chains = [
        [_leaf("42", q=0.6)], [_leaf("42", q=0.55)], [_leaf("42", q=0.5)],
        [_leaf("7", q=0.55)],
    ]
    best = pick_best_leaf(chains)
    top = pick_top_leaves(chains, 3)
    assert top[0] is best
    # second pick comes from a different answer group (diversity-first)
    assert "<answer>7</answer>" in top[1]["completion"]
    assert len(top) == 3


def test_pick_top_leaves_k_exceeds_leaves():
    from lapha_tpu.search import pick_top_leaves

    chains = [[_leaf("1")], [_leaf("2")]]
    top = pick_top_leaves(chains, 16)
    assert len(top) == 2
    assert pick_top_leaves([], 4) == []


def test_cot_hostage_wait_prefill():
    """CoT-injected children are hostaged; their NEXT expansion prefills
    'wait' (reference agent.py:816-830 consumes the flag, 929-941 sets it)."""
    tok = ChatTok()
    eng = FakeEngine(tok, default=lambda prompt, n: [f"<think>step {len(prompt)}</think> go"] * n)
    vf = make_fake_value_fn(hidden_size=8)
    agent = PoorAgent(
        tokenizer=tok, depth=10, breadth=1, output_dir="/tmp/mcts-test",
        llm=eng, max_model_len=4096, sampling_params=SamplingParams(max_tokens=64),
        value_fn=vf, reward_fns=[lambda c, gt: 0.0],
        c_puct=1.0, v_prior=0.0, value_trust=0.5,
        num_sim=6, prune_per=100, max_expands=1, num_pos_sim=99,
        hid_bank=LatentBank(), rng=random.Random(0),
    )
    chains = agent.search(question="hard one", ground_truth="42",
                          cot="<think>alpha beta gamma delta</think><answer>42</answer>")

    prompts = [c["prompts"][0] for c in eng.calls]
    # total_rounds=6, half_round=3: round 3 injects the CoT prefix...
    cot_round = next(i for i, p in enumerate(prompts) if p.endswith("<think>\nalpha beta"))
    # ...the child born there is hostaged...
    hostaged_steps = [st for ch in chains for st in ch if st.get("hostaged")]
    assert hostaged_steps, "CoT-injected child was not hostaged"
    # ...and its next expansion prefills "wait"
    assert prompts[cot_round + 1].endswith("<think>\nwait"), prompts[cot_round + 1]


def test_answer_hostage_strips_answer_when_nonterminal():
    """Reference agent.py:929-941: an <answer> that does not terminate is
    held hostage — answer stripped, node marked hostaged. (Dormant in the
    normal flow since <answer> always terminates; drive the spec directly.)"""
    agent, eng = make_agent(PoorAgent, [])
    root_msgs = [{"role": "system", "content": "s"}, {"role": "user", "content": "q"}]
    parent = Node(None, 1.0, {"current_depth": 0, "hostaged": False}, root_msgs, {}, 0)

    class Out:
        token_ids = agent.tokenizer("<think>x</think> <answer>5</answer>",
                                    add_special_tokens=False)["input_ids"]
        cumulative_logprob = -1.0

    # monkeypatch the answer-terminal rule off, as the reference comment
    # describes ("unreachable if you always terminate on <answer>")
    import lapha_tpu.search.mcts as mcts_mod
    orig = mcts_mod._ANSWER_RE
    try:
        class NeverFirst:
            @staticmethod
            def search(s):
                NeverFirst.n = getattr(NeverFirst, "n", 0) + 1
                return None if NeverFirst.n == 1 else orig.search(s)
        mcts_mod._ANSWER_RE = NeverFirst
        step, msgs, ctx, terminal = agent._build_child_spec(
            parent, Out(), "PROMPT", [1, 2, 3], "STEP-1:\n<think>\n", "", "42")
    finally:
        mcts_mod._ANSWER_RE = orig
    assert step["hostaged"] is True
    assert "<answer>" not in step["completion"]
    assert not terminal

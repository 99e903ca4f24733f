"""Differential parity vs the IMPORTED reference modules.

Accuracy-parity scaffolding (the pattern test_rewards.py proves): when real
checkpoints arrive, any pass@1 gap must be attributable to the engine, not
to the selection math or the reward shaping. These tests run the actual
reference implementations —

- trainer/agent.py pick_best_leaf (imports standalone),
- trainer/mtpo_trainer.py compute_action_rewards + hyperbolic geometry
  (imported with GPU-only deps stubbed: deepspeed/trl/plotly),

— on shared randomized fixtures and require behavioral agreement with ours.
"""

import copy
import importlib.machinery
import sys
import types
from collections import defaultdict
from types import SimpleNamespace

import numpy as np
import pytest

REF_PATH = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref_agent():
    sys.path.insert(0, REF_PATH)
    try:
        from trainer import agent
        yield agent
    finally:
        sys.path.remove(REF_PATH)


@pytest.fixture(scope="module")
def ref_trainer():
    ds = _stub("deepspeed")
    ds.zero = _stub("deepspeed.zero", GatheredParameters=object)
    _stub("trl")
    _stub("trl.import_utils", is_vllm_available=lambda: False)
    _stub("trl.models", prepare_deepspeed=lambda *a, **k: None)
    try:
        import plotly.graph_objects  # noqa: F401
    except ImportError:
        p = _stub("plotly")
        p.graph_objects = _stub("plotly.graph_objects", Figure=object, Scatter=object)
    sys.path.insert(0, REF_PATH)
    try:
        from trainer import mtpo_trainer
        yield mtpo_trainer
    finally:
        sys.path.remove(REF_PATH)


# ------------------------------------------------------------- fixtures

def _random_tree(rng, breadth=2, depth=3, p_answer=0.5, hid_dim=4):
    """Random chains in both implementations' step-dict schema. Returns
    (root_step, chains, hid_points) — hid points indexed by hid_idx."""
    pts = [np.zeros(hid_dim, np.float32)]
    root = {
        "completion": "", "completion_ids": [], "prompt_ids": [1, 2, 3],
        "current_depth": 0, "hid_idx": 0, "hid": pts[0].tolist(),
        "v_pred": float(rng.uniform(0, 1)), "state_value": None,
        "ground_truth": "4", "hostaged": False,
    }
    chains = []

    def grow(parent, d, chain):
        if d > depth:
            chains.append(chain)
            return
        for b in range(breadth):
            ans = rng.uniform() < p_answer or d == depth
            correct = ans and rng.uniform() < 0.5
            body = f"step d{d} b{b} " + ("x" * int(rng.integers(1, 20)))
            comp = f"STEP-{d}:\n<think>\n{body}</think>"
            if ans:
                comp += f" <answer>{'4' if correct else '7'}</answer>"
            pt = (rng.normal(size=hid_dim) * 0.25).astype(np.float32)
            pt = pt / max(1.0, np.linalg.norm(pt) / 0.8)
            pts.append(pt)
            st = {
                "completion": comp,
                "completion_ids": list(rng.integers(2, 100, int(rng.integers(2, 30)))),
                "prompt_ids": [1, 2, 3],
                "current_depth": d,
                "hid_idx": len(pts) - 1,
                "hid": pt.tolist(),
                "v_pred": float(rng.uniform(0, 1)),
                "state_value": float(rng.uniform(0, 1)),
                "_Q": float(rng.uniform(0, 1)),
                "_N": int(rng.integers(0, 8)),
                "cum_logprob": float(-rng.uniform(0.1, 5.0)),
                "ground_truth": "4",
                "hostaged": False,
            }
            if ans:
                chains.append(chain + [st])
            else:
                grow(st, d + 1, chain + [st])

    grow(root, 1, [])
    return root, chains, np.stack(pts)


# ------------------------------------------------------------- pick_best_leaf

def test_pick_best_leaf_differential(ref_agent):
    from lapha_tpu.search import pick_best_leaf as ours

    rng = np.random.default_rng(11)
    mismatches = []
    for trial in range(30):
        _, chains, _ = _random_tree(rng, breadth=int(rng.integers(2, 4)),
                                    depth=int(rng.integers(2, 4)))
        ref_leaf = ref_agent.pick_best_leaf(copy.deepcopy(chains), prefer_answer=True)
        our_leaf = ours(copy.deepcopy(chains), prefer_answer=True)
        if (ref_leaf is None) != (our_leaf is None):
            mismatches.append(trial)
        elif ref_leaf is not None and ref_leaf["completion"] != our_leaf["completion"]:
            mismatches.append(trial)
    assert not mismatches, f"selection diverged on trials {mismatches}"


# ------------------------------------------------------------- geometry

def test_geometry_differential(ref_trainer):
    import torch

    from lapha_tpu.ops import hyperbolic as ours

    rng = np.random.default_rng(5)
    x = (rng.normal(size=(16, 8)) * 0.4).astype(np.float32)
    y = (rng.normal(size=(12, 8)) * 0.3).astype(np.float32)

    ex_ref = ref_trainer.expmap0(torch.tensor(x), c=1.0).numpy()
    ex_our = np.asarray(ours.expmap0(x, c=1.0))
    np.testing.assert_allclose(ex_our, ex_ref, rtol=1e-5, atol=1e-6)

    lg_ref = ref_trainer.logmap0(torch.tensor(ex_ref), c=1.0).numpy()
    lg_our = np.asarray(ours.logmap0(ex_our, c=1.0))
    np.testing.assert_allclose(lg_our, lg_ref, rtol=1e-4, atol=1e-5)

    yb_ref = ref_trainer.expmap0(torch.tensor(y), c=1.0).numpy()
    d_ref = ref_trainer.poincare_dist_matrix_stable(
        torch.tensor(ex_ref), torch.tensor(yb_ref), c=1.0).numpy()
    d_our = np.asarray(ours.poincare_dist_matrix(ex_our, np.asarray(yb_ref), c=1.0))
    np.testing.assert_allclose(d_our, d_ref, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- reward shaping

class _NoopWriter:
    def add_scalar(self, *a, **k):
        pass


def _duck_trainer(ref_trainer, bank, depth, out_dir):
    import torch

    model = torch.nn.Linear(2, 2)
    model.c = 1.0
    model.value_activation = "sigmoid"
    return SimpleNamespace(
        model=model,
        _hid_bank=bank,
        _metrics=defaultdict(list),
        args=SimpleNamespace(output_dir=str(out_dir)),
        depth=depth,
        state=SimpleNamespace(global_step=0),
        tokenizer=SimpleNamespace(pad_token_id=0, eos_token_id=None),
        processing_class=None,
        value_fn=None,
        writer=_NoopWriter(),
    )


def test_compute_action_rewards_differential(ref_trainer, tmp_path):
    """Same random trees + same latent points through BOTH shaping
    implementations: v_target (the V-map), rewards, leaf/correct/on_path
    flags, avgAcc and pass@1 must agree."""
    import torch

    from lapha_tpu.search import LatentBank
    from lapha_tpu.train.shaping import ShapingConfig, compute_action_rewards as ours

    rng = np.random.default_rng(23)
    reward_fns = [lambda comp, gt: 1.0 if f"<answer>{gt}</answer>" in comp else 0.0]
    depth = 3

    for trial in range(6):
        root, chains, pts = _random_tree(rng, breadth=2, depth=depth)

        sys.path.insert(0, REF_PATH)
        from trainer.latent_bank import LatentBank as RefBank
        sys.path.remove(REF_PATH)
        # the reference stores latents in bf16 (mtpo_trainer.py:1555-1560);
        # pre-round the shared points so both banks hold identical values
        # and the comparison tolerance can stay tight
        pts = torch.tensor(pts).to(torch.bfloat16).float().numpy()
        ref_bank = RefBank(device="cpu", dtype=torch.bfloat16,
                           store_cpu_copy=True, normalize=False)
        for p in pts:
            ref_bank.add(torch.tensor(p)[None, :])

        our_bank = LatentBank()
        for p in pts:
            our_bank.add(p)

        ref_chains = copy.deepcopy(chains)
        ref_root = copy.deepcopy(root)
        duck = _duck_trainer(ref_trainer, ref_bank, depth, tmp_path)
        ref_acc, ref_p1, _ = ref_trainer.MTPOTrainer.compute_action_rewards(
            duck, ref_chains, reward_fns, "4", tree_id=trial, root_step=ref_root)

        our_chains = copy.deepcopy(chains)
        our_root = copy.deepcopy(root)
        cfg = ShapingConfig(depth=depth)
        our_acc, our_p1, _ = ours(our_chains, reward_fns, "4", cfg,
                                  bank=our_bank, root_step=our_root)

        assert our_acc == pytest.approx(ref_acc), f"avgAcc trial {trial}"
        assert our_p1 == pytest.approx(ref_p1), f"pass@1 trial {trial}"
        for ci, (rc, oc) in enumerate(zip(ref_chains, our_chains)):
            for si, (rs, os_) in enumerate(zip(rc, oc)):
                loc = f"trial {trial} chain {ci} step {si}"
                assert bool(rs.get("is_leaf")) == bool(os_.get("is_leaf")), loc
                assert bool(rs.get("is_correct")) == bool(os_.get("is_correct")), loc
                assert bool(rs.get("on_path")) == bool(os_.get("on_path")), loc
                assert os_.get("v_target", 0.0) == pytest.approx(
                    rs.get("v_target", 0.0), rel=1e-4, abs=1e-5), loc + " v_target"
                assert os_.get("reward", 0.0) == pytest.approx(
                    rs.get("reward", 0.0), rel=1e-4, abs=1e-5), loc + " reward"


# ------------------------------------------------------------- MCTS search

def test_mcts_search_differential(ref_agent, tmp_path):
    """Run the reference's ACTUAL MCTSAgent.search and ours on the same
    scripted engine + deterministic value fn: the produced chains (tree
    structure, priors, terminal flags, state values, visit stats) must
    agree."""
    import torch

    from lapha_tpu.engine import FakeEngine, SamplingParams
    from lapha_tpu.search import LatentBank, MCTSAgent
    from lapha_tpu.search.value_fn import make_fake_value_fn

    sys.path.insert(0, REF_PATH)
    from trainer.latent_bank import LatentBank as RefBank
    sys.path.remove(REF_PATH)

    class ChatTok:
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

        def __call__(self, text, add_special_tokens=True, return_tensors=None, **kw):
            import re as _re

            toks = _re.findall(r"\n|\S+", text)
            ids = [self._id(w) for w in toks]
            if return_tensors == "pt":
                return {"input_ids": torch.tensor([ids], dtype=torch.long)}
            return {"input_ids": ids}

        def decode(self, ids, skip_special_tokens=True, **kw):
            ids = [int(i) for i in ids]
            words = [self.words.get(i, "?") for i in ids
                     if not (skip_special_tokens and i in (0, 1))]
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
            parts = [f"<|{m['role']}|> {m.get('content','')}" for m in conversation]
            if add_generation_prompt:
                parts.append("<|assistant|>")
            return "\n".join(parts) + "\n"

    script = [
        (r"STEP-3", ["finishing </think> <answer>4</answer>",
                     "wrong end </think> <answer>7</answer>"]),
        (r"STEP-2", ["deeper reasoning </think> still going",
                     "shortcut </think> <answer>4</answer>"]),
        (r".", ["first step thinking </think> onwards",
                "alternate opening </think> moving"]),
    ]

    np_vf = make_fake_value_fn(hidden_size=8, seed=3)

    def torch_vf(input_ids, attention_mask, response_mask=None, prompt_mask=None,
                 root_h0=None, return_h0=False):
        rh = None if root_h0 is None else np.asarray(root_h0, np.float32)
        out = np_vf(np.asarray(input_ids), np.asarray(attention_mask),
                    root_h0=rh, return_h0=return_h0)
        return tuple(torch.tensor(np.asarray(o)) for o in out)

    class OurAgent(MCTSAgent):
        TOOLS = {}
        TOOLS_DESCRIPTION = ""
        SYSTEM_TEMPLATE = "Solve in at most {step_limit} steps."
        USER_TEMPLATE = "{support_material_str}\nQ: {question}"

    class RefAgentSub(ref_agent.MCTSAgent):
        TOOLS = {}
        TOOLS_DESCRIPTION = None
        SYSTEM_TEMPLATE = "Solve in at most {step_limit} steps."
        USER_TEMPLATE = "{support_material_str}\nQ: {question}"

    kw = dict(depth=3, breadth=2, output_dir=str(tmp_path),
              max_model_len=2048, c_puct=1.0, v_prior=0.0, value_trust=1.0,
              num_sim=6, prune_per=100, max_expands=2, num_pos_sim=99,
              passk_threshold=1.0)
    reward = [lambda c, gt: 1.0 if f"<answer>{gt}</answer>" in c else 0.0]

    # each agent gets its own tok shared with its engine (the incremental
    # vocab assignment must see the same text order on both sides)
    tok_a = ChatTok()
    ours = OurAgent(tokenizer=tok_a, llm=FakeEngine(tok_a, script=script),
                    sampling_params=SamplingParams(max_tokens=64),
                    value_fn=np_vf, reward_fns=reward, hid_bank=LatentBank(),
                    leaves_per_sim=1, **kw)
    our_chains = ours.search(question="what is 2+2?", ground_truth="4")

    tok_b = ChatTok()
    ref = RefAgentSub(tokenizer=tok_b, llm=FakeEngine(tok_b, script=script),
                      sampling_params=SamplingParams(max_tokens=64),
                      value_fn=torch_vf, reward_fns=reward, **kw)
    ref.hid_bank = RefBank(device="cpu", dtype=torch.float32,
                           store_cpu_copy=True, normalize=False)
    ref_chains = ref.search(question="what is 2+2?", ground_truth="4")

    def summary(chains):
        out = []
        for ch in chains:
            out.append(tuple(
                (st["completion"], int(st["current_depth"]),
                 round(float(st.get("p_prior", -1)), 5),
                 round(float(st.get("v_pred", -1)), 5),
                 round(float(st.get("state_value", -1)), 5),
                 int(st.get("_N", -1)), round(float(st.get("_Q", -1)), 5))
                for st in ch))
        return sorted(out)

    assert summary(our_chains) == summary(ref_chains)


def test_cot_anchor_differential(ref_trainer, tmp_path):
    """CoT -> d_goal anchor parity: the reference tokenizes the dataset's
    `cot`, appends EOS, left-truncates prompt||cot to max_model_len and
    embeds it via value_fn as an extra "correct leaf" anchor for d_goal
    (mtpo_trainer.py:2506-2518, 2788-2811). Our trainer does the embedding
    in MTPOTrainer._embed_cot_anchor and hands shaping the ball point.
    Both sides share a fake tokenizer + a deterministic fake value_fn keyed
    on the exact (ids, masks, root_h0) it receives — so any divergence in
    tokenization, EOS handling, truncation, masks OR anchor math fails."""
    import torch

    from lapha_tpu.search import LatentBank
    from lapha_tpu.train.shaping import ShapingConfig, compute_action_rewards as ours
    from lapha_tpu.train.trainer import MTPOTrainer as OurTrainer

    HID, MAXLEN, EOS = 4, 32, 99

    class FakeTok:
        pad_token_id = 0
        eos_token_id = EOS

        def __call__(self, text, return_tensors=None, add_special_tokens=True):
            assert not add_special_tokens
            ids = [101 + (ord(c) % 23) for c in text]
            if return_tensors == "pt":
                return {"input_ids": torch.tensor([ids], dtype=torch.long)}
            return {"input_ids": ids}

    def _point(ids, resp, pm, root_h0):
        ids, resp, pm = (np.asarray(a).reshape(-1) for a in (ids, resp, pm))
        seed = int((np.sum(ids * (1 + resp) * (2 + pm))
                    + round(float(np.sum(root_h0)) * 997)) % (2**31))
        pt = np.random.default_rng(seed).normal(size=HID).astype(np.float32) * 0.2
        # bf16-representable so the reference's cast to the bank dtype is lossless
        return torch.tensor(pt).to(torch.bfloat16).float().numpy()

    calls = {"ref": [], "ours": []}

    def ref_value_fn(input_ids, attention_mask, response_mask, prompt_mask,
                     root_h0, return_h0):
        calls["ref"].append(np.asarray(input_ids).tolist())
        y = _point(input_ids.numpy(), response_mask.numpy(),
                   prompt_mask.numpy(), root_h0.numpy())
        return torch.tensor(y)[None, :], torch.zeros(1)

    def our_value_fn(input_ids, attention_mask, response_mask, prompt_mask,
                     root_h0, return_h0):
        calls["ours"].append(np.asarray(input_ids).tolist())
        y = _point(input_ids, response_mask, prompt_mask, root_h0)
        return y[None, :], np.zeros(1)

    rng = np.random.default_rng(31)
    reward_fns = [lambda comp, gt: 1.0 if f"<answer>{gt}</answer>" in comp else 0.0]
    depth = 3
    cot = "solve: add the numbers, x = 4"  # tokenizes to > MAXLEN-3? no: 30 ids + eos + 3 prompt > 32 -> truncates

    for trial in range(4):
        root, chains, pts = _random_tree(rng, breadth=2, depth=depth, hid_dim=HID)
        root["root_h0"] = (rng.normal(size=8) * 0.1).astype(np.float32).tolist()

        sys.path.insert(0, REF_PATH)
        from trainer.latent_bank import LatentBank as RefBank
        sys.path.remove(REF_PATH)
        pts = torch.tensor(pts).to(torch.bfloat16).float().numpy()
        ref_bank = RefBank(device="cpu", dtype=torch.bfloat16,
                           store_cpu_copy=True, normalize=False)
        for p in pts:
            ref_bank.add(torch.tensor(p)[None, :])
        our_bank = LatentBank()
        for p in pts:
            our_bank.add(p)

        ref_chains, ref_root = copy.deepcopy(chains), copy.deepcopy(root)
        duck = _duck_trainer(ref_trainer, ref_bank, depth, tmp_path)
        duck.tokenizer = FakeTok()
        duck.value_fn = ref_value_fn
        duck.max_model_len = MAXLEN
        ref_acc, ref_p1, _ = ref_trainer.MTPOTrainer.compute_action_rewards(
            duck, ref_chains, reward_fns, "4", tree_id=trial,
            root_step=ref_root, cot=cot)

        our_chains, our_root = copy.deepcopy(chains), copy.deepcopy(root)
        our_duck = SimpleNamespace(
            tokenizer=FakeTok(), value_fn=our_value_fn,
            args=SimpleNamespace(max_model_len=MAXLEN))
        anchor = OurTrainer._embed_cot_anchor(our_duck, cot, our_root)
        assert anchor is not None and anchor.shape == (1, HID)
        cfg = ShapingConfig(depth=depth)
        our_acc, our_p1, _ = ours(our_chains, reward_fns, "4", cfg,
                                  bank=our_bank, root_step=our_root,
                                  cot_anchor=anchor)

        # the embedding call saw byte-identical ids on both sides
        assert calls["ref"][-1] == calls["ours"][-1]
        assert our_acc == pytest.approx(ref_acc)
        assert our_p1 == pytest.approx(ref_p1)
        for ci, (rc, oc) in enumerate(zip(ref_chains, our_chains)):
            for si, (rs, os_) in enumerate(zip(rc, oc)):
                loc = f"trial {trial} chain {ci} step {si}"
                assert os_.get("v_target", 0.0) == pytest.approx(
                    rs.get("v_target", 0.0), rel=1e-4, abs=1e-5), loc + " v_target"
                assert os_.get("reward", 0.0) == pytest.approx(
                    rs.get("reward", 0.0), rel=1e-4, abs=1e-5), loc + " reward"

    # pre-tokenized cot (list[int]) also accepted on both sides
    ids_cot = [5, 6, 7]
    root, chains, pts = _random_tree(rng, breadth=2, depth=depth, hid_dim=HID)
    root["root_h0"] = [0.0] * 8
    our_duck = SimpleNamespace(tokenizer=FakeTok(), value_fn=our_value_fn,
                               args=SimpleNamespace(max_model_len=MAXLEN))
    anchor = OurTrainer._embed_cot_anchor(our_duck, ids_cot, root)
    assert anchor is not None
    assert calls["ours"][-1][0][-4:] == [5, 6, 7, EOS]

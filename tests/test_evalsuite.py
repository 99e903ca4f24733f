"""Eval harness end-to-end: rollout CLI (fake engine) -> scorer contracts."""

import csv
import json
import os
import re

import pytest

from lapha_tpu.engine import FakeEngine
from lapha_tpu.evalsuite import eval_math as em
from lapha_tpu.evalsuite.rollout_jsonl import _extract_answer, main as rollout_main

from test_search import ChatTok  # invertible fake tokenizer


@pytest.fixture()
def gold_file(tmp_path):
    rows = [
        {"question": "What is 2+2?", "answer": "4"},
        {"question": "What is 3*3?", "answer": "9"},
        {"question": "What is 10-3?", "answer": "7"},
    ]
    p = tmp_path / "math-500.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return p


def test_extract_answer_priority():
    assert _extract_answer("<answer>42</answer>") == "42"
    assert _extract_answer("x \\boxed{7} y") == "7"
    assert _extract_answer("Final Answer: 3/4\nmore") == "3/4"
    assert _extract_answer("just text 17 and 23") == "23"
    assert _extract_answer("aime says 123 done", aime_hint=True) == "123"
    assert _extract_answer("") == ""
    assert _extract_answer("<answer>$5$</answer>") == "5"


def _run_rollout(tmp_path, gold_file, mode, script, extra=None):
    tok = ChatTok()
    eng = FakeEngine(tok, script=script)
    out = tmp_path / "pred.jsonl"
    argv = [
        "--data", str(gold_file), "--out", str(out), "--dataset-name", "math",
        "--mode", mode, "--tokenizer-path", "unused", "--engine", "fake",
        "--max-new-tokens", "64", "--depth", "3",
    ] + (extra or [])
    n = rollout_main(argv, engine_override=eng, tokenizer_override=tok)
    return out, n, eng


def test_single_mode_jsonl_contract(tmp_path, gold_file):
    out, n, _ = _run_rollout(
        tmp_path, gold_file, "single",
        script=[(r"2\+2", ["<think>easy</think> <answer>4</answer>"]),
                (r"3\*3", ["<think>sq</think> <answer>9</answer>"]),
                (r".", ["<think>hmm</think> <answer>0</answer>"])],
    )
    assert n == 3
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 3
    for r in rows:
        assert set(r) == {"dataset", "qid", "question", "completion", "final_answer",
                          "completions", "final_answers", "k"}
        assert isinstance(r["completion"], str)
        assert r["k"] == 1
    assert rows[0]["final_answer"] == "4"
    assert rows[1]["final_answer"] == "9"


def test_react_mode_with_rollout_k(tmp_path, gold_file):
    out, n, _ = _run_rollout(
        tmp_path, gold_file, "react",
        script=[(r".", ["<think>t</think> <answer>4</answer>"])],
        extra=["--k", "3"],
    )
    rows = [json.loads(l) for l in open(out)]
    assert all(r["k"] == 3 and len(r["completions"]) == 3 for r in rows)


def test_react_mode_multistep_tool_loop(tmp_path, gold_file):
    # first step calls a tool (fence), second step answers
    out, n, eng = _run_rollout(
        tmp_path, gold_file, "react",
        script=[
            # after the sandboxed tool ran, a tool message appears in the chat
            (r"<\|tool\|>", ["<think>done</think> <answer>4</answer>"]),
            (r".", ["<think>calc</think>\n```python\n2+2\n```"]),
        ],
        extra=["--limit", "1"],
    )
    rows = [json.loads(l) for l in open(out)]
    assert rows[0]["final_answer"] == "4"
    assert len(eng.calls) >= 2  # tool round-trip happened


def test_limit_flag(tmp_path, gold_file):
    out, n, _ = _run_rollout(
        tmp_path, gold_file, "single",
        script=[(r".", ["<think>x</think> <answer>1</answer>"])],
        extra=["--limit", "2"],
    )
    assert n == 2


def test_value_mode_end_to_end(tmp_path, gold_file):
    from lapha_tpu.search import make_fake_value_fn

    tok = ChatTok()
    eng = FakeEngine(tok, script=[
        (r"STEP-2", ["deep </think> <answer>4</answer>", "deep2 </think> <answer>4</answer>"]),
        (r".", ["start </think> go", "start2 </think> go"]),
    ])
    out = tmp_path / "value.pred.jsonl"
    argv = [
        "--data", str(gold_file), "--out", str(out), "--dataset-name", "math",
        "--mode", "value", "--tokenizer-path", "unused", "--engine", "fake",
        "--depth", "3", "--breadth", "2", "--mcts-num-sim", "4",
        "--mcts-num-pos-sim", "1", "--limit", "1", "--max-model-len", "512",
    ]
    n = rollout_main(argv, engine_override=eng, tokenizer_override=tok,
                     value_fn_override=make_fake_value_fn(hidden_size=8))
    rows = [json.loads(l) for l in open(out)]
    assert n == 1 and rows[0]["final_answer"] == "4"


def test_eval_math_scoring_contract(tmp_path, gold_file, monkeypatch):
    # build preds: q1 right, q2 wrong, q3 right-on-2nd-sample
    import hashlib
    import unicodedata

    def qid(q):
        return hashlib.sha1(unicodedata.normalize("NFKC", q).encode()).hexdigest()[:10]

    preds = [
        {"qid": qid("What is 2+2?"), "question": "What is 2+2?",
         "completion": "<answer>4</answer>", "final_answer": "4",
         "completions": ["<answer>4</answer>"], "final_answers": ["4"], "k": 1},
        {"qid": qid("What is 3*3?"), "question": "What is 3*3?",
         "completion": "<answer>8</answer>", "final_answer": "8",
         "completions": ["<answer>8</answer>"], "final_answers": ["8"], "k": 1},
        {"qid": qid("What is 10-3?"), "question": "What is 10-3?",
         "completion": "<answer>6</answer>", "final_answer": "6",
         "completions": ["<answer>6</answer>", "<answer>7</answer>"],
         "final_answers": ["6", "7"], "k": 2},
    ]
    eval_dir = tmp_path / "eval"
    (eval_dir / "rollouts").mkdir(parents=True)
    with open(eval_dir / "rollouts" / "math.pred.jsonl", "w") as f:
        for p in preds:
            f.write(json.dumps(p) + "\n")

    monkeypatch.setenv("LAPHA_EVAL_DIR", str(eval_dir))
    monkeypatch.setenv("DATA_DIR_MATH", str(gold_file))
    monkeypatch.setattr(em, "EVAL_DIR", eval_dir)

    em.main(["--dataset", "math", "--k", "2"])

    summary = json.load(open(eval_dir / "results" / "math.summary.json"))
    assert summary["num"] == 3
    assert summary["pass@1"] == pytest.approx(1 / 3)
    assert summary["pass@k"] == pytest.approx(2 / 3)  # q3 right on sample 2
    assert summary["k"] == 2
    assert set(summary) >= {"dataset", "timestamp", "tool", "num", "correct@1",
                            "pass@1", "correct@k", "pass@k", "avg@k_answered",
                            "answered", "answered_rate"}

    with open(eval_dir / "results" / "summary.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["time", "dataset", "#_samples", "k", "pass@1", "pass@k", "avg@k"]
    assert rows[1][1] == "math"


def test_eval_math_sharded_preds(tmp_path, gold_file, monkeypatch):
    import hashlib
    import unicodedata

    def qid(q):
        return hashlib.sha1(unicodedata.normalize("NFKC", q).encode()).hexdigest()[:10]

    eval_dir = tmp_path / "eval"
    (eval_dir / "rollouts").mkdir(parents=True)
    shard_rows = [
        ("math.pred.rank0.jsonl", {"qid": qid("What is 2+2?"), "completion": "<answer>4</answer>",
                                   "final_answer": "4"}),
        ("math.pred.rank1.jsonl", {"qid": qid("What is 3*3?"), "completion": "<answer>9</answer>",
                                   "final_answer": "9"}),
    ]
    for fname, row in shard_rows:
        with open(eval_dir / "rollouts" / fname, "w") as f:
            f.write(json.dumps(row) + "\n")

    monkeypatch.setattr(em, "EVAL_DIR", eval_dir)
    monkeypatch.setenv("DATA_DIR_MATH", str(gold_file))
    em.main(["--dataset", "math"])
    summary = json.load(open(eval_dir / "results" / "math.summary.json"))
    assert summary["correct@1"] == 2  # both sharded answers right; q3 missing -> wrong

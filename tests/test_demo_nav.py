"""Nav-task (demo run 3) generators and graders — pure-Python invariants.

The nav task is the fig2 vehicle (DEMO_SCALING.md run-2 attribution):
choice errors produce coherent-but-doomed states whose doom is a
function of the VISIBLE state, so these graders define what "correct"
means for the committed capability-demo numbers. Pin them hard.
"""
import importlib.util
import os
import random
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "demo_scaling", os.path.join(os.path.dirname(__file__), "..",
                                 "scripts", "demo_scaling.py"))
ds = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ds)


def expert_chain(ex):
    n = len(ex["ops"])
    return [{"completion": ds.step_completion(j + 1, *op, last=(j == n - 1))}
            for j, op in enumerate(ex["ops"])]


@pytest.mark.parametrize("n_ops", [3, 4, 5])
def test_sample_question_nav_expert_path(n_ops):
    rng = random.Random(n_ops)
    for _ in range(20):
        ex = ds.sample_question_nav(rng, n_ops)
        assert len(ex["ops"]) == n_ops
        # expert path is chain-continuous, menu-legal, in-range, and a
        # BFS-SHORTEST path (no shorter route exists)
        cur = ex["v0"]
        menu = set(map(tuple, ex["menu"]))
        for op, k, v, r in ex["ops"]:
            assert v == cur and (op, k) in menu
            assert ds._nav_apply(op, k, v) == r
            assert 0 <= r <= ds.MAXV
            cur = r
        assert str(cur) == ex["ground_truth"]
        dist, _ = ds.nav_bfs(ex["v0"], ex["menu"], n_ops)
        assert dist[int(ex["ground_truth"])] == n_ops


def test_question_text_tokenizes_without_unk():
    tok = ds.DemoTok()
    rng = random.Random(7)
    for _ in range(10):
        ex = ds.sample_question_nav(rng, 4)
        ids = tok(ex["question"])["input_ids"]
        assert tok.unk not in ids
    # nav words stay under the same 128-padded vocab as the chain task
    assert ((len(tok) + 127) // 128) * 128 == 384


def test_grade_chain_nav_accepts_expert_and_rejects_corruption():
    rng = random.Random(3)
    ex = ds.sample_question_nav(rng, 4)
    chain = expert_chain(ex)
    assert ds.grade_chain_nav(chain, ex) == 1.0
    assert ds.reward_nav(chain[-1]["completion"], ex["ground_truth"]) == 1.0

    # arithmetic slip mid-chain: visible equation is false -> 0
    op, k, v, r = ex["ops"][1]
    bad = [dict(s) for s in chain]
    bad[1]["completion"] = chain[1]["completion"].replace(
        f"= {r}", f"= {r + 1}")
    assert ds.grade_chain_nav(bad, ex) == 0.0

    # chain discontinuity: step quotes the wrong running value -> 0
    bad = [dict(s) for s in chain]
    bad[2]["completion"] = chain[2]["completion"].replace(
        f"{ex['ops'][2][2]} ", f"{ex['ops'][2][2] + 1} ", 1)
    assert ds.grade_chain_nav(bad, ex) == 0.0

    # unanswered chain (no <answer>) -> 0
    unanswered = chain[:-1]
    assert ds.grade_chain_nav(unanswered, ex) == 0.0


def test_grade_chain_nav_rejects_non_menu_op():
    rng = random.Random(11)
    ex = ds.sample_question_nav(rng, 3)
    menu_ops = set(map(tuple, ex["menu"]))
    off = next((op, k) for op in ds.OPS for k in range(2, 10)
               if (op, k) not in menu_ops)
    v0 = ex["v0"]
    r = ds._nav_apply(off[0], off[1], v0)
    chain = [{"completion": f"STEP-1:\n<think>\n{v0} {off[0]} {off[1]} "
                            f"= {r} </think>"}]
    assert ds.grade_chain_nav(chain, ex) == 0.0


def test_reward_nav_requires_true_final_equation():
    # answer matches the target but the closing equation is false:
    # the per-step grader must refuse (it cannot see earlier steps,
    # but it CAN verify the step it is given)
    gt = "24"
    good = "STEP-3:\n<think>\n12 mul 2 = 24 </think>\n<answer> 24 </answer>"
    lie = "STEP-3:\n<think>\n11 mul 2 = 24 </think>\n<answer> 24 </answer>"
    assert ds.reward_nav(good, gt) == 1.0
    assert ds.reward_nav(lie, gt) == 0.0
    assert ds.reward_nav(good, "25") == 0.0


def test_leaf_records_nav_includes_unanswered_terminals():
    rng = random.Random(5)
    ex = ds.sample_question_nav(rng, 3)
    good = expert_chain(ex)
    doomed = [{"completion": good[0]["completion"]}]  # never answered
    recs, by_id = ds.leaf_records([good, doomed], ex,
                                  grade=ds.grade_chain_nav)
    assert len(recs) == 2
    assert sorted(r["correct"] for r in recs) == [0.0, 1.0]
    assert sorted(r["answered"] for r in recs) == [False, True]
    assert id(good[-1]) in by_id and id(doomed[-1]) in by_id
    # chain task default: answered-only (run-2 committed metric)
    recs2, _ = ds.leaf_records([good, doomed], ex)
    assert len(recs2) == 1

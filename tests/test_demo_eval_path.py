"""Demo-scaling EVAL/reporting path — end-to-end on CPU with a fake agent.

Round-4 run 3 burned 108 s SFT + 2,598 s of real TPU RL and then died at
the FIRST eval arm on a NameError in eval_arm's log f-string
(demo_out_nav/run3.log) because nothing exercised the reporting code.
This test drives the full chain a hardware run depends on AFTER training:
eval_arm (including its per-question log line), summarize, the main()
summary-table row format, the DEMO_SCALING.json schema, and the figure
renderer (scripts/demo_figures.py) — on a 2-question / 2-sim nav config
with a deterministic fake agent, so no log-line or schema regression can
ever again kill a 45-minute TPU run in its reporting code.
"""
import importlib.util
import json
import os
import random
import subprocess
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")
_SPEC = importlib.util.spec_from_file_location(
    "demo_scaling", os.path.join(_ROOT, "scripts", "demo_scaling.py"))
ds = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ds)


def expert_chain(ex):
    n = len(ex["ops"])
    return [{"completion": ds.step_completion(j + 1, *op, last=(j == n - 1)),
             "v_pred": 0.9 - 0.01 * j}
            for j, op in enumerate(ex["ops"])]


def doomed_chain(ex):
    # one legal step, then stalls: terminal, unanswered -> graded 0
    op, k, v, r = ex["ops"][0]
    return [{"completion": ds.step_completion(1, op, k, v, r, last=False),
             "v_pred": 0.2}]


def wrong_chain(ex):
    # answered with a corrupted final equation -> graded 0
    ch = expert_chain(ex)
    op, k, v, r = ex["ops"][-1]
    ch[-1] = {"completion": ch[-1]["completion"].replace(
        f"= {r}", f"= {r + 1}").replace(
        f"<answer> {r} ", f"<answer> {r + 1} "), "v_pred": 0.5}
    return ch


class FakeAgent:
    """Deterministic stand-in for DemoAgent: same search() contract."""

    def __init__(self, ex_by_q, *, value_trust, num_sim, prune_per, seed):
        self.ex_by_q = ex_by_q
        self.value_trust = value_trust

    def search(self, *, question, ground_truth, support_material_path,
               cot):
        ex = self.ex_by_q[question]
        chains = [expert_chain(ex), doomed_chain(ex), wrong_chain(ex)]
        if self.value_trust == 0.0:
            # unguided control: head can't rank -> expert leaf NOT top-v
            chains[0][-1]["v_pred"] = 0.1
        return chains


@pytest.fixture(scope="module")
def questions():
    rng = random.Random(0)
    return [ds.sample_question_nav(rng, 3) for _ in range(2)]


def _make_agent_factory(questions):
    ex_by_q = {ex["question"]: ex for ex in questions}

    def make_agent(**kw):
        return FakeAgent(ex_by_q, **kw)

    return make_agent


def _run_arms(questions, log):
    make_agent = _make_agent_factory(questions)
    arms = {}
    for ns in (2, 4):
        arms[f"guided_sim{ns}"] = ds.eval_arm(
            questions, make_agent, num_sim=ns, value_trust=1.0,
            prune_per=10**9, seed=ns, grade=ds.grade_chain_nav, log=log)
        arms[f"unguided_sim{ns}"] = ds.eval_arm(
            questions, make_agent, num_sim=ns, value_trust=0.0,
            prune_per=10**9, seed=ns, grade=ds.grade_chain_nav, log=log)
    arms["pruned"] = ds.eval_arm(
        questions, make_agent, num_sim=2, value_trust=1.0, prune_per=8,
        seed=7, grade=ds.grade_chain_nav, log=log)
    arms["unpruned"] = arms["guided_sim2"]
    return arms


def test_eval_arm_records_and_log_line(questions):
    lines = []
    arms = _run_arms(questions, lines.append)
    # the run-3 crash line rendered for every question of every arm
    # (5 eval_arm calls x 2 questions; "unpruned" aliases guided_sim2)
    assert sum("ans=" in ln and "pass1=" in ln for ln in lines) == 10
    for rec in arms["guided_sim2"]:
        assert set(rec) >= {"q", "pass1", "avg_leaf", "vh_top1",
                            "any_correct", "avg_ans", "vh_top1_ans",
                            "n_leaves", "n_answered", "secs"}
        # 3 terminal leaves, 2 answered (expert + corrupted); only the
        # expert leaf grades 1 -> avg_leaf = 1/3 and the guided head
        # (expert v_pred highest) picks it
        assert rec["n_leaves"] == 3 and rec["n_answered"] == 2
        assert rec["avg_leaf"] == pytest.approx(1 / 3)
        assert rec["vh_top1"] == 1.0 and rec["any_correct"] == 1.0
    # unguided control: top-v leaf is the corrupted one -> vh_top1 = 0
    for rec in arms["unguided_sim2"]:
        assert rec["vh_top1"] == 0.0
        assert rec["avg_leaf"] == pytest.approx(1 / 3)
    # fig2 headline on this fixture: guided vh_top1 > avg_leaf
    assert (ds.summarize(arms["guided_sim2"], "vh_top1")
            > ds.summarize(arms["guided_sim2"], "avg_leaf"))


def test_summary_table_and_figures(questions, tmp_path):
    arms = _run_arms(questions, lambda *_: None)
    results = {"config": {
        "task": "nav", "n_params_m": 3.4, "fact_acc": 0.96,
        "choice_acc": 0.5, "rl_steps": 0, "n_eval": len(questions),
        "sims": [2, 4], "depth": 6, "breadth": 6, "backend": "cpu",
    }, "arms": arms}
    # main()'s summary-table row format must render for every arm
    for name, recs in results["arms"].items():
        row = (f"| {name} | {ds.summarize(recs, 'pass1'):.3f} "
               f"| {ds.summarize(recs, 'vh_top1'):.3f} "
               f"| {ds.summarize(recs, 'avg_leaf'):.3f} "
               f"| {ds.summarize(recs, 'any_correct'):.3f} "
               f"| {ds.summarize(recs, 'vh_top1_ans'):.3f} "
               f"| {ds.summarize(recs, 'avg_ans'):.3f} |")
        assert row.count("|") == 8
    path = tmp_path / "DEMO_SCALING.json"
    path.write_text(json.dumps(results))
    # the figure renderer end-to-end, exactly as a hardware run invokes it
    out = tmp_path / "assets"
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "demo_figures.py"),
         str(path), str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for name in ("demo_fig2_valuehead_vs_avgleaf.png",
                 "demo_fig3_test_time_scaling.png",
                 "demo_fig4_pruning_effect.png"):
        p = out / name
        assert p.exists() and p.stat().st_size > 1000, name

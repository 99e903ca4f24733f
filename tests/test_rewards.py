"""Grader parity: differential tests vs the reference implementation.

The reference's eval/rewards.py is importable standalone; every grader here
must produce identical 0/1 scores on a battery of fixture completions.
"""

import sys

import pytest

from lapha_tpu.evalsuite import rewards as ours

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    try:
        from eval import rewards as ref_rewards
        yield ref_rewards
    finally:
        sys.path.remove(REF_PATH)


# (completion, ground_truth) fixture battery covering the extraction paths
MATH_CASES = [
    ("<answer>42</answer>", "42"),
    ("<answer>42</answer>", "\\boxed{42}"),
    ("<answer>$\\frac{1}{2}$</answer>", "\\boxed{\\frac12}"),
    ("the answer is \\boxed{3\\sqrt{2}}", "3\\sqrt{2}"),
    ("Final Answer: 7", "7"),
    ("some text 3.50", "3.5"),
    ("<answer>1,000</answer>", "1000"),
    ("<answer>x=5</answer>", "5"),
    ("<answer>0.5</answer>", ".5"),
    ("<answer>\\text{east}</answer>", "east"),
    ("<answer>wrong</answer>", "42"),
    ("no answer at all", "42"),
    ("<answer></answer>", "42"),
    ("<answer>-3</answer>", "-3"),
    ("<answer>2/3</answer>", "\\frac{2}{3}"),
    ("<answer>10 degrees</answer>", "10"),
    ("<answer>$12$ dollars</answer>", "12"),
    ("<answer>3.0</answer>", "3"),
]

AIME_CASES = [
    ("<answer>204</answer>", "204"),
    ("<answer>204</answer>", "0204"),
    ("<answer> 204 </answer>", "\\boxed{204}"),
    ("the final count is 73.", "73"),
    ("<answer>1000</answer>", "1000"),   # out of AIME range
    ("<answer>007</answer>", "7"),
    ("result: 42", "41"),
    ("", "10"),
    ("<answer>999</answer>", "999"),
]

GAOKAO_CASES = [
    ("<answer>B</answer>", "B"),
    ("<answer>(C)</answer>", "C"),
    ("I pick: D", "D"),
    ("<answer>A</answer>", "B"),
    ("<answer>15</answer>", "15"),
    ("<answer>\\frac{1}{3}</answer>", "\\frac13"),
]


@pytest.mark.parametrize("case", MATH_CASES, ids=range(len(MATH_CASES)))
def test_math_parity(ref, case):
    comp, gt = case
    assert ours.REWARD_FUNCS["math"](comp, gt) == ref.REWARD_FUNCS["math"](comp, gt)


@pytest.mark.parametrize("case", AIME_CASES, ids=range(len(AIME_CASES)))
def test_aime_parity(ref, case):
    comp, gt = case
    assert ours.REWARD_FUNCS["aime24"](comp, gt) == ref.REWARD_FUNCS["aime24"](comp, gt)


@pytest.mark.parametrize("case", GAOKAO_CASES, ids=range(len(GAOKAO_CASES)))
def test_gaokao_parity(ref, case):
    comp, gt = case
    assert ours.REWARD_FUNCS["gaokao2023"](comp, gt) == ref.REWARD_FUNCS["gaokao2023"](comp, gt)


@pytest.mark.parametrize("case", MATH_CASES + GAOKAO_CASES, ids=range(len(MATH_CASES + GAOKAO_CASES)))
def test_olympiad_parity(ref, case):
    comp, gt = case
    assert ours.REWARD_FUNCS["olympiadbench"](comp, gt) == ref.REWARD_FUNCS["olympiadbench"](comp, gt)


def test_normalize_parity(ref):
    for s in ["\\frac12", "\\text{5 degrees}", "$\\sqrt2$", "1,234", "a half",
              "\\boxed{42}", "x = 9", "3.0 cm"]:
        assert ours.normalize_final_answer(s) == ref.normalize_final_answer(s), s


def test_strip_string_parity(ref):
    for s in ["\\left(\\frac{1}{2}\\right)", " 3.50 ", "\\frac12", "$x$",
              ".5", "7.0", "\\text{abc}", "\\sqrt2"]:
        assert ours.strip_string(s) == ref.strip_string(s), s


def test_boxed_extraction_parity(ref):
    for s in ["pre \\boxed{a{b}c} post", "\\boxed{1} then \\boxed{2}", "none", "\\boxed{unclosed"]:
        assert ours.last_boxed_only_string(s) == ref.last_boxed_only_string(s), s


def test_extract_from_completion_parity(ref):
    for s in ["<answer>9</answer>", "\\boxed{x+1}", "Final Answer: 3/4", "blah 17 blah 23",
              "nothing here", "Answer: $\\sqrt{2}$"]:
        assert ours.extract_from_completion(s) == ref.extract_from_completion(s), s


# ---------------------------------------------------------------- judge logic

class _EchoJudgeLLM:
    """Scripted judge engine returning a fixed verdict."""

    def __init__(self, tokenizer, verdict="1"):
        self.tokenizer = tokenizer
        self.verdict = verdict
        self.calls = 0

    def generate(self, prompts, sampling_params, use_tqdm=False):
        from lapha_tpu.engine.adapter import CompletionOutput, RequestOutput

        self.calls += 1
        ids = self.tokenizer(f"<answer>{self.verdict}</answer>", add_special_tokens=False)["input_ids"]
        return [RequestOutput(outputs=[CompletionOutput(token_ids=ids)])]


class _PassthroughTok:
    def __call__(self, text, add_special_tokens=False, **kw):
        return {"input_ids": [ord(c) for c in text]}

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids)

    def apply_chat_template(self, conversation, tokenize=False, add_generation_prompt=True, **kw):
        return "\n".join(m["content"] for m in conversation)


def test_llm_judge_deterministic_precheck():
    tok = _PassthroughTok()
    llm = _EchoJudgeLLM(tok, verdict="0")
    judge = ours.LLMJudge(tok, llm)
    # equal after normalization -> no LLM call
    assert judge.score("<answer> 42 </answer>", "42") == 1.0
    assert llm.calls == 0
    # no extractable answer -> 0 without LLM call
    assert judge.score("garbage", "42") == 0.0
    assert llm.calls == 0


def test_llm_judge_escalates():
    tok = _PassthroughTok()
    llm = _EchoJudgeLLM(tok, verdict="1")
    judge = ours.LLMJudge(tok, llm)
    assert judge.score("<answer>half</answer>", "1/2") == 1.0
    assert llm.calls == 1


def test_with_llm_judge_policy():
    calls = []

    def rule(c, g):
        return 1.0 if g in c else 0.0

    def judge(c, g):
        calls.append((c, g))
        return 1.0

    fn = ours.with_llm_judge(rule, judge)
    assert fn("<answer>42</answer>", "42") == 1.0 and not calls  # rule hit
    assert fn("no tag here", "42") == 0.0 and not calls  # no answer tag
    assert fn("<answer>x</answer>", "42") == 1.0 and len(calls) == 1  # escalated

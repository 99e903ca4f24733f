"""DAPO-math dataset loader + training reward (helpers parity).

Behavior parity with /root/reference/helpers/math_dapo.py: the parquet ->
Dataset conversion with the answer-format prompt shim (374-423), the
Minerva-normalized <answer>-tag training reward on the last 128 chars
(306-366), and the structural <think>/<tool_call>/<answer> format score
(255-302). Normalization reuses evalsuite.rewards (same Minerva tables).
"""

from __future__ import annotations

import ast
import re
from typing import Optional

import numpy as np

from ..evalsuite.rewards import last_boxed_only_string, normalize_final_answer, remove_boxed

_PROMPT_SHIM_OLD_TAIL = '\n\nRemember to put your answer on its own line after "Answer:".'
_PROMPT_SHIM_NEW_TAIL = "\n👆\nformat the FINAL answer as `<answer>...</answer>`."
_PROMPT_SHIM_OLD_HEAD = (
    "Solve the following math problem step by step. The last line of your "
    "response should be of the form Answer: $Answer (without quotes) where "
    "$Answer is the answer to the problem.\n\n"
)


def is_correct_minerva(solution_str: str, gt: str, gt_need_extract: bool = False,
                       answer_pattern: str = r"(?i)Answer\s*:\s*([^\n]+)") -> tuple[bool, str]:
    match = re.findall(answer_pattern, solution_str or "", re.DOTALL)
    extracted = match[-1] if match else "[INVALID]"
    pred = normalize_final_answer(extracted)
    if gt_need_extract:
        gt = normalize_final_answer(remove_boxed(last_boxed_only_string(gt)))
    else:
        gt = normalize_final_answer(gt)
    return (pred == gt), pred


def verify(solution_str: str, answer: str, strict_box_verify: bool = False,
           pause_tokens_index=None,
           answer_pattern: str = r"(?i)Answer\s*:\s*([^\n]+)") -> tuple[bool, Optional[str]]:
    if strict_box_verify:
        pred = (solution_str or "")[-100:]
        boxed = last_boxed_only_string(pred)
        extracted = remove_boxed(boxed) if boxed is not None else None
        return extracted == answer, extracted
    return is_correct_minerva(solution_str, answer, answer_pattern=answer_pattern)


def compute_score(solution_str: str, ground_truth: str,
                  answer_pattern: str = r"(?i)<answer>(.*?)</answer>") -> dict:
    # last 128 chars: longest MATH-500 answer is 159 chars (reference comment)
    solution_str = (solution_str or "")[-128:]
    correct, _pred = verify(solution_str, ground_truth, answer_pattern=answer_pattern)
    return {"score": 1.0 if correct else 0.0}


def math_reward(completion: str, ground_truth) -> float:
    """The training reward fed into MCTS (run_dapo.py:126)."""
    return compute_score(completion, ground_truth, answer_pattern=r"<answer>(.*?)</answer>")["score"]


def compute_score_format(solution_str: str) -> float:
    """Structural format score over <|im_start|> assistant/tool blocks."""
    if solution_str is None:
        return 0.0
    try:
        blocks = re.findall(r"<\|im_start\|>(?:assistant|tool)\n(.*?)<\|im_end\|>",
                            solution_str, re.DOTALL)
        if not blocks:
            return 0.0
        score = 0.0
        for block in blocks[:-1]:
            if (block.count("<think>") == 1 and block.count("</think>") == 1
                    and block.count("<tool_call>") == 1 and block.count("</tool_call>") == 1):
                if re.search(r"^<think>(.*?)</think>\n<tool_call>(.*?)</tool_call>$",
                             block, re.DOTALL):
                    score += 1.0 / len(blocks)
        last = blocks[-1]
        if re.search(r"^<think>(.*?)</think>\n<answer>(.*?)</answer>$", last, re.DOTALL):
            score += 1.0 / len(blocks)
        return score
    except Exception:
        return 0.0


def dataloader(parquet_path: str):
    """DAPO-math parquet -> HF Dataset with question/ground_truth/support."""
    import pandas as pd
    from datasets import Dataset

    df = pd.read_parquet(parquet_path)
    records = []
    for _, row in df.iterrows():
        raw = row["prompt"]
        if isinstance(raw, np.ndarray):
            msgs = raw.tolist()
        elif isinstance(raw, str):
            msgs = ast.literal_eval(raw)
        elif isinstance(raw, list):
            msgs = raw
        else:
            raise ValueError(f"Unexpected prompt type: {type(raw)}")
        question = msgs[0]["content"]
        question = question.replace(_PROMPT_SHIM_OLD_TAIL, _PROMPT_SHIM_NEW_TAIL)
        question = question.replace(_PROMPT_SHIM_OLD_HEAD, "")

        meta = row["reward_model"]
        if isinstance(meta, str):
            meta = ast.literal_eval(meta)
        if not isinstance(meta, dict):
            raise ValueError(f"Unexpected reward_model type: {type(meta)}")
        gt = meta.get("ground_truth")
        if gt is None:
            raise KeyError(f"No 'ground_truth' in reward_model: {meta}")

        records.append({
            "question": question,
            "ground_truth": str(gt),
            "support_material_path": [],
        })
    return Dataset.from_list(records)

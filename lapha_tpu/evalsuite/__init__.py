from . import adapters, eval_math, rewards
from .adapters import GenParams, build_engine_adapter
from .rewards import REWARD_FUNCS, RULE_REWARD_FUNCS, LLMJudge, with_llm_judge

__all__ = [
    "adapters",
    "eval_math",
    "rewards",
    "GenParams",
    "build_engine_adapter",
    "REWARD_FUNCS",
    "RULE_REWARD_FUNCS",
    "LLMJudge",
    "with_llm_judge",
]

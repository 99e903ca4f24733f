"""Engine-agnostic request/response seam (vLLM-compatible shapes).

The reference proves this narrow interface is all MCTS needs
(/root/reference/trainer/vllm_client.py:373-574 adapts a remote server to
`generate(prompts, sampling_params, use_tqdm) -> [RequestOutput]`;
/root/reference/eval/adapters.py:100-153 defines the engine-agnostic
GenParams / output structs). We keep the same field names so agent/search
code is engine-independent, and ship a scripted FakeEngine so search, reward
shaping and the eval harness are testable hermetically.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Sequence

__all__ = ["SamplingParams", "CompletionOutput", "RequestOutput", "FakeEngine", "build_engine_adapter"]


@dataclasses.dataclass
class SamplingParams:
    """vLLM-like sampling params (plus `n` and `logprobs`).

    top_k <= 0 disables top-k (vLLM uses -1); top_p >= 1 disables top-p.
    """

    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    max_tokens: int = 256
    logprobs: int = 0
    stop_token_ids: tuple[int, ...] = ()
    seed: int | None = None


@dataclasses.dataclass
class CompletionOutput:
    token_ids: list[int]
    cumulative_logprob: float = 0.0
    token_logprobs: list[float] | None = None
    text: str | None = None
    finish_reason: str = "stop"  # "stop" | "length"
    # set by engines with collect_h0: mean final hidden over prompt+emitted
    # tokens — the value head's pooled h0, produced during generation
    pooled_hidden: object = None


@dataclasses.dataclass
class RequestOutput:
    outputs: list[CompletionOutput]
    prompt: str | None = None
    prompt_token_ids: list[int] | None = None


class FakeEngine:
    """Deterministic scripted engine for hermetic tests.

    Responds from a script: a list of (pattern, [completion strings]) pairs
    matched against the prompt (first regex match wins), or a default
    callable. Token ids come from the supplied tokenizer; cumulative
    logprobs decrease with list position so softmax priors are ordered.
    """

    def __init__(self, tokenizer, script: Sequence[tuple[str, list[str]]] = (),
                 default: Callable[[str, int], list[str]] | None = None):
        self.tokenizer = tokenizer
        self.script = list(script)
        self.default = default or (lambda prompt, n: [f"<think>fake</think><answer>{i}</answer>" for i in range(n)])
        self.calls: list[dict] = []

    def update_params(self, params) -> None:
        """Weight-sync seam no-op (scripted outputs don't depend on params)."""

    def _completions_for(self, prompt: str, n: int) -> list[str]:
        for pat, comps in self.script:
            if re.search(pat, prompt, flags=re.S):
                out = list(comps)
                while len(out) < n:
                    out.append(out[-1])
                return out[:n]
        return self.default(prompt, n)

    def generate(self, prompts, sampling_params, use_tqdm: bool = False):
        n = int(getattr(sampling_params, "n", 1))
        results = []
        for p in prompts:
            comps = self._completions_for(p, n)
            outs = []
            for j, text in enumerate(comps):
                ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
                lps = [-0.1 * (j + 1)] * max(1, len(ids))
                outs.append(CompletionOutput(
                    token_ids=list(ids),
                    cumulative_logprob=float(sum(lps)),
                    token_logprobs=lps,
                    text=text,
                ))
            results.append(RequestOutput(outputs=outs, prompt=p))
        self.calls.append({"prompts": list(prompts), "n": n})
        return results


def build_engine_adapter(engine: str, **kw):
    """Factory mirroring eval/adapters.py:385-424 (`"vllm"`|`"jet"` there).

    Engines here: "tpu" (native Engine), "fake" (scripted). The "vllm" and
    "jet" names are accepted for CLI compatibility and map onto "tpu".
    """
    if engine in ("tpu", "vllm", "jet"):
        from .engine import Engine

        return Engine(**kw)
    if engine == "fake":
        return FakeEngine(**kw)
    raise ValueError(f"unknown engine {engine!r} (expected tpu|vllm|jet|fake)")

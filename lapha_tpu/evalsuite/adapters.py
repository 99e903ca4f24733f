"""Engine-agnostic sampling params + adapter factory for the eval harness.

Parity with /root/reference/eval/adapters.py:100-153 (GenParams incl. SDAR
diffusion knobs, vLLM-like output structs) and the build factory (385-424).
The native engine replaces both external backends; "vllm"/"jet" names are
accepted for drop-in CLI compatibility and mapped to the TPU engine.
"""

from __future__ import annotations

import dataclasses

from ..engine.adapter import CompletionOutput as LLMResponse  # noqa: F401 (compat alias)
from ..engine.adapter import RequestOutput as LLMOutput  # noqa: F401 (compat alias)
from ..engine.adapter import SamplingParams


@dataclasses.dataclass
class GenParams(SamplingParams):
    """SamplingParams + SDAR/diffusion knobs kept for config compatibility.

    The diffusion fields are accepted but unused by the native engine (the
    reference only consumes them through the optional JetEngine backend,
    adapters.py:159-379, which is not parity-critical — SURVEY.md §2.4).
    """

    remasking_strategy: str = "low_confidence_dynamic"
    block_length: int = 4
    denoising_steps: int = 4
    dynamic_threshold: float = 0.9


def build_engine_adapter(name: str = "tpu", tokenizer=None, **kw):
    """Factory: "tpu" native; "fake" scripted; "vllm"/"jet" map to native.

    For the native engine pass either a prebuilt ``engine=`` instance or
    ``model_path=`` (HF dir) plus engine kwargs.
    """
    name = (name or "tpu").lower()
    if name == "fake":
        from ..engine.adapter import FakeEngine

        return FakeEngine(tokenizer=tokenizer, **kw)
    if name in ("tpu", "vllm", "jet"):
        if "engine" in kw:
            return kw["engine"]
        from ..engine.engine import Engine
        from ..models import loader

        model_path = kw.pop("model_path", None) or kw.pop("jet_model_path", None)
        if model_path is None:
            raise ValueError("native engine needs model_path= or a prebuilt engine=")
        # drop foreign backend knobs (vllm_client, jet_*) for CLI compatibility
        kw = {k: v for k, v in kw.items()
              if not k.startswith("jet_") and k not in ("vllm_client", "base_url")}
        params, cfg = loader.load_params(model_path)
        return Engine(params, cfg, tokenizer, **kw)
    raise ValueError(f"unknown engine adapter {name!r}")

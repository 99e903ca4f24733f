from .adapter import (
    CompletionOutput,
    FakeEngine,
    RequestOutput,
    SamplingParams,
    build_engine_adapter,
)
from .engine import Engine

__all__ = [
    "CompletionOutput",
    "FakeEngine",
    "RequestOutput",
    "SamplingParams",
    "build_engine_adapter",
    "Engine",
]

from .adapter import (
    CompletionOutput,
    FakeEngine,
    RequestOutput,
    SamplingParams,
    build_engine_adapter,
)
from .client import EngineClient, RemoteEngineAdapter
from .diffusion import DiffusionEngine
from .engine import Engine
from .prefix_cache import PrefixCacheStore
from .scheduler import ContinuousEngine

__all__ = [
    "CompletionOutput",
    "FakeEngine",
    "RequestOutput",
    "SamplingParams",
    "build_engine_adapter",
    "Engine",
    "DiffusionEngine",
    "EngineClient",
    "RemoteEngineAdapter",
    "PrefixCacheStore",
    "ContinuousEngine",
]

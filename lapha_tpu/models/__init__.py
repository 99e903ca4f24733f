from . import loader, qwen2, value_model
from .qwen2 import Qwen2Config

__all__ = ["loader", "qwen2", "value_model", "Qwen2Config", "model_module"]


def model_module(cfg):
    """Config -> model module (qwen2 | deepseek) — the single dispatch
    point shared by the Engine, the trainer losses and the value model,
    so every family serves AND trains through the same code paths.
    deepseek is imported lazily (it imports qwen2 for shared pieces)."""
    if type(cfg).__name__ == "DeepseekConfig":
        from . import deepseek

        return deepseek
    return qwen2

"""Model registry (keeps the model-family surface extensible).

The reference's CLI enumerates model types it never implements beyond the
Mistral path (``videollama2 | videollama2_llama | videollama2_mistral |
videollama2_mixtral | videollama2_qwen2``, extractfeatures.py:66).  We keep
the same names; only the dense Mistral family is implemented (as in the
reference), the rest raise with a clear message.  New families register a
``VLBConfig`` factory under their name.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["register_model", "get_model_config", "available_models"]

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_model_config(name: str, **kwargs):
    if name not in _REGISTRY:
        known = ", ".join(sorted(_REGISTRY))
        raise NotImplementedError(
            f"model family {name!r} is not implemented (available: {known}). "
            "The reference enumerates the same names without implementing "
            "them (extractfeatures.py:66); register a factory to add one."
        )
    return _REGISTRY[name](**kwargs)


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtin():
    from phantom_vlb_tpu.models.videollama2 import VLBConfig

    @register_model("videollama2")
    @register_model("videollama2_mistral")
    def _mistral(**kwargs):
        return VLBConfig.full(**kwargs)


_register_builtin()

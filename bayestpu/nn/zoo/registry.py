"""Model registry — name → builder dispatch.

Replaces the reference's scattered dispatch functions: ``get_model`` in
``Hardware_Artifact/bayes_hw/train_qkeras.py:105-128`` /
``train_qkeras_mcme.py:109``, ``get_network`` in
``Software_Artifact/software/models/model_loader.py:8-24``.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name.lower()] = fn
        return fn
    return deco


def get_model(name: str, **kwargs):
    try:
        builder = _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}") from None
    return builder(**kwargs)


def available_models() -> list[str]:
    return sorted(_REGISTRY)

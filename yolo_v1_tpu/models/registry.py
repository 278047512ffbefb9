"""Model registry: name -> constructor.

Replaces the reference's hardcoded backbone-name lists scattered across
train.py:56-57, eval.py:58-62 and run_voc_mAP.py:34-44 with a single lookup.
"""

from __future__ import annotations

import jax.numpy as jnp

from yolo_v1_tpu.models import densenet, resnet, tiny

_REGISTRY = {
    # Test/CI-scale model (not in the reference) — input 16*S pixels.
    "tiny": tiny.tiny,
    "resnet18": resnet.resnet18,
    "resnet34": resnet.resnet34,
    "resnet50": resnet.resnet50,
    "resnet101": resnet.resnet101,
    "resnet152": resnet.resnet152,
    "resnext50_32x4d": resnet.resnext50_32x4d,
    "resnext101_32x8d": resnet.resnext101_32x8d,
    "densenet121": densenet.densenet121,
    "densenet169": densenet.densenet169,
    "densenet201": densenet.densenet201,
    "densenet161": densenet.densenet161,
    # Reference train.py:56 names: 'densenet' -> densenet121, 'resnet' ->
    # resnet50 (train.py:60, 71).
    "densenet": densenet.densenet121,
    "resnet": resnet.resnet50,
}


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_model(
    name: str,
    S: int = 7,
    B: int = 2,
    num_classes: int = 20,
    dtype=jnp.bfloat16,
    **kwargs,
):
    """Construct a detector module by name.

    Extra kwargs (e.g. ``remat=True`` for activation rematerialization on
    the ResNet family) pass through to the constructor.
    """
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    return _REGISTRY[name](S=S, B=B, num_classes=num_classes, dtype=dtype, **kwargs)

"""Name -> model constructor registry (used by configs and CLI scripts)."""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn

from semanticsegmentation_tensorflow_tpu.models.deeplab import DeepLabASPP
from semanticsegmentation_tensorflow_tpu.models.fcn8s import FCN8s
from semanticsegmentation_tensorflow_tpu.models.segnet import SegNet
from semanticsegmentation_tensorflow_tpu.models.unet import UNet

MODELS: dict[str, Callable[..., nn.Module]] = {
    "fcn8s": FCN8s,
    "fcn16s": lambda **kw: FCN8s(variant=16, **kw),
    "fcn32s": lambda **kw: FCN8s(variant=32, **kw),
    "unet": UNet,
    "segnet": SegNet,
    "deeplab": DeepLabASPP,
}


def build_model(name: str, num_classes: int, **kwargs: Any) -> nn.Module:
    try:
        cls = MODELS[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; available: {sorted(MODELS)}")
    return cls(num_classes=num_classes, **kwargs)

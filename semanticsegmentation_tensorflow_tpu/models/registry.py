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


def spmd_safe_kwargs(name: str) -> dict[str, Any]:
    """Model kwargs required under a COMPILER-PARTITIONED (2-D spatial)
    mesh: XLA's SPMD partitioner cannot partition through a pallas_call,
    so models with a Pallas stage1 must fall back to the jnp pool path
    (which partitions fine). Every entry point that builds a model for a
    spatial mesh should merge these in (setdefault, so explicit user
    choices still win and get a clear partitioner error if forced)."""
    if name in ("fcn8s", "fcn16s", "fcn32s"):
        return {"pallas_pool": False, "winograd": None}
    if name == "segnet":
        return {"pallas_pool": False, "winograd": None}
    if name in ("unet", "deeplab"):
        return {"winograd": None}
    return {}

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


def padded_input_hw(model: nn.Module,
                    image_size: tuple[int, int]) -> tuple[int, int]:
    """(H, W) of ``image_size`` ceil-padded to the model's total stride —
    the device input shape every inference/eval/bench path feeds (the
    shared idiom of scripts/{test,eval,infer_image}.py and
    benchmarks/all.py)."""
    stride = getattr(model, "total_stride", 32)
    h, w = image_size
    return -(-h // stride) * stride, -(-w // stride) * stride


def spmd_safe_kwargs(name: str) -> dict[str, Any]:
    """Model kwargs required under a COMPILER-PARTITIONED (2-D spatial)
    mesh. The fused Pallas stage1 is SPMD-compatible since round 3 via
    its halo-array mode (``pallas_spmd=True``: custom_partitioning over
    row blocks — ops/pallas/stage1.py), so the 2-D mesh no longer forces
    the jnp fallback; only the Winograd kernels (no partitioning rule; a
    benchmark knob, never a default) are excluded. Every entry point that
    builds a model for a spatial mesh should merge these in (setdefault,
    so explicit user choices still win)."""
    if name in ("fcn8s", "fcn16s", "fcn32s", "segnet"):
        return {"winograd": None, "pallas_spmd": True}
    if name in ("unet", "deeplab"):
        return {"winograd": None}
    return {}


def merge_spmd_safe_kwargs(name: str, kwargs: dict[str, Any]) -> dict[str, Any]:
    """Merge :func:`spmd_safe_kwargs` into user kwargs for a spatial mesh,
    warning LOUDLY on any conflict instead of silently dropping or silently
    keeping the user's choice. The user's explicit value still wins
    (setdefault semantics) so the failure, if any, is an honest partitioner
    error preceded by a warning that names the flag."""
    import warnings

    for k, v in spmd_safe_kwargs(name).items():
        if k in kwargs and kwargs[k] != v:
            warnings.warn(
                f"model kwarg {k}={kwargs[k]!r} has no partitioning rule "
                f"under a spatially-partitioned (2-D) mesh; the SPMD-safe "
                f"value is {k}={v!r}. Keeping your explicit choice — expect "
                f"a partitioner error if this path is exercised.",
                stacklevel=2)
        kwargs.setdefault(k, v)
    return kwargs

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
    if name in ("fcn8s", "fcn16s", "fcn32s", "segnet", "deeplab"):
        return {"winograd": None, "pallas_spmd": True}
    if name == "unet":
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


def quant_safe_kwargs(name: str) -> dict[str, Any]:
    """Model kwargs that route EVERY conv through ``nn.Conv`` /
    ``nn.ConvTranspose`` so the interceptor-based int8/QAT machinery
    (infer/quant.py, flax ``intercept_methods``) can see them all.

    The packed/fused perf paths (Pallas stage1, PooledConvBlock's raw
    ``lax.conv`` blocks, FastConvTranspose, packed U-Net/SegNet stages)
    declare the SAME parameter trees but bypass the flax method boundary,
    so under the production flags only the fc/score convs quantize — the
    round-5 drive measured 5 of ~18 FCN-8s convs covered. Checkpoints are
    interchangeable either way (every packed variant mirrors nn.Conv's
    param paths/shapes/init), so quantized serving rebuilds with these and
    restores the same checkpoint."""
    if name in ("fcn8s", "fcn16s", "fcn32s"):
        return {"packed_stage1": False, "packed_stage2_entry": False,
                "deferred_pool_bias": False, "fast_upsample": False,
                "winograd": None, "winograd_fc6": False}
    if name == "segnet":
        return {"packed_stage1": False, "packed_dec1": False,
                "packed_dec2": False, "winograd": None}
    if name == "unet":
        return {"packed_stage0": False, "fast_upconv": False,
                "winograd": None}
    if name == "deeplab":
        return {"packed_stage1": False, "deferred_pool_bias": False,
                "aspp_split_proj": False, "winograd": None}
    return {}


def merge_quant_safe_kwargs(name: str, kwargs: dict[str, Any]) -> dict[str, Any]:
    """Merge :func:`quant_safe_kwargs` into user kwargs for an int8/QAT
    path (same contract as :func:`merge_spmd_safe_kwargs`: warn on
    conflict, the user's explicit value wins)."""
    import warnings

    for k, v in quant_safe_kwargs(name).items():
        if k in kwargs and kwargs[k] != v:
            warnings.warn(
                f"model kwarg {k}={kwargs[k]!r} keeps a packed/fused path "
                f"the int8/QAT interceptor cannot see; quantization will "
                f"skip those convs. The quant-safe value is {k}={v!r}. "
                f"Keeping your explicit choice.", stacklevel=2)
        kwargs.setdefault(k, v)
    return kwargs

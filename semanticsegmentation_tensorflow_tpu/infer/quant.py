"""Post-training int8 quantization for serving (TPU int8 MXU path).

The reference serves float32 TF1 graphs (SURVEY.md §3.2); it has no
quantized path. On TPU v5e the MXU executes s8 x s8 -> s32 at 2x the bf16
FLOP rate (394.5 vs 197 TOPS) and int8 weights quarter the HBM weight
traffic, so a quantized forward is the hardware-native serving fast path —
this module adds it as a pure post-training transform: no training change,
no model-code change, no new checkpoint format.

Scheme (the standard TPU-friendly symmetric recipe):

* **Weights**: per-output-channel symmetric int8. Each ``nn.Conv`` kernel
  ``[kh,kw,cin,cout]`` is replaced IN THE VARIABLES TREE by its int8
  quantization plus a ``kernel_scale`` [cout] float32 sibling
  (:func:`quantize_variables`) — the artifact/params file shrinks ~4x and
  dequantization is a per-channel multiply fused into the conv epilogue.
* **Activations**: per-tensor symmetric int8, scale calibrated offline as
  the running amax of each conv's input over calibration batches
  (:func:`calibrate_act_scales`). Scales are baked into the program as
  compile-time constants.
* **Compute**: ``lax.conv_general_dilated(x_q, k_q,
  preferred_element_type=int32)`` — exact integer arithmetic on the MXU —
  then one fused f32 rescale ``* (sx * sw[cout])`` + bias.

Routing is a ``flax.linen.intercept_methods`` interceptor over
``nn.Conv.__call__`` / ``nn.ConvTranspose.__call__`` (:func:`make_apply`),
so every model family (FCN-8s / U-Net / SegNet / DeepLab) quantizes
through ONE code path keyed only by the kernel leaf's dtype: int8 kernel
-> integer conv; float kernel -> untouched ``next_fun``. Layers that
bypass both (the packed-layout fast paths, fast_upsample's decomposed
upconv, BN) stay in bf16/f32 — partial quantization is fine: the 3x3
stacks plus the transposed-conv decoders are ~all of the FLOPs.

Convs whose input has no calibrated scale run **weight-only** quantized
(dequantize kernel, bf16 conv): the memory win without the activation
quantization error — also the safe mode when no calibration data exists.

Everything here is plain jax: the quantized apply jits, exports via
``jax.export`` (``scripts/export_model.py --int8``), and partitions under
the inference mesh unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np

import flax.core
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

PATH_SEP = "/"


def _path_key(module: nn.Module) -> str:
    return PATH_SEP.join(module.path)


def _pair(v) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _conv_supported(mod) -> bool:
    """Only the configurations this repo's models emit; anything exotic
    falls through to the float path rather than risking a semantics
    mismatch with flax's own padding/dilation handling. Covers ``nn.Conv``
    and ``nn.ConvTranspose`` (the U-Net/FCN decoder upsamplers — real
    FLOP share in U-Net)."""
    if type(mod) is nn.Conv:
        if mod.mask is not None:
            return False
        if mod.input_dilation not in (None, 1, (1, 1)):
            return False
    elif type(mod) is nn.ConvTranspose:
        if getattr(mod, "transpose_kernel", False):
            return False  # IO-flipped kernels: per-channel axis differs
    else:
        return False
    pad = mod.padding
    if isinstance(pad, str):
        return pad in ("SAME", "VALID")
    return True


def conv_paths(model: nn.Module, variables: dict,
               sample_shape: Sequence[int]) -> list[str]:
    """Module paths of every ``nn.Conv`` the forward actually calls,
    discovered by an abstract (eval_shape) trace — no FLOPs, and it
    naturally excludes ConvTranspose/packed-path layers."""
    found: list[str] = []

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _conv_supported(mod):
            key = _path_key(mod)
            if key not in found:
                found.append(key)
        return next_fun(*args, **kwargs)

    def run(v, x):
        with nn.intercept_methods(icpt):
            model.apply(v, x, train=False)
        return 0

    jax.eval_shape(run, variables,
                   jax.ShapeDtypeStruct(tuple(sample_shape), jnp.float32))
    return found


def quantize_kernel(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (q [.. ,cout] int8,
    scale [cout] f32) with ``q * scale ~= kernel`` (|err| <= scale/2)."""
    kf = jnp.asarray(kernel, jnp.float32)
    s = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(kf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_variables(model: nn.Module, variables: dict,
                       sample_shape: Sequence[int]) -> dict:
    """Variables tree with every traced ``nn.Conv`` kernel replaced by its
    int8 quantization + ``kernel_scale`` sibling. Non-kernel leaves (bias,
    BN stats, ConvTranspose kernels, packed-path params) are untouched, so
    the tree still feeds the SAME ``model`` — :func:`make_apply`'s
    interceptor routes on the kernel dtype."""
    params = flax.core.unfreeze(jax.device_get(variables["params"]))
    params = jax.tree.map(np.asarray, params)  # deep host copy to mutate
    for key in conv_paths(model, variables, sample_shape):
        node = params
        for part in key.split(PATH_SEP):
            node = node[part]
        q, s = quantize_kernel(node["kernel"])
        node["kernel"] = np.asarray(q)
        node["kernel_scale"] = np.asarray(s)
    out = flax.core.unfreeze(variables)
    out["params"] = params
    return out


def calibrate_act_scales(model: nn.Module, variables: dict,
                         batches: Iterable[np.ndarray],
                         margin: float = 1.0) -> dict[str, float]:
    """Per-tensor activation scales: ``amax(|conv input|) / 127`` over the
    calibration batches (model-input domain: normalized, padded images).
    One jitted program per input shape returns every conv's amax in a
    single device pass; the max-reduce over batches runs on host.
    ``margin`` multiplies the amax (>1 leaves clip headroom)."""

    def fwd(v, x):
        rec: dict[str, jax.Array] = {}

        def icpt(next_fun, args, kwargs, context):
            mod = context.module
            if context.method_name == "__call__" and _conv_supported(mod):
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                key = _path_key(mod)
                rec[key] = jnp.maximum(rec[key], a) if key in rec else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            model.apply(v, x, train=False)
        return rec

    jfwd = jax.jit(fwd)
    amax: dict[str, float] = {}
    n = 0
    for batch in batches:
        rec = jax.device_get(jfwd(variables, jnp.asarray(batch)))
        for k, v in rec.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {k: (v * margin) / 127.0 if v > 0 else 1.0
            for k, v in amax.items()}


def _quantized_conv(mod, x: jax.Array, act_scale: float | None
                    ) -> jax.Array:
    p = mod.variables["params"]
    kq, kscale = p["kernel"], p["kernel_scale"]
    bias = p["bias"] if mod.use_bias else None
    strides = _pair(mod.strides or 1)
    dil = _pair(mod.kernel_dilation or 1)
    pad = mod.padding
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    dn = ("NHWC", "HWIO", "NHWC")
    out_dt = mod.dtype or x.dtype
    transpose = type(mod) is nn.ConvTranspose

    def conv(lhs, rhs, **kw):
        if transpose:
            return lax.conv_transpose(lhs, rhs, strides, pad,
                                      rhs_dilation=dil,
                                      dimension_numbers=dn, **kw)
        return lax.conv_general_dilated(
            lhs, rhs, strides, pad, rhs_dilation=dil,
            dimension_numbers=dn,
            feature_group_count=mod.feature_group_count, **kw)

    if act_scale is None:
        # weight-only: dequantize, bf16 conv — no activation-quant error
        k = (kq.astype(jnp.float32) * kscale).astype(out_dt)
        y = conv(x.astype(out_dt), k).astype(jnp.float32)
    else:
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)),
                     -127, 127).astype(jnp.int8)
        y32 = conv(q, kq, preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (kscale * act_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dt)


def make_apply(model: nn.Module,
               act_scales: dict[str, float] | None = None) -> Callable:
    """``apply_fn(variables, x, train=False, **kw)`` — drop-in for
    ``model.apply`` that routes int8-kernel convs through the integer MXU
    path (per-tensor act scale from ``act_scales``; weight-only when a
    conv's path has no scale). Float-kernel convs and every other module
    run unchanged, so the same apply serves quantized AND unquantized
    trees. Plain jax: jit/export/mesh-partition like the original."""
    scales = dict(act_scales or {})

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__" and _conv_supported(mod)
                and mod.variables["params"]["kernel"].dtype == jnp.int8):
            return _quantized_conv(mod, args[0],
                                   scales.get(_path_key(mod)))
        return next_fun(*args, **kwargs)

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(icpt):
            return model.apply(variables, *args, **kwargs)

    return apply_fn


def fold_batchnorm(variables: dict, eps: float = 1e-5
                   ) -> tuple[dict, int]:
    """Fold inference-mode BatchNorm into the preceding conv's kernel/bias
    (the classic serving transform): with ``g = scale/sqrt(var+eps)``,
    ``k' = k*g``, ``b' = (b-mean)*g + bn_bias``; the BN entry is then
    neutralized (scale=1, bias=0, mean=0, var=1-eps — exactly identity
    through flax's eval-mode normalization), so the SAME model computes
    the same function with the BN reduced to a no-op.

    Pairs conv/BN siblings by this repo's naming conventions —
    ``conv{i}``/``bn{i}`` (models/common.py:ConvBlock) and
    ``{name}``/``{name}_bn`` (models/deeplab.py:ASPP) — and only folds
    when BN directly follows the conv (true for both patterns:
    conv -> bn -> relu). Returns ``(folded_variables, n_folded)``.

    Serving value: deletes the BN normalize/scale/shift work per layer,
    and gives int8 quantization a single folded kernel to scale
    per-channel (``quantize_for_inference`` folds automatically when
    batch_stats are present). Eval-mode only — training needs live BN.
    """
    if not variables.get("batch_stats"):
        return variables, 0
    out = flax.core.unfreeze(variables)
    params = jax.tree.map(np.asarray, out["params"])
    stats = jax.tree.map(np.asarray, out["batch_stats"])
    n = [0]

    def walk(pnode, snode):
        if not isinstance(pnode, dict):
            return
        for bn_name in list(pnode):
            bn_p = pnode.get(bn_name)
            bn_s = (snode or {}).get(bn_name)
            if not (isinstance(bn_p, dict) and isinstance(bn_s, dict)
                    and "scale" in bn_p and "mean" in bn_s):
                continue
            if bn_name.startswith("bn"):
                conv_name = "conv" + bn_name[2:]
            elif bn_name.endswith("_bn"):
                conv_name = bn_name[:-3]
            else:
                continue
            conv = pnode.get(conv_name)
            if not (isinstance(conv, dict) and "kernel" in conv
                    and "bias" in conv
                    and np.ndim(conv["kernel"]) >= 2
                    and conv["kernel"].dtype != np.int8
                    and conv["kernel"].shape[-1] == bn_p["scale"].shape[0]):
                continue
            g = (bn_p["scale"].astype(np.float64)
                 / np.sqrt(bn_s["var"].astype(np.float64) + eps))
            conv["kernel"] = (conv["kernel"].astype(np.float64) * g
                              ).astype(conv["kernel"].dtype)
            conv["bias"] = (
                (conv["bias"].astype(np.float64) - bn_s["mean"]) * g
                + bn_p["bias"]).astype(conv["bias"].dtype)
            bn_p["scale"] = np.ones_like(bn_p["scale"])
            bn_p["bias"] = np.zeros_like(bn_p["bias"])
            bn_s["mean"] = np.zeros_like(bn_s["mean"])
            bn_s["var"] = np.full_like(bn_s["var"], 1.0 - eps)
            n[0] += 1
        for k, v in pnode.items():
            if isinstance(v, dict):
                walk(v, (snode or {}).get(k))

    walk(params, stats)
    out["params"], out["batch_stats"] = params, stats
    return out, n[0]


def _ste(x: jax.Array, quantized: jax.Array) -> jax.Array:
    """Straight-through estimator: forward = ``quantized``, gradient =
    identity w.r.t. ``x`` (the standard QAT trick — the rounding step
    function has zero gradient almost everywhere, so we pass the
    upstream gradient through unchanged)."""
    return x + lax.stop_gradient(quantized - x)


def make_fake_quant_apply(model: nn.Module,
                          act_scales: dict[str, float]) -> Callable:
    """Quantization-AWARE-training apply: drop-in for ``model.apply`` that
    fake-quantizes every supported conv's weights (per-output-channel
    int8 grid, recomputed from the live f32 params each step) and inputs
    (per-tensor grid at the calibrated scale) with straight-through
    gradients — the forward sees exactly the int8 serving grid, the
    backward trains the underlying f32 weights.

    Train with this as ``TrainState.apply_fn`` (``scripts/train.py
    --qat``), then export/serve the SAME scales via the PTQ path
    (:func:`quantize_variables` + :func:`make_apply`): the deployed int8
    program computes the product the training forward saw (up to f32
    rounding of the dequantized operands). Operates on FLOAT kernels —
    the complement of :func:`make_apply`'s int8 routing."""
    scales = dict(act_scales or {})

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if not (context.method_name == "__call__" and _conv_supported(mod)
                and mod.variables["params"]["kernel"].dtype != jnp.int8):
            return next_fun(*args, **kwargs)
        p = mod.variables["params"]
        k = p["kernel"].astype(jnp.float32)
        kq, ks = quantize_kernel(k)
        k_fq = _ste(k, kq.astype(jnp.float32) * ks)
        x = args[0]
        sx = scales.get(_path_key(mod))
        if sx is not None:
            xf = x.astype(jnp.float32)
            xq = jnp.clip(jnp.round(xf * (1.0 / sx)), -127, 127) * sx
            x = _ste(xf, xq)
        strides = _pair(mod.strides or 1)
        dil = _pair(mod.kernel_dilation or 1)
        pad = mod.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        dn = ("NHWC", "HWIO", "NHWC")
        out_dt = mod.dtype or args[0].dtype
        if type(mod) is nn.ConvTranspose:
            y = lax.conv_transpose(x.astype(out_dt), k_fq.astype(out_dt),
                                   strides, pad, rhs_dilation=dil,
                                   dimension_numbers=dn)
        else:
            y = lax.conv_general_dilated(
                x.astype(out_dt), k_fq.astype(out_dt), strides, pad,
                rhs_dilation=dil, dimension_numbers=dn,
                feature_group_count=mod.feature_group_count)
        if mod.use_bias:
            y = y.astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(out_dt)

    def apply_fn(variables, *args, **kwargs):
        with nn.intercept_methods(icpt):
            return model.apply(variables, *args, **kwargs)

    return apply_fn


def save_act_scales(path: str, scales: dict[str, float]) -> None:
    """Persist calibrated activation scales (JSON) next to a checkpoint so
    QAT resume / int8 export reuse the EXACT training grid."""
    import json

    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> dict[str, float]:
    import json

    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}


def warn_qat_fp_eval(checkpoint_dir: str, int8: bool, *,
                     verb: str = "evaluating", file=None) -> bool:
    """Warn when a QAT-trained checkpoint is about to run in fp.

    Measured on-chip (2026-08-19, same checkpoint): fp eval of a
    ``--qat``-trained checkpoint hit loss=455.6 while the ``--int8`` eval
    (scales applied) read 0.6901 — training under activation fake-quant
    clamps lets unclamped fp activations drift to huge logit magnitudes.
    Expected behavior, but silent without this warning. Returns True iff
    the warning fired (``qat_scales.json`` present and ``int8`` False).
    """
    import os
    import sys

    if int8 or not os.path.exists(
            os.path.join(checkpoint_dir, "qat_scales.json")):
        return False
    print(f"warning: checkpoint was trained with --qat "
          f"(qat_scales.json present); {verb} WITHOUT --int8 removes "
          f"the activation clamps the model was trained under and can "
          f"inflate the loss", file=file if file is not None else sys.stderr)
    return True


def calib_batches_from_files(paths: Sequence[str],
                             image_size: tuple[int, int],
                             mean: Sequence[float], std: Sequence[float],
                             stride: int = 32,
                             batch: int = 4) -> list[np.ndarray]:
    """Load image files into normalized, stride-padded model-input batches
    — the same preprocessing Predictor's logits_fn applies (predict.py:70)
    so the calibrated ranges match serving exactly."""
    from semanticsegmentation_tensorflow_tpu.data.augment import (
        normalize_images,
    )
    from semanticsegmentation_tensorflow_tpu.data.kitti import load_image
    from semanticsegmentation_tensorflow_tpu.ops.shape import (
        pad_to_multiple,
    )

    out = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([load_image(p, image_size)
                         for p in paths[i:i + batch]])
        x = normalize_images(jnp.asarray(imgs), mean, std)
        out.append(np.asarray(pad_to_multiple(x, stride)))
    return out


def quantize_for_inference(model: nn.Module, variables: dict,
                           calib_batches: Iterable[np.ndarray] | None,
                           sample_shape: Sequence[int],
                           margin: float = 1.0,
                           act_scales: dict[str, float] | None = None,
                           ) -> tuple[dict, Callable, dict[str, float]]:
    """One-call PTQ: returns ``(qvariables, apply_fn, act_scales)``.

    ``calib_batches``: normalized model-input arrays (what the model's
    ``__call__`` sees); ``None`` -> weight-only quantization. Feed
    ``apply_fn``/``qvariables`` to :class:`infer.predict.Predictor`
    (``apply_fn=``), :func:`infer.export.export_model`, or a
    ``TrainState.replace(params=..., apply_fn=...)`` for quantized eval.
    ``act_scales`` (e.g. a QAT run's persisted grid,
    :func:`load_act_scales`) skips calibration and uses the given scales
    verbatim.
    """
    # fold BN FIRST so calibration sees (and the int8 grid scales) the
    # folded kernels — BN rescaling would otherwise sit outside the
    # per-channel weight quantization
    variables, _ = fold_batchnorm(variables)
    if act_scales is not None:
        scales = dict(act_scales)
    else:
        scales = (calibrate_act_scales(model, variables, calib_batches,
                                       margin)
                  if calib_batches is not None else {})
    qvars = quantize_variables(model, variables, sample_shape)
    return qvars, make_apply(model, scales), scales

"""AOT serving artifacts: ``jax.export`` (StableHLO) + params in one file.

The reference deploys by shipping model-definition Python + a checkpoint
and re-tracing at load (SURVEY.md §3.2's build-the-graph-then-restore
pattern). The TPU-native deployment unit is instead an **ahead-of-time
exported program**: the jitted inference function lowered to versioned
StableHLO once, at export time, so the serving host needs *no model code*
— it deserializes bytes and calls. ``jax.export`` guarantees forward
compatibility windows on the serialized module, and a single artifact can
carry lowerings for several platforms (we default to ``("cpu", "tpu")``:
export on any dev box, deploy to TPU serving, smoke-test the same bytes
on CPU).

Artifact layout (a zip, extension ``.segx``):

    meta.json            format version, image size, num classes, the
                         exported entry names, platforms, batch mode
    params.msgpack       flax-serialized inference variables
    fn_labels.jaxexport  serialized Exported: (variables, u8 image) -> label map
    fn_overlay.jaxexport serialized Exported: (variables, u8 image) ->
                         (overlay u8, label map) — palette/alpha baked in

Params ride OUTSIDE the exported functions (as the first call argument) for
the same reason ``Predictor`` passes them as a jit argument: baked-in
weights become HLO constants (a 353 MB executable for fc4096 — measured,
predict.py:105) and defeat compile caching.

Batch dimension: exported SYMBOLIC (``jax.export.symbolic_shape``) when the
model traces under a polymorphic batch — one artifact serves any batch
size; models/ops that refuse symbolic tracing fall back to a fixed batch
recorded in ``meta.json``.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Sequence

import numpy as np

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp
from jax import export as jax_export

from semanticsegmentation_tensorflow_tpu.data.augment import normalize_images
from semanticsegmentation_tensorflow_tpu.data.palette import KITTI_OVERLAY_PALETTE
from semanticsegmentation_tensorflow_tpu.ops.overlay import argmax_colormap_overlay
from semanticsegmentation_tensorflow_tpu.ops.shape import pad_to_multiple, crop_to

FORMAT = "segx-1"
_LABEL_ENTRY = "fn_labels.jaxexport"
_OVERLAY_ENTRY = "fn_overlay.jaxexport"


def _build_fns(model: nn.Module, image_size, mean, std, palette, alpha,
               apply_fn=None):
    """The same device programs Predictor jits (predict.py:70-88), built
    here for export so artifact serving is bit-identical to in-process
    serving. ``apply_fn`` swaps the forward (e.g. the int8 interceptor
    apply from infer/quant.make_apply) — the artifact then carries the
    QUANTIZED program + int8 weights (~4x smaller)."""
    stride = getattr(model, "total_stride", 32)
    pal = jnp.asarray(palette)
    mean = tuple(mean)
    std = tuple(std)
    apply = apply_fn if apply_fn is not None else model.apply

    def logits_fn(variables, image_u8):
        x = normalize_images(image_u8, mean, std)
        x = pad_to_multiple(x, stride)
        logits = apply(variables, x, train=False)
        return crop_to(logits, *image_size)

    def fn_labels(variables, image_u8):
        logits = logits_fn(variables, image_u8)
        label_dt = jnp.uint8 if logits.shape[-1] <= 256 else jnp.int32
        return jnp.argmax(logits, axis=-1).astype(label_dt)

    def fn_overlay(variables, image_u8):
        return argmax_colormap_overlay(image_u8, logits_fn(variables, image_u8),
                                       pal, alpha)

    return fn_labels, fn_overlay


def export_model(model: nn.Module, variables: dict,
                 image_size: tuple[int, int], path: str,
                 mean: Sequence[float] = (123.68, 116.779, 103.939),
                 std: Sequence[float] = (58.393, 57.12, 57.375),
                 overlay_palette: np.ndarray = KITTI_OVERLAY_PALETTE,
                 alpha: float = 0.5,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 batch_size: int | None = None,
                 num_classes: int | None = None,
                 apply_fn=None) -> dict:
    """Write a ``.segx`` serving artifact; returns its meta dict.

    ``batch_size=None`` attempts a symbolic ("b")-batch export first and
    falls back to batch 1; an int pins the batch (some fused kernels need
    static batch tiles).
    """
    h, w = image_size
    fn_labels, fn_overlay = _build_fns(model, image_size, mean, std,
                                       overlay_palette, alpha, apply_fn)
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)

    def _try(batch) -> tuple[bytes, bytes, str]:
        img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
        exp = jax_export.export(jax.jit(fn_labels), platforms=tuple(platforms))
        lab = exp(var_specs, img).serialize()
        exp = jax_export.export(jax.jit(fn_overlay), platforms=tuple(platforms))
        ove = exp(var_specs, img).serialize()
        return lab, ove

    batch_mode = "fixed"
    if batch_size is None:
        try:
            (b,) = jax_export.symbolic_shape("b")
            lab, ove = _try(b)
            batch_mode = "symbolic"
        except Exception:
            batch_size = 1
    if batch_mode != "symbolic":
        lab, ove = _try(batch_size)

    if num_classes is None:
        fwd = apply_fn if apply_fn is not None else model.apply
        num_classes = int(jax.eval_shape(
            lambda v, x: fwd(v, x, train=False), var_specs,
            jax.ShapeDtypeStruct((1, *_pad_hw(image_size, model), 3),
                                 jnp.float32)).shape[-1])

    meta = {
        "format": FORMAT,
        "image_size": [h, w],
        "num_classes": num_classes,
        "platforms": list(platforms),
        "batch_mode": batch_mode,
        "batch_size": None if batch_mode == "symbolic" else batch_size,
        "entries": {"labels": _LABEL_ENTRY, "overlay": _OVERLAY_ENTRY},
        # for host-side compositing (scripts/serve.py's packed-fetch path):
        # the same palette/alpha the baked-in overlay fn uses
        "overlay_palette": np.asarray(overlay_palette).tolist(),
        "alpha": alpha,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("params.msgpack", flax.serialization.to_bytes(variables))
        z.writestr(_LABEL_ENTRY, lab)
        z.writestr(_OVERLAY_ENTRY, ove)
    return meta


def _pad_hw(image_size, model):
    stride = getattr(model, "total_stride", 32)
    h, w = image_size
    return (-(-h // stride) * stride, -(-w // stride) * stride)


class ExportedPredictor:
    """Serve from a ``.segx`` artifact — no model code, no re-trace.

    API mirrors :class:`Predictor`: ``__call__`` returns (overlay, labels)
    for [H,W,3] or [N,H,W,3] uint8 input; ``labels()`` returns the label
    map alone (12x less fetch traffic). Fixed-batch artifacts pad ragged
    batches by repetition, exactly like mesh Predictor does.
    """

    def __init__(self, path: str):
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            if self.meta.get("format") != FORMAT:
                raise ValueError(
                    f"{path}: unknown artifact format "
                    f"{self.meta.get('format')!r} (want {FORMAT!r})")
            params_bytes = z.read("params.msgpack")
            self._fn_labels = jax_export.deserialize(
                z.read(self.meta["entries"]["labels"]))
            self._fn_overlay = jax_export.deserialize(
                z.read(self.meta["entries"]["overlay"]))
        # the msgpack tree restores as raw nested dicts — exactly the
        # {"params": ..., ...} structure the exported fns expect
        self._variables = flax.serialization.msgpack_restore(
            bytearray(params_bytes))
        self._variables = jax.tree.map(jnp.asarray, self._variables)
        self.image_size = tuple(self.meta["image_size"])
        # duck-type the Predictor surface scripts/serve.py drives
        self._palette = np.asarray(self.meta["overlay_palette"], np.uint8)
        self._alpha = float(self.meta["alpha"])

    def _batched(self, fn, image_u8: np.ndarray):
        squeeze = image_u8.ndim == 3
        if squeeze:
            image_u8 = image_u8[None]
        n_real = image_u8.shape[0]
        fixed = self.meta["batch_size"]
        if fixed is not None:
            if n_real > fixed:
                raise ValueError(
                    f"fixed-batch artifact (batch {fixed}) got {n_real}")
            if n_real < fixed:
                image_u8 = np.concatenate(
                    [image_u8,
                     np.repeat(image_u8[-1:], fixed - n_real, axis=0)])
        out = fn(self._variables, jnp.asarray(image_u8))
        trim = (lambda a: np.asarray(a)[:n_real][0] if squeeze
                else np.asarray(a)[:n_real])
        return jax.tree.map(trim, out)

    def __call__(self, image_u8: np.ndarray):
        return self._batched(self._fn_overlay.call, image_u8)

    def labels(self, image_u8: np.ndarray) -> np.ndarray:
        return self._batched(self._fn_labels.call, image_u8)

    # Predictor-compatible alias (serve.py fetches the label map and
    # composites on host; the packed wire format is an in-process
    # optimization that doesn't apply to an AOT artifact)
    def _fetch_labels(self, image_u8: np.ndarray) -> np.ndarray:
        return self.labels(np.asarray(image_u8))

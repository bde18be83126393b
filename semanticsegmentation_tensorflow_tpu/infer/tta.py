"""Test-time augmentation: horizontal-flip + multi-scale probability
averaging for eval/serving.

The reference evaluates a single forward pass per image (SURVEY.md §3.2);
flip + multi-scale averaging is the standard segmentation eval protocol
(the DeepLab/PSPNet papers' "MS+Flip" rows) and a capability extension
here. TPU-first shape discipline: every (scale, flip) variant is a
STATICALLY-shaped branch of one jitted program — scales are Python floats
resolved to static resize targets at trace time, so XLA sees a fixed DAG
of convs (no dynamic shapes), and the whole ensemble fuses into one
device program. Probabilities (not logits) are averaged, the usual
convention, after bilinear-resizing each variant's logits back to the
input grid.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.ops.shape import pad_to_multiple, crop_to


def _scale_hw(h: int, w: int, scale: float, stride: int) -> tuple[int, int]:
    """Static target size for a scale: >= 1 stride tile, rounded."""
    return (max(stride, int(round(h * scale / stride)) * stride),
            max(stride, int(round(w * scale / stride)) * stride))


def make_tta_logits_fn(model, scales: Sequence[float] = (1.0,),
                       flip: bool = True, apply_fn=None) -> Callable:
    """Build ``(variables, x_normalized) -> mean class probabilities``.

    ``x_normalized``: [N, H, W, 3] float (already normalized). Returns
    [N, H, W, num_classes] — the softmax average over every (scale, flip)
    variant, each computed at a stride-aligned scaled resolution and
    bilinearly resized back. Shapes are read at TRACE time from the
    input, so one builder serves any (static) batch geometry.
    """
    stride = getattr(model, "total_stride", 32)
    scales = tuple(float(s) for s in scales) or (1.0,)
    # apply_fn: drop-in for model.apply (e.g. infer/quant.make_apply's
    # int8 interceptor) — every (scale, flip) variant runs through it
    apply = apply_fn if apply_fn is not None else model.apply

    def logits_at(variables, x):
        xp = pad_to_multiple(x, stride)
        return crop_to(apply(variables, xp, train=False),
                       x.shape[1], x.shape[2])

    def fn(variables, x):
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        total = None
        for s in scales:
            if s == 1.0:
                xs = x
            else:
                sh, sw = _scale_hw(h, w, s, stride)
                xs = jax.image.resize(x, (n, sh, sw, x.shape[-1]),
                                      method="bilinear")
            variants = [xs] + ([xs[:, :, ::-1, :]] if flip else [])
            for i, xv in enumerate(variants):
                lg = logits_at(variables, xv)
                if i == 1:  # un-flip the flipped variant's predictions
                    lg = lg[:, :, ::-1, :]
                p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
                if p.shape[1:3] != (h, w):
                    p = jax.image.resize(p, (n, h, w, p.shape[-1]),
                                         method="bilinear")
                total = p if total is None else total + p
        return total / (len(scales) * (2 if flip else 1))

    return fn


def make_tta_eval_step(model, num_classes: int,
                       scales: Sequence[float] = (1.0,),
                       flip: bool = True, mesh=None,
                       road_hist: bool = False, apply_fn=None) -> Callable:
    """Eval step with TTA: ``(state, batch) -> {loss, cm, pred[, road_hist]}``.

    Drop-in for :func:`train.step.make_eval_step` (same mesh modes, same
    exact masked-sum metric semantics — the confusion matrix psums across
    shards, so sharded == single-device); ``loss`` is the ensemble's NLL
    (cross-entropy of the AVERAGED probabilities), reducing to the plain
    eval loss at scales=(1.0,)/flip=False. ``road_hist=True`` (binary
    models) adds the [2, 256] KITTI-road confidence histogram of the
    ENSEMBLE probabilities (see train/step.py:make_eval_step).
    """
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from semanticsegmentation_tensorflow_tpu.parallel.mesh import DATA_AXIS
    from semanticsegmentation_tensorflow_tpu.train.metrics import (
        binary_confidence_histogram, confusion_matrix,
    )

    if road_hist and num_classes != 2:
        raise ValueError("road_hist needs a binary (num_classes=2) model")
    tta_fn = make_tta_logits_fn(model, scales, flip, apply_fn)

    def body(state, batch, axis):
        variables = {"params": state.params}
        if jax.tree.leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        probs = tta_fn(variables, batch["image"])
        preds = jnp.argmax(probs, axis=-1)
        cm = confusion_matrix(batch["label"], preds, num_classes,
                              batch.get("valid"))
        extra = {}
        if road_hist:
            extra["road_hist"] = binary_confidence_histogram(
                probs[..., 1], batch["label"] == 1, batch.get("valid"))
        # ensemble NLL in masked-sum form (train/loss.py convention)
        logp = jnp.log(jnp.maximum(probs, 1e-30))
        onehot = jax.nn.one_hot(batch["label"], num_classes,
                                dtype=logp.dtype)
        ce = -jnp.sum(onehot * logp, axis=-1)
        valid = batch.get("valid")
        if valid is not None:
            ce = ce * valid.astype(ce.dtype)
            valid_sum = jnp.sum(valid.astype(jnp.float32))
        else:
            valid_sum = jnp.asarray(float(ce.size), jnp.float32)
        ce_sum = jnp.sum(ce)
        if axis is not None:
            cm = lax.psum(cm, axis)
            ce_sum = lax.psum(ce_sum, axis)
            valid_sum = lax.psum(valid_sum, axis)
            if road_hist:
                extra["road_hist"] = lax.psum(extra["road_hist"], axis)
        loss = ce_sum / jnp.maximum(valid_sum, 1.0)
        return {"loss": loss, "cm": cm, "pred": preds, **extra}

    if mesh is None:
        return jax.jit(lambda s, b: body(s, b, None))
    out_specs = {"loss": P(), "cm": P(), "pred": P(DATA_AXIS)}
    if road_hist:
        out_specs["road_hist"] = P()
    sharded = jax.shard_map(
        lambda s, b: body(s, b, DATA_AXIS), mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)

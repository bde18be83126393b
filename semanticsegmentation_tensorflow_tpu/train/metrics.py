"""Segmentation metrics: jit-friendly confusion matrix -> mIoU / pixel acc.

The reference prints only the loss; BASELINE.json makes mIoU parity a target,
so the framework owns the metric. The confusion matrix is computed as a
bincount over ``true * C + pred`` — one pass, integer math, no host sync; it
accumulates across steps as a plain [C, C] array inside the jitted eval step
(and psum-reduces across the data mesh axis when sharded).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def confusion_matrix(
    true_labels: jax.Array,
    pred_labels: jax.Array,
    num_classes: int,
    valid_mask: jax.Array | None = None,
    impl: str = "auto",
) -> jax.Array:
    """[C, C] counts, rows = true class, cols = predicted class.

    TPU-native formulation: the obvious ``bincount(true*C+pred)`` is a
    scatter-add — measured at ~37 ms/step for 3.8M pixels on v5e (~30% of an
    FCN-8s train step). Instead build one-hots and contract them on the MXU:
    ``cm = onehot(true)^T @ onehot(pred)``. One-hot values are exact in bf16
    and the f32 accumulation is exact for < 2^24 pixels per entry, so counts
    stay integer-exact while the op becomes a single dense matmul.

    ``impl``: 'matmul' (the one-hot contraction), 'direct' (C^2 fused
    compare-and-reduce passes — no one-hot materialization, no 2/128-lane
    MXU tile waste at tiny C; candidate for the ~4 ms metrics excess in the
    round-3 SegNet profile, only sensible for small C), or 'auto'
    (currently matmul; flipped per-measurement once A/B'd on the chip).
    """
    t = true_labels.reshape(-1)
    p = pred_labels.reshape(-1)
    v = None if valid_mask is None else valid_mask.reshape(-1)

    if impl == "auto":
        # SEG_CM_IMPL lets the bench harness A/B the two forms without a
        # code edit (safe: both are integer-exact and equality-tested —
        # unlike WINOGRAD_ABLATE this cannot corrupt results). The
        # measured winner for small C becomes the hard-coded auto rule.
        import os

        impl = os.environ.get("SEG_CM_IMPL", "matmul")
        if impl != "matmul":
            import sys

            print(f"confusion_matrix: SEG_CM_IMPL={impl!r} override active",
                  file=sys.stderr)
    if impl == "direct":
        ti = [t == i for i in range(num_classes)]
        if v is not None:
            vb = v.astype(bool)
            ti = [x & vb for x in ti]
        pj = [p == j for j in range(num_classes)]
        return jnp.stack([
            jnp.stack([jnp.sum(a & b, dtype=jnp.int32) for b in pj])
            for a in ti])

    def contract(t, p, v):
        t1h = jax.nn.one_hot(t, num_classes, dtype=jnp.bfloat16)  # [P, C]
        p1h = jax.nn.one_hot(p, num_classes, dtype=jnp.bfloat16)
        if v is not None:
            t1h = t1h * v.reshape(-1, 1).astype(jnp.bfloat16)
        cm = jax.lax.dot_general(
            t1h, p1h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return cm.astype(jnp.int32)

    # f32 accumulation is exact only while each CM entry stays < 2^24; a
    # single call can violate that (e.g. batch 16 at 1024x2048 dominated by
    # one class), so chunk the contraction and accumulate the per-chunk
    # counts in int32. Shapes are static, so this unrolls at trace time
    # (at most a handful of chunks).
    limit = 1 << 23  # half the exactness bound, for headroom
    if t.size <= limit:
        return contract(t, p, v)
    n_chunks = -(-t.size // limit)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    for i in range(n_chunks):
        sl = slice(i * limit, min((i + 1) * limit, t.size))
        cm = cm + contract(t[sl], p[sl], None if v is None else v[sl])
    return cm


def iou_from_confusion(cm: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Returns (per-class IoU [C], mIoU over classes present in true or pred)."""
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1) - tp
    iou = jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), 0.0)
    present = (denom > 0).astype(iou.dtype)
    miou = jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)
    return iou, miou


class SegMetrics(NamedTuple):
    """Accumulating metric state — a pytree, safe to carry through jit."""

    cm: jax.Array          # [C, C] int32
    loss_sum: jax.Array    # scalar f32
    count: jax.Array       # scalar int32 (steps)

    @classmethod
    def zero(cls, num_classes: int) -> "SegMetrics":
        return cls(cm=jnp.zeros((num_classes, num_classes), jnp.int32),
                   loss_sum=jnp.zeros((), jnp.float32),
                   count=jnp.zeros((), jnp.int32))

    def update(self, cm: jax.Array, loss: jax.Array) -> "SegMetrics":
        return SegMetrics(self.cm + cm.astype(jnp.int32),
                          self.loss_sum + loss, self.count + 1)

    def summary(self) -> dict[str, jax.Array]:
        iou, miou = iou_from_confusion(self.cm)
        total = jnp.maximum(self.cm.sum(), 1)
        acc = jnp.diag(self.cm).sum() / total
        return {
            "loss": self.loss_sum / jnp.maximum(self.count, 1),
            "miou": miou,
            "pixel_acc": acc,
            "iou": iou,
        }

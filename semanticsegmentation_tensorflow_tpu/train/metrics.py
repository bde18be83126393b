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


def binary_confidence_histogram(
    prob_fg: jax.Array,
    gt_fg: jax.Array,
    valid_mask: jax.Array | None = None,
    bins: int = 256,
) -> jax.Array:
    """[2, bins] int32 counts of foreground-confidence bins, split by GT.

    Row 0 counts GT-background pixels, row 1 GT-foreground pixels; column
    ``b`` counts pixels whose confidence falls in bin ``b = clip(floor(
    prob * bins), 0, bins-1)`` — the uint8-confidence-map quantization the
    KITTI road devkit evaluates at (its threshold sweep is ``k/255`` over a
    uint8 map). The full threshold sweep (TP/FP/FN/TN at every cutoff)
    reduces to suffix sums of these two histograms, so the device-side work
    is ONE pass, jit-friendly, and psum-able across a data mesh exactly
    like the confusion matrix.

    TPU-native formulation mirrors :func:`confusion_matrix`'s MXU trick:
    ``hist = onehot(gt)^T @ onehot(bin)`` — one-hot values are exact in
    bf16 and f32 accumulation is exact below 2^24 per entry, so the counts
    are integer-exact (chunked to keep each partial under the bound).
    """
    p = prob_fg.reshape(-1)
    g = gt_fg.reshape(-1)
    v = None if valid_mask is None else valid_mask.reshape(-1)
    b = jnp.clip(jnp.floor(p.astype(jnp.float32) * bins), 0, bins - 1
                 ).astype(jnp.int32)

    def contract(b, g, v):
        g1h = jax.nn.one_hot(g.astype(jnp.int32), 2, dtype=jnp.bfloat16)
        b1h = jax.nn.one_hot(b, bins, dtype=jnp.bfloat16)
        if v is not None:
            g1h = g1h * v.reshape(-1, 1).astype(jnp.bfloat16)
        hist = jax.lax.dot_general(
            g1h, b1h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return hist.astype(jnp.int32)

    limit = 1 << 23  # same exactness headroom as confusion_matrix
    if b.size <= limit:
        return contract(b, g, v)
    n_chunks = -(-b.size // limit)
    hist = jnp.zeros((2, bins), jnp.int32)
    for i in range(n_chunks):
        sl = slice(i * limit, min((i + 1) * limit, b.size))
        hist = hist + contract(b[sl], g[sl], None if v is None else v[sl])
    return hist


def kitti_road_metrics(hist) -> dict[str, float]:
    """KITTI road devkit measures from a [2, bins] confidence histogram.

    Host-side (numpy) finish of :func:`binary_confidence_histogram`. For
    every threshold ``tau_k = k / bins`` (predict road iff confidence bin
    >= k, k = 0..bins), the suffix sums of the histogram give the exact
    TP/FP counts of the quantized confidence map; from those:

    * ``maxf``  — the devkit's headline: max F1 over the threshold sweep;
    * ``ap``    — 11-point interpolated average precision (PASCAL
      convention, as in the devkit: mean over r in {0, .1, .., 1} of the
      max precision at recall >= r);
    * ``precision`` / ``recall`` / ``fpr`` / ``fnr`` / ``threshold`` — the
      working point where F1 peaks.

    Degenerate inputs (no positive or no valid pixels) return zeros rather
    than NaN.
    """
    import numpy as np

    hist = np.asarray(jax.device_get(hist), np.int64)
    neg, pos = hist[0], hist[1]
    n_pos, n_neg = int(pos.sum()), int(neg.sum())
    bins = hist.shape[1]
    if n_pos == 0 or (n_pos + n_neg) == 0:
        return {k: 0.0 for k in ("maxf", "ap", "precision", "recall",
                                 "fpr", "fnr", "threshold")}
    # tp[k] / fp[k]: counts predicted road at threshold k/bins (bin >= k);
    # k = bins (predict nothing) closes the PR curve at recall 0.
    tp = np.concatenate([np.cumsum(pos[::-1])[::-1], [0]]).astype(np.float64)
    fp = np.concatenate([np.cumsum(neg[::-1])[::-1], [0]]).astype(np.float64)
    fn = n_pos - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = tp / n_pos
        f1 = np.where(precision + recall > 0,
                      2 * precision * recall / (precision + recall), 0.0)
    k = int(np.argmax(f1))
    fpr = float(fp[k] / n_neg) if n_neg else 0.0
    fnr = float(fn[k] / n_pos)
    ap = float(np.mean([precision[recall >= r].max(initial=0.0)
                        for r in np.linspace(0.0, 1.0, 11)]))
    return {
        "maxf": float(f1[k]),
        "ap": ap,
        "precision": float(precision[k]),
        "recall": float(recall[k]),
        "fpr": fpr,
        "fnr": fnr,
        "threshold": k / bins,
    }


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

"""Per-pixel softmax cross-entropy (the reference's only loss).

The reference reshapes logits to (-1, num_classes) and calls
tf.nn.softmax_cross_entropy_with_logits (SURVEY.md §2 row 6). Same math here,
kept in NHWC without the reshape (XLA doesn't care) and with an optional
validity mask so padded pixels (1242x375 -> 1248x384 alignment padding) and
ignore-label pixels contribute zero loss and zero gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def softmax_cross_entropy_sum(
    logits: jax.Array,
    labels_onehot: jax.Array,
    valid_mask: jax.Array | None = None,
    class_weights: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(sum of masked per-pixel CE, number of valid pixels).

    The un-normalized form exists so SPMD callers can normalize GLOBALLY:
    ``psum(ce_sum) / psum(valid_sum)`` is the exact global masked mean even
    when shards carry different valid-pixel counts (KITTI ignore regions,
    wrap-padded tails) — whereas pmean of per-shard means over-weights
    pixels on sparse shards.

    Args:
      logits:        [N, H, W, C] float32.
      labels_onehot: [N, H, W, C] one-hot (or soft) targets.
      valid_mask:    optional [N, H, W] {0,1}; invalid pixels contribute 0.
      class_weights: optional [C] per-class loss weights (e.g.
        :func:`median_frequency_weights` — the SegNet paper's class
        balancing). Each pixel's CE is scaled by its TRUE class's weight;
        the returned count stays the unweighted valid-pixel count (the
        Eigen & Fergus convention: weighted sum / pixel count), so
        ``class_weights=None`` and all-ones are bit-identical.
    """
    ce = optax.softmax_cross_entropy(logits, labels_onehot)  # [N, H, W]
    if class_weights is not None:
        w = jnp.asarray(class_weights, ce.dtype)
        # expected weight under the target distribution == w[label] for
        # one-hot targets, and stays well-defined for soft targets
        ce = ce * jnp.sum(labels_onehot * w, axis=-1)
    if valid_mask is None:
        return jnp.sum(ce), jnp.asarray(ce.size, ce.dtype)
    valid = valid_mask.astype(ce.dtype)
    return jnp.sum(ce * valid), jnp.sum(valid)


def focal_loss_sum(
    logits: jax.Array,
    labels_onehot: jax.Array,
    valid_mask: jax.Array | None = None,
    class_weights: jax.Array | None = None,
    gamma: float = 2.0,
) -> tuple[jax.Array, jax.Array]:
    """Focal loss (Lin et al.) in the same masked-SUM form as
    :func:`softmax_cross_entropy_sum` — ``-(1-p_t)^gamma log(p_t)`` per
    pixel — so every SPMD/grad-accum exactness property carries over
    unchanged (psum the sums, one global divide). ``gamma=0`` reduces to
    plain CE bit-for-bit (the modulating factor becomes exactly 1.0).
    Road scenes are heavily class-imbalanced; focal loss down-weights the
    easy dominant-class pixels instead of (or on top of) the
    median-frequency class weighting."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.sum(labels_onehot * logp, axis=-1)  # [N, H, W]
    f = -logpt
    if gamma:
        f = f * (1.0 - jnp.exp(logpt)) ** gamma
    if class_weights is not None:
        w = jnp.asarray(class_weights, f.dtype)
        f = f * jnp.sum(labels_onehot * w, axis=-1)
    if valid_mask is None:
        return jnp.sum(f), jnp.asarray(f.size, f.dtype)
    valid = valid_mask.astype(f.dtype)
    return jnp.sum(f * valid), jnp.sum(valid)


def softmax_cross_entropy_sum_cmajor(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    valid_mask: jax.Array | None = None,
    class_weights: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Integer-label CE sum computed in CLASS-MAJOR ([N, C, H, W]) form.

    Same per-pixel math as :func:`softmax_cross_entropy_sum` on the one-hot
    of ``labels`` — but every full-resolution elementwise/reduce pass runs
    with W in the 128-lane dimension instead of C. With C-minor logits at
    tiny C (KITTI C=2 pads to a T(2,128)/T(4,128) tiling = 2-3% lane use),
    the round-5 SegNet profile measured ~10 ms/step in this chain; the
    class-major form's C full-lane passes over [N, H, W] are ~25x less
    vector work. Gated by ``SEG_LOSS_IMPL`` (train/step.py) pending the
    on-chip A/B — per-pixel values match to f32 roundoff, and the pixel
    one-hot never materializes.
    """
    z = jnp.moveaxis(logits, -1, 1)                       # [N, C, H, W]
    m = jnp.max(z, axis=1)                                # [N, H, W]
    lse = m + jnp.log(jnp.sum(jnp.exp(z - m[:, None]), axis=1))
    cls = jnp.arange(num_classes, dtype=labels.dtype)
    sel = labels[:, None] == cls[None, :, None, None]     # [N, C, H, W] pred
    z_at = jnp.sum(jnp.where(sel, z, 0), axis=1)          # logit[label]
    ce = lse - z_at                                       # [N, H, W]
    if class_weights is not None:
        w = jnp.asarray(class_weights, ce.dtype)
        w_at = jnp.sum(jnp.where(sel, w[None, :, None, None], 0), axis=1)
        ce = ce * w_at
    if valid_mask is None:
        return jnp.sum(ce), jnp.asarray(ce.size, ce.dtype)
    valid = valid_mask.astype(ce.dtype)
    return jnp.sum(ce * valid), jnp.sum(valid)


def softmax_cross_entropy_sum_binary(
    logits: jax.Array,
    labels: jax.Array,
    valid_mask: jax.Array | None = None,
    class_weights: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Integer-label CE sum for the BINARY (C==2) case, in full-lane
    PLANE form: every elementwise/reduce pass runs on [N, H, W] arrays
    (W in the 128-lane dimension) instead of C-minor [N, H, W, 2]
    T(2,128) tilings (2/128 lane use — the ~13 ms/step loss+argmax
    chain in the round-5 SegNet b8 profile).

    The reformulation: with d = logit1 - logit0,

        lse(l0, l1) = l0 + softplus(d)
        CE = lse - logit[label] = softplus(d) - y * d,   y = (label == 1)

    l0 cancels exactly, so the only C-minor touches left are the two
    strided slices producing d (and, under autodiff, the +/-g pad
    writing d_logits) — everything else (softplus, sigmoid backward,
    mask/weight multiplies, sums) is plane work. Unlike the cmajor form
    (rejected on-chip: the [N,H,W,2]->[N,2,H,W] relayout costs more
    than it saves) there is NO transpose.

    Math matches :func:`softmax_cross_entropy_sum` on one-hot labels to
    f32 roundoff (computed in f32 regardless of logits dtype). Labels
    outside {0, 1} are treated as class 0 (the one-hot form would yield
    an all-zero target row instead) — such pixels must be masked by
    ``valid_mask``, which is the existing contract for ignore labels.
    """
    if logits.shape[-1] != 2:
        raise ValueError(f"binary CE needs C==2 logits, got {logits.shape}")
    l0 = logits[..., 0].astype(jnp.float32)
    l1 = logits[..., 1].astype(jnp.float32)
    d = l1 - l0
    y = (labels == 1).astype(jnp.float32)
    ce = jax.nn.softplus(d) - y * d  # [N, H, W]
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        ce = ce * (w[0] + (w[1] - w[0]) * y)
    if valid_mask is None:
        return jnp.sum(ce), jnp.asarray(ce.size, ce.dtype)
    valid = valid_mask.astype(ce.dtype)
    return jnp.sum(ce * valid), jnp.sum(valid)


def softmax_cross_entropy_loss(
    logits: jax.Array,
    labels_onehot: jax.Array,
    valid_mask: jax.Array | None = None,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    """Mean per-pixel CE over valid pixels (single-device convenience form)."""
    ce_sum, valid_sum = softmax_cross_entropy_sum(
        logits, labels_onehot, valid_mask, class_weights)
    return ce_sum / jnp.maximum(valid_sum, 1.0)


def median_frequency_weights(class_pixel_counts) -> "jnp.ndarray":
    """Median-frequency balancing weights (Eigen & Fergus; used by the
    SegNet paper for road scenes): ``w_c = median(freq) / freq_c`` where
    ``freq_c`` is class c's share of labeled pixels. Rare classes get
    weight > 1, dominant ones < 1; classes absent from the counts get 0
    (they can never appear in the loss anyway).

    Input: [C] pixel counts (e.g. ``data.pipeline.class_pixel_counts``).
    Returns a float32 [C] array for ``class_weights=``.
    """
    import numpy as np

    counts = np.asarray(class_pixel_counts, np.float64)
    total = counts.sum()
    if total <= 0:
        raise ValueError("class_pixel_counts sums to zero")
    freq = counts / total
    present = freq > 0
    med = np.median(freq[present])
    w = np.zeros_like(freq)
    w[present] = med / freq[present]
    return jnp.asarray(w, jnp.float32)

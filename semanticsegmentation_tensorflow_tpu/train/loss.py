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
    """
    ce = optax.softmax_cross_entropy(logits, labels_onehot)  # [N, H, W]
    if valid_mask is None:
        return jnp.sum(ce), jnp.asarray(ce.size, ce.dtype)
    valid = valid_mask.astype(ce.dtype)
    return jnp.sum(ce * valid), jnp.sum(valid)


def softmax_cross_entropy_loss(
    logits: jax.Array,
    labels_onehot: jax.Array,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Mean per-pixel CE over valid pixels (single-device convenience form)."""
    ce_sum, valid_sum = softmax_cross_entropy_sum(
        logits, labels_onehot, valid_mask)
    return ce_sum / jnp.maximum(valid_sum, 1.0)

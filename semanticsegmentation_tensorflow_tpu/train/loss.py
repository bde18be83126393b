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


def softmax_cross_entropy_loss(
    logits: jax.Array,
    labels_onehot: jax.Array,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Mean per-pixel CE.

    Args:
      logits:        [N, H, W, C] float32.
      labels_onehot: [N, H, W, C] one-hot (or soft) targets.
      valid_mask:    optional [N, H, W] {0,1}; invalid pixels are excluded
                     from the mean.
    """
    ce = optax.softmax_cross_entropy(logits, labels_onehot)  # [N, H, W]
    if valid_mask is None:
        return jnp.mean(ce)
    valid = valid_mask.astype(ce.dtype)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

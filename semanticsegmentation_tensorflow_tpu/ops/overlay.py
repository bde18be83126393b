"""Argmax + colormap overlay — the reference's inference visualization path.

The reference computes per-pixel softmax on host, thresholds the road
probability, builds a green RGBA mask in numpy and alpha-blends it with PIL
(reconstructed; SURVEY.md §3.2). Here the whole thing is one device-side
fused op: logits -> argmax -> palette lookup -> alpha blend, emitted as uint8,
so only the final overlay PNG bytes ever cross HBM->host. A Pallas version
lives in ``ops.pallas.overlay``; this is the reference semantics (and what XLA
fuses already quite well).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_colormap_overlay(
    image_u8: jax.Array,
    logits: jax.Array,
    palette: jax.Array,
    alpha: float = 0.5,
    blend_class0: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Blend a class colormap over an image, on device.

    Args:
      image_u8: [..., H, W, 3] uint8 input image.
      logits:   [..., H, W, num_classes] raw logits (softmax unnecessary —
                argmax is monotonic in logits).
      palette:  [num_classes, 3] uint8 class colors. Class 0 is background.
      alpha:    blend factor for the class color.
      blend_class0: if False (default, matching the reference's road overlay)
                class-0 pixels keep the original image unblended.

    Returns:
      (overlay_u8 [..., H, W, 3], labels [..., H, W] int32)
    """
    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    colors = palette.astype(jnp.float32)[labels]  # [..., H, W, 3]
    img = image_u8.astype(jnp.float32)
    blended = img * (1.0 - alpha) + colors * alpha
    if not blend_class0:
        keep = (labels == 0)[..., None]
        blended = jnp.where(keep, img, blended)
    return jnp.clip(blended, 0, 255).astype(jnp.uint8), labels


def host_overlay(image_u8, labels_u8, palette, alpha: float = 0.5,
                 blend_class0: bool = False):
    """Numpy mirror of the blend in :func:`argmax_colormap_overlay`.

    Used by the sweep path, which downloads only the u8 label map (12x
    smaller than the overlay — the label map is all the device computed
    anyway) and rebuilds the overlay from the source image already in host
    RAM. Same f32 arithmetic as the device op; tests pin it equal to the
    device path within +-1 u8 count (FMA contraction may round once).
    """
    import numpy as np

    img = image_u8.astype(np.float32)
    colors = palette.astype(np.float32)[labels_u8]
    blended = img * (1.0 - alpha) + colors * alpha
    if not blend_class0:
        blended = np.where((labels_u8 == 0)[..., None], img, blended)
    return np.clip(blended, 0, 255).astype(np.uint8)

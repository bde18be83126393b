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
    if logits.shape[-1] == 2:
        # bit-exact with argmax (ties -> class 0) in plane form — no
        # C-minor T(2,128) reduce at full resolution (the
        # SEG_LOSS_IMPL=binary trick, train/step.py)
        labels = (logits[..., 1] > logits[..., 0]).astype(jnp.int32)
    else:
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    colors = palette.astype(jnp.float32)[labels]  # [..., H, W, 3]
    img = image_u8.astype(jnp.float32)
    blended = img * (1.0 - alpha) + colors * alpha
    if not blend_class0:
        keep = (labels == 0)[..., None]
        blended = jnp.where(keep, img, blended)
    return jnp.clip(blended, 0, 255).astype(jnp.uint8), labels


_BLEND_LUT_CACHE: dict = {}


def _blend_lut(palette, alpha: float, blend_class0: bool):
    """lut[class, channel, byte] built with the EXACT f32 arithmetic of the
    vectorized blend below — the blend is a pure function of (image byte,
    class, channel), so applying the LUT is bit-equal by construction."""
    import numpy as np

    key = (palette.tobytes(), palette.shape[0], float(alpha),
           bool(blend_class0))
    lut = _BLEND_LUT_CACHE.get(key)
    if lut is None:
        nc = palette.shape[0]
        b = np.arange(256, dtype=np.float32)          # every image byte
        img = np.broadcast_to(b, (nc, 3, 256))
        colors = palette.astype(np.float32)[:, :, None]
        blended = img * (1.0 - alpha) + colors * alpha
        if not blend_class0:
            blended = np.where(
                (np.arange(nc) == 0)[:, None, None], img, blended)
        lut = np.ascontiguousarray(
            np.clip(blended, 0, 255).astype(np.uint8))
        _BLEND_LUT_CACHE[key] = lut
    return lut


def host_overlay(image_u8, labels_u8, palette, alpha: float = 0.5,
                 blend_class0: bool = False):
    """Numpy mirror of the blend in :func:`argmax_colormap_overlay`.

    Used by the sweep path, which downloads only the u8 label map (12x
    smaller than the overlay — the label map is all the device computed
    anyway) and rebuilds the overlay from the source image already in host
    RAM. Same f32 arithmetic as the device op; tests pin it equal to the
    device path within +-1 u8 count (FMA contraction may round once).

    When the native library is available the blend runs as a LUT walk in
    C++ (native/segio.cpp segio_overlay_lut_u8) — bit-equal to the numpy
    expression because the LUT is built with that exact arithmetic
    (tests/test_native.py fuzzes the equality) and ~25x faster (50 ms ->
    ~2 ms at 1242x375; post-encoder, the blend was the sweep's largest
    remaining host cost).
    """
    import numpy as np

    from semanticsegmentation_tensorflow_tpu import native

    if (native.available() and image_u8.ndim == 3
            and image_u8.dtype == np.uint8 and labels_u8.dtype == np.uint8
            and palette.shape[0] <= 256):
        return native.overlay_lut(
            image_u8, labels_u8, _blend_lut(palette, alpha, blend_class0))

    img = image_u8.astype(np.float32)
    colors = palette.astype(np.float32)[labels_u8]
    blended = img * (1.0 - alpha) + colors * alpha
    if not blend_class0:
        blended = np.where((labels_u8 == 0)[..., None], img, blended)
    return np.clip(blended, 0, 255).astype(np.uint8)

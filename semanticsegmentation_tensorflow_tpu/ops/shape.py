"""Static-shape utilities for TPU-friendly padding.

KITTI road images are 1242x375 — hostile to both stride-32 convnets and the
TPU's (8,128) tiling. The framework's convention: pad inputs up to the next
multiple of the model's total stride (1242x375 -> 1248x384 for stride-32)
with edge replication, run the network on the aligned shape, and crop logits
back. All shapes stay static so XLA traces once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_to_multiple(x: jax.Array, multiple: int, mode: str = "edge") -> jax.Array:
    """Pad NHWC spatial dims up to a multiple (bottom/right padding)."""
    n, h, w, c = x.shape
    ph, pw = round_up(h, multiple) - h, round_up(w, multiple) - w
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)


def crop_to(x: jax.Array, height: int, width: int) -> jax.Array:
    """Crop NHWC spatial dims back to (height, width) from the top-left."""
    return x[:, :height, :width, :]

"""Device-side label-map packing for the device->host fetch.

The inference sweep downloads only the argmax label map (12x smaller than
the rendered overlay — infer/predict.py), but at 1248x384 that is still
~0.48 MB/image of u8, and the fetch link is the bottleneck end to end
(~11-17 MB/s on this tunneled dev chip; PCIe on real hardware). Class ids
are tiny integers, so the wire format packs them on device:

  * nc <= 2   : 1 bit/pixel  (8x less traffic) — KITTI road is this case
  * nc <= 16  : 1 nibble/pixel (2x) — covers Cityscapes' 19 trainIds? no:
                19 > 16, so Cityscapes ships raw u8 (mode "none")
  * otherwise : raw (identity)

Packing is a handful of elementwise u8 ops on the last axis — negligible
device time next to the model forward — and host unpack is vectorized
numpy (np.unpackbits / nibble interleave, ~0.2 ms per image). Bit order
matches ``np.unpackbits(bitorder="big")`` so the host side is one call.

Exactness: pack(unpack) == identity for every mode, property-tested in
tests/test_labelpack.py including ragged widths (the pad pixels appended
on device are sliced off by the host unpack).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BIT_WEIGHTS = (128, 64, 32, 16, 8, 4, 2, 1)  # np.unpackbits "big" order


def pack_mode(num_classes: int) -> str:
    """Wire format for a label space: "bits", "nibbles", or "none"."""
    if num_classes <= 2:
        return "bits"
    if num_classes <= 16:
        return "nibbles"
    return "none"


def packed_width(width: int, mode: str) -> int:
    if mode == "bits":
        return (width + 7) // 8
    if mode == "nibbles":
        return (width + 1) // 2
    return width


def pack_labels(labels, mode: str):
    """[..., W] integer labels -> packed u8 [..., packed_width]. Traceable
    (pure jnp); pads W on the right with zeros to the pack granularity."""
    if mode == "none":
        return labels
    labels = labels.astype(jnp.uint8)
    w = labels.shape[-1]
    lead = [(0, 0)] * (labels.ndim - 1)
    if mode == "bits":
        pad = (-w) % 8
        if pad:
            labels = jnp.pad(labels, lead + [(0, pad)])
        x = labels.reshape(*labels.shape[:-1], -1, 8).astype(jnp.int32)
        weights = jnp.asarray(_BIT_WEIGHTS, jnp.int32)
        return (x * weights).sum(axis=-1).astype(jnp.uint8)
    if mode == "nibbles":
        pad = (-w) % 2
        if pad:
            labels = jnp.pad(labels, lead + [(0, pad)])
        hi = labels[..., 0::2]
        lo = labels[..., 1::2]
        return hi * jnp.uint8(16) + lo
    raise ValueError(f"unknown pack mode {mode!r}")


def unpack_labels(packed: np.ndarray, width: int, mode: str) -> np.ndarray:
    """Host inverse of :func:`pack_labels`: packed u8 -> u8 [..., width]."""
    if mode == "none":
        return packed
    packed = np.asarray(packed, dtype=np.uint8)
    if mode == "bits":
        out = np.unpackbits(packed, axis=-1)  # big bit order, matches pack
        return out[..., :width]
    if mode == "nibbles":
        out = np.empty((*packed.shape[:-1], packed.shape[-1] * 2), np.uint8)
        out[..., 0::2] = packed >> 4
        out[..., 1::2] = packed & 0x0F
        return out[..., :width]
    raise ValueError(f"unknown pack mode {mode!r}")

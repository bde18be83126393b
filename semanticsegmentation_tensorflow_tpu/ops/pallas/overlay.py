"""Pallas TPU kernel: fused argmax + colormap + alpha blend.

The inference visualization path (BASELINE.json north star names an
"argmax+colormap overlay kernel"). One pass over the logits: per-pixel
argmax across the class planes, palette lookup, alpha blend with the input
image — all on the VPU, one HBM read per input, one write per output.

Layout: the kernel works on channel-*planes* ([C|3, H_tile, W]) rather than
NHWC, so the lane dimension is W (1242 for KITTI) instead of C (=2/3, which
would waste 125/128 lanes). Argmax over classes and the palette lookup are
static Python loops over tiny C — fully unrolled vector code, no gathers.

Dtype note: Mosaic has no uint8<->f32 casts, so pixel planes cross the
kernel boundary as int32 (the uint8<->int32 casts outside fuse into the
layout transposes XLA already performs).
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _overlay_kernel(logits_ref, image_ref, palette_ref, out_ref, *,
                    num_classes: int, alpha: float, blend_class0: bool):
    # blocks are [1, C, TH, W]; argmax over class planes (ties -> lowest
    # class, matching jnp.argmax)
    best = logits_ref[0, 0]
    label = jnp.zeros_like(best, dtype=jnp.int32)
    for c in range(1, num_classes):
        plane = logits_ref[0, c]
        better = plane > best
        best = jnp.where(better, plane, best)
        label = jnp.where(better, c, label)

    keep = label == 0 if blend_class0 is False else None
    for ch in range(3):
        img = image_ref[0, ch].astype(jnp.float32)
        color = jnp.zeros_like(img)
        for c in range(num_classes):
            color += jnp.where(label == c, palette_ref[c, ch], 0.0)
        blended = img * (1.0 - alpha) + color * alpha
        if keep is not None:
            blended = jnp.where(keep, img, blended)
        out_ref[0, ch] = jnp.clip(blended, 0.0, 255.0).astype(jnp.int32)


def argmax_colormap_overlay_pallas(
    image_u8: jax.Array,
    logits: jax.Array,
    palette: jax.Array,
    alpha: float = 0.5,
    blend_class0: bool = False,
    row_tile: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.overlay.argmax_colormap_overlay (labels recomputed
    host-side cheaply when needed; this returns (overlay, labels) too).

    image_u8 [N,H,W,3], logits [N,H,W,C] -> overlay [N,H,W,3] uint8.
    """
    n, h, w, c = logits.shape
    # TPU block constraint: second-to-last block dim must be a multiple of 8
    # (ragged final blocks are fine) or span the full dimension
    row_tile = min(row_tile, h)
    if row_tile % 8 != 0 and row_tile != h:
        row_tile = max(8, (row_tile // 8) * 8) if h >= 8 else h
    grid_h = pl.cdiv(h, row_tile)

    # channel-plane layout: [N, C, H, W]; pixels as int32 (see dtype note)
    lt = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
    it = jnp.transpose(image_u8.astype(jnp.int32), (0, 3, 1, 2))
    pal = palette.astype(jnp.float32)

    kernel = partial(_overlay_kernel, num_classes=c, alpha=float(alpha),
                     blend_class0=blend_class0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3, h, w), jnp.int32),
        grid=(n, grid_h),
        in_specs=[
            pl.BlockSpec((1, c, row_tile, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, row_tile, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, row_tile, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lt, it, pal)

    overlay = jnp.transpose(out, (0, 2, 3, 1)).astype(jnp.uint8)
    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return overlay, labels
